package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` key is an operator from the checklist; `oracleSql`
  * holds the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // block A — core ETL surface
    "ingest_batch_assign" -> ((s, d) => Ingest.batchAssign(s, d)),
    "exact_dedup_key"     -> (Dedup.exactDedupKey _),
    "incremental_dedup"   -> (Dedup.incrementalDedup _),
    "parse_clean"         -> (Clean.parseClean _),
    "date_derive"         -> (Clean.dateDerive _),
    "upsert_merge"        -> (Scd.upsertMerge _),
    "scd_current"         -> (Scd.scdCurrent _),
    "scd_change_detect"   -> (Scd.scdChangeDetect _),
    "status_claim"        -> ((s, d) => Status.statusClaim(s, d)),
    "status_rollup"       -> (Status.statusRollup _),
    "run_stats"           -> (Status.runStats _),
    "progress_report"     -> ((s, d) => Status.progressReport(s, d)),
    "jsonl_ingest"        -> (Ingest.jsonlRoundtrip _),
    "json_extract"        -> (Ingest.jsonExtract _),
    "author_search"       -> ((s, d) => Multivalue.authorSearch(s, d)),
    "author_stats"        -> (Multivalue.authorStats _),
    "json_path_filter"    -> (Multivalue.jsonPathFilter _),
    "json_containment"    -> ((s, d) => Multivalue.jsonContainment(s, d)),
    // block B — analytics
    "q1_pricing"          -> (Analytics.q1Pricing _),
    "q3_shipping"         -> (Analytics.q3Shipping _),
    "q5_local_supplier"   -> (Analytics.q5LocalSupplier _),
    "topk_per_group"      -> ((s, d) => Analytics.topkPerGroup(s, d)),
    "topk_per_group_agg"  -> ((s, d) => Analytics.topkPerGroupAgg(s, d)),
    "window_running"      -> (Analytics.windowRunning _),
    "approx_distinct"     -> (Analytics.approxDistinct _),
    "quantile_stats"      -> (Analytics.quantileStats _),
    "sessionize"          -> ((s, d) => Analytics.sessionize(s, d)),
    "pivot_wide"          -> (Analytics.pivotWide _),
    "rollup_cube"         -> (Analytics.rollupCube _),
    "asof_join"           -> (AsOf.asofStateJoin _),
    "range_join_pairs"    -> ((s, d) => RangeJoin.rangePairs(s, d)),
    "skew_salted_agg"     -> ((s, d) => Skew.saltedAgg(s, d)),
    "value_histogram"     -> ((s, d) => Analytics.valueHistogram(s, d)),
    "bloom_prejoin"       -> ((s, d) => BloomJoin.bloomPrejoin(s, d)),
    "funnel_stages"       -> (Analytics.funnelStages _),
    "equidepth_histogram" -> (Analytics.equidepthHistogram _),
    "scd2_intervals"      -> (Scd.scd2Intervals _),
    "capped_per_group"    -> ((s, d) => Govern.cappedPerGroup(s, d)),
    "tfidf_terms"         -> ((s, d) => TextAnalysis.tfidfTerms(s, d)),
    "mm_dedup"            -> (Multimodal.mmDedup _),
    "mm_resize"           -> (Multimodal.mmResize _),
    "mm_frame_sample"     -> ((s, d) => Multimodal.mmFrameSample(s, d)),
    // block C — LLM-training-data operators
    "text_exact_dedup"    -> (TextAnalysis.textExactDedup _),
    "minhash_lsh_dedup"   -> ((s, d) => NearDup.minhashLshDedup(s, d)),
    "simhash_dedup"       -> ((s, d) => NearDup.simhashDedup(s, d)),
    "ngram_jaccard_dedup" -> ((s, d) => NearDup.ngramJaccardDedup(s, d)),
    "dedup_cluster"       -> ((s, d) => NearDup.dedupCluster(s, d)),
    "dedup_cluster_star"  -> ((s, d) => NearDup.dedupClusterStar(s, d)),
    "embedding_dedup"     -> ((s, d) => Similarity.embeddingDedup(s, d)),
    "embedding_dedup_lsh" -> ((s, d) => Similarity.embeddingDedupLsh(s, d)),
    "ann_bruteforce"      -> ((s, d) => Similarity.annBruteforce(s, d)),
    "ann_lsh"             -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf"             -> ((s, d) => Similarity.annIvf(s, d)),
    "lang_id"             -> (TextAnalysis.langId _),
    "quality_score"       -> (TextAnalysis.qualityScore _),
    "token_count"         -> (TextAnalysis.tokenCount _),
    "doc_fingerprint"     -> (NearDup.docFingerprint _),
    "keyword_extract"     -> ((s, d) => TextAnalysis.keywordExtract(s, d)),
    "topic_classify"      -> (TextAnalysis.topicClassify _),
    "pipeline_clean_corpus" -> ((s, d) => TextAnalysis.pipelineCleanCorpus(s, d)),
    // block D — multimodal
    "mm_metadata"         -> (Multimodal.mmMetadata _),
    "mm_feature_extract"  -> ((s, d) => Multimodal.mmFeatureExtract(s, d)),
    // block E — streaming (batch-equivalent plans; streaming specs in tests)
    "stream_window_agg"   -> (graft.streaming.Streams.streamWindowAgg _),
    "stream_sessionize"   -> (graft.streaming.Streams.streamSessionize _),
    "stream_dedup"        -> (graft.streaming.Streams.streamDedup _),
    "stream_join"         -> (graft.streaming.Streams.streamJoin _),
    "stream_enrich"       -> (graft.streaming.Streams.streamEnrich _),
    "stream_near_dedup"   -> (graft.streaming.Streams.streamNearDedup _),
    // block F — governance / curation
    "pii_redact"          -> (Govern.piiRedact _),
    "repetition_score"    -> (Govern.repetitionScore _),
    "decontaminate"       -> ((s, d) => Govern.decontaminate(s, d)),
    "sample_split"        -> (Govern.sampleSplit _),
    "stratified_sample"   -> (Govern.stratifiedSample _),
    "mixture_sample"      -> ((s, d) => Govern.mixtureSample(s, d)),
    "doc_chunk"           -> ((s, d) => TextAnalysis.docChunk(s, d)),
    "sentence_stats"      -> (Govern.sentenceStats _),
    "csv_ingest"          -> (Govern.csvRoundtrip _),
    "pack_sequences"      -> ((s, d) => Govern.packSequences(s, d)),
    "resample_fill"       -> (TimeSeries.resampleFill _),
    "centroid_per_label"  -> (Similarity.centroidPerLabel _),
    "knn_classify"        -> ((s, d) => Similarity.knnClassify(s, d)),
    "vocab_build"         -> ((s, d) => TextAnalysis.vocabBuild(s, d))
  )

  /** DuckDB-equivalent SQL per query (column names/aliases must match
    * the Spark result exactly — the driver sorts columns by name and
    * hash-compares values). */
  def oracleSql: Map[String, String] = Map(
    "ingest_batch_assign" -> Ingest.batchAssignSql(),
    "exact_dedup_key"     -> Dedup.exactDedupKeySql,
    "incremental_dedup"   -> Dedup.incrementalDedupSql,
    "parse_clean"         -> Clean.parseCleanSql,
    "date_derive"         -> Clean.dateDeriveSql,
    "upsert_merge"        -> Scd.upsertMergeSql,
    "scd_current"         -> Scd.scdCurrentSql,
    "scd_change_detect"   -> Scd.scdChangeDetectSql,
    "status_claim"        -> Status.statusClaimSql(),
    "status_rollup"       -> Status.statusRollupSql,
    "run_stats"           -> Status.runStatsSql,
    "progress_report"     -> Status.progressReportSql(),
    "jsonl_ingest"        -> Ingest.jsonlRoundtripSql,
    "json_extract"        -> Ingest.jsonExtractSql,
    "author_search"       -> Multivalue.authorSearchSql(),
    "author_stats"        -> Multivalue.authorStatsSql,
    "json_path_filter"    -> Multivalue.jsonPathFilterSql,
    "json_containment"    -> Multivalue.jsonContainmentSql(),
    "q1_pricing"          -> Analytics.q1PricingSql,
    "q3_shipping"         -> Analytics.q3ShippingSql,
    "q5_local_supplier"   -> Analytics.q5LocalSupplierSql,
    "topk_per_group"      -> Analytics.topkPerGroupSql(),
    // same oracle: the custom aggregate must reproduce the window form
    "topk_per_group_agg"  -> Analytics.topkPerGroupSql(),
    "window_running"      -> Analytics.windowRunningSql,
    // approx_distinct: HLL sketches differ across engines — rows-only.
    "quantile_stats"      -> Analytics.quantileStatsSql,
    "sessionize"          -> Analytics.sessionizeSql(),
    "pivot_wide"          -> Analytics.pivotWideSql,
    "rollup_cube"         -> Analytics.rollupCubeSql,
    // block C (minhash/simhash/ann_lsh: seeded-hash specific → rows-only)
    "text_exact_dedup"    -> TextAnalysis.textExactDedupSql,
    "doc_fingerprint"     -> NearDup.docFingerprintSql,
    "ngram_jaccard_dedup" -> NearDup.ngramJaccardDedupSql(),
    "dedup_cluster"       -> NearDup.dedupClusterSql(),
    "dedup_cluster_star"  -> NearDup.dedupClusterSql(),
    "embedding_dedup"     -> Similarity.embeddingDedupSql(),
    "embedding_dedup_lsh" -> Similarity.embeddingDedupLshSql(),
    "ann_bruteforce"      -> Similarity.annBruteforceSql(),
    "skew_salted_agg"     -> Skew.saltedAggSql,
    "value_histogram"     -> Analytics.valueHistogramSql(),
    "bloom_prejoin"       -> BloomJoin.bloomPrejoinSql(),
    "funnel_stages"       -> Analytics.funnelStagesSql,
    "equidepth_histogram" -> Analytics.equidepthHistogramSql,
    "scd2_intervals"      -> Scd.scd2IntervalsSql,
    "capped_per_group"    -> Govern.cappedPerGroupSql(),
    "tfidf_terms"         -> TextAnalysis.tfidfTermsSql(),
    "mm_dedup"            -> Multimodal.mmDedupSql,
    "mm_resize"           -> Multimodal.mmResizeSql,
    "mm_frame_sample"     -> Multimodal.mmFrameSampleSql(),
    "asof_join"           -> AsOf.asofStateJoinSql,
    "range_join_pairs"    -> RangeJoin.rangePairsSql(),
    "lang_id"             -> TextAnalysis.langIdSql,
    "quality_score"       -> TextAnalysis.qualityScoreSql,
    "token_count"         -> TextAnalysis.tokenCountSql,
    "keyword_extract"     -> TextAnalysis.keywordExtractSql(),
    "topic_classify"      -> TextAnalysis.topicClassifySql,
    "pipeline_clean_corpus" -> TextAnalysis.pipelineCleanCorpusSql(),
    "mm_metadata"         -> Multimodal.mmMetadataSql,
    "mm_feature_extract"  -> Multimodal.mmFeatureExtractSql,
    // block E (stream_near_dedup: seeded-hash signatures → rows-only;
    // stream_sessionize hash-gates on B8's window oracle)
    "stream_window_agg"   -> graft.streaming.Streams.streamWindowAggSql,
    "stream_dedup"        -> graft.streaming.Streams.streamDedupSql,
    "stream_join"         -> graft.streaming.Streams.streamJoinSql,
    "stream_enrich"       -> graft.streaming.Streams.streamEnrichSql,
    "stream_sessionize"   -> graft.streaming.Streams.streamSessionizeSql(),
    // block F — governance / curation
    "pii_redact"          -> Govern.piiRedactSql,
    "repetition_score"    -> Govern.repetitionScoreSql,
    "decontaminate"       -> Govern.decontaminateSql(),
    "sample_split"        -> Govern.sampleSplitSql,
    "stratified_sample"   -> Govern.stratifiedSampleSql,
    "mixture_sample"      -> Govern.mixtureSampleSql(),
    "doc_chunk"           -> TextAnalysis.docChunkSql(),
    "sentence_stats"      -> Govern.sentenceStatsSql,
    "csv_ingest"          -> Govern.csvRoundtripSql,
    "pack_sequences"      -> Govern.packSequencesSql(),
    "resample_fill"       -> TimeSeries.resampleFillSql,
    "centroid_per_label"  -> Similarity.centroidPerLabelSql,
    "knn_classify"        -> Similarity.knnClassifySql(),
    "vocab_build"         -> TextAnalysis.vocabBuildSql()
  )
}
