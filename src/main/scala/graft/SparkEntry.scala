package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` key is an operator from the checklist; `oracleSql`
  * holds the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {
  /** The ambient typed config (graft.conf / $GRAFT_CONF — the
    * reference's config.yaml analogue): the registry's tunables come
    * from here, and the SAME values feed both the Spark plans and
    * their oracle SQL, so the gate holds under any retune. */
  private val cfg = GraftConfig.ambient

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
    "approx_quantiles"    -> ((s, d) => Analytics.approxQuantiles(s, d)),
    "sessionize"          -> ((s, d) => Analytics.sessionize(s, d, cfg.gapMinutes)),
    "pivot_wide"          -> (Analytics.pivotWide _),
    "rollup_cube"         -> (Analytics.rollupCube _),
    "asof_join"           -> (AsOf.asofStateJoin _),
    "range_join_pairs"    -> ((s, d) => RangeJoin.rangePairs(s, d)),
    "skew_salted_agg"     -> ((s, d) => Skew.saltedAgg(s, d)),
    "null_skew_join"      -> ((s, d) => Skew.nullSkewJoin(s, d)),
    "value_histogram"     -> ((s, d) => Analytics.valueHistogram(s, d)),
    "bloom_prejoin"       -> ((s, d) => BloomJoin.bloomPrejoin(s, d)),
    "funnel_stages"       -> (Analytics.funnelStages _),
    "equidepth_histogram" -> (Analytics.equidepthHistogram _),
    "scd2_intervals"      -> (Scd.scd2Intervals _),
    "scd2_apply"          -> (Scd.scd2Apply _),
    "capped_per_group"    -> ((s, d) => Govern.cappedPerGroup(s, d)),
    "corpus_shard"        -> ((s, d) => Govern.corpusShard(s, d)),
    "zorder_layout"       -> ((s, d) => Govern.zorderLayout(s, d)),
    "compaction_plan"     -> ((s, d) => Govern.compactionPlan(s, d)),
    "stats_prune"         -> ((s, d) => Govern.statsPrune(s, d)),
    "source_quality_block" -> ((s, d) => Govern.sourceQualityBlock(s, d)),
    "curation_audit"      -> ((s, d) => Govern.curationAudit(s, d)),
    "pipeline_training_manifest" -> ((s, d) => Govern.trainingManifest(s, d)),
    "tfidf_terms"         -> ((s, d) => TextAnalysis.tfidfTerms(s, d)),
    "sparse_tfidf_pairs"  -> ((s, d) => TextAnalysis.sparseTfidfPairs(s, d)),
    "bm25_retrieve"       -> ((s, d) => TextAnalysis.bm25Retrieve(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bpe_pair_counts"     -> ((s, d) => TextAnalysis.bpePairCounts(s, d)),
    "bpe_train_merges"    -> ((s, d) => TextAnalysis.bpeTrainMerges(s, d)),
    "bpe_encode"          -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "bm25_serve"          -> ((s, d) => TextAnalysis.bm25IndexServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bm25_append"         -> ((s, d) => TextAnalysis.bm25AppendServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bm25_delete"         -> ((s, d) => TextAnalysis.bm25DeleteServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bm25_stale_serve"    -> ((s, d) => TextAnalysis.bm25StaleServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bm25_catalog_serve"  -> ((s, d) => TextAnalysis.bm25CatalogServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "bm25_rollback_serve" -> ((s, d) => TextAnalysis.bm25RollbackServe(s, d, cfg.k, cfg.dfCap, cfg.qMod)),
    "doc_embed"           -> ((s, d) => TextAnalysis.docEmbed(s, d)),
    "hybrid_retrieve"     -> ((s, d) => TextAnalysis.hybridRetrieve(s, d)),
    "hybrid_serve"        -> ((s, d) => TextAnalysis.hybridServe(s, d, cfg.k, cfg.dfCap,
      cfg.nQueries, wLex = cfg.wLex, wSem = cfg.wSem)),
    "hybrid_catalog_serve" -> ((s, d) => TextAnalysis.hybridCatalogServe(s, d, cfg.k,
      cfg.dfCap, cfg.nQueries, wLex = cfg.wLex, wSem = cfg.wSem)),
    "approx_topk"         -> ((s, d) => TextAnalysis.approxTopK(s, d)),
    "typo_neighbors"      -> (TextAnalysis.typoNeighbors _),
    "mm_dedup"            -> (Multimodal.mmDedup _),
    "mm_resize"           -> (Multimodal.mmResize _),
    "mm_frame_sample"     -> ((s, d) => Multimodal.mmFrameSample(s, d)),
    "mm_phash"            -> (Multimodal.mmPhash _),
    "mm_phash_dedup"      -> ((s, d) => Multimodal.mmPhashDedup(s, d)),
    "mm_phash_cluster"    -> ((s, d) => Multimodal.mmPhashCluster(s, d)),
    // block C — LLM-training-data operators
    "text_exact_dedup"    -> (TextAnalysis.textExactDedup _),
    "line_dedup"          -> ((s, d) => TextAnalysis.lineDedup(s, d)),
    "line_dedup_serve"    -> ((s, d) => TextAnalysis.lineDedupServeGate(s, d)),
    "minhash_lsh_dedup"   -> ((s, d) => NearDup.minhashLshDedup(s, d, cfg.dedupBucketCap)),
    "simhash_dedup"       -> ((s, d) => NearDup.simhashDedup(s, d, cfg.maxHamming, cfg.dedupBucketCap)),
    "ngram_jaccard_dedup" -> ((s, d) => NearDup.ngramJaccardDedup(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "cross_dedup"         -> ((s, d) => NearDup.crossDedup(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "cross_dedup_serve"   -> ((s, d) => NearDup.crossDedupServe(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "dedup_catalog_serve" -> ((s, d) => NearDup.dedupCatalogServe(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "line_catalog_serve"  -> ((s, d) => TextAnalysis.lineCatalogServe(s, d)),
    "fleet_catalog_serve" -> ((s, d) => TextAnalysis.fleetCatalogServe(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "fleet_rollback_serve" -> ((s, d) => TextAnalysis.fleetRollbackServe(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "stream_dedup_index"  -> ((s, d) => graft.streaming.Streams.streamDedupIndex(s, d)),
    "stream_line_index"   -> ((s, d) => graft.streaming.Streams.streamLineIndex(s, d)),
    "dedup_cluster"       -> ((s, d) => NearDup.dedupCluster(s, d)),
    "dedup_cluster_star"  -> ((s, d) => NearDup.dedupClusterStar(s, d)),
    "dedup_keep_best"     -> ((s, d) => NearDup.dedupKeepBest(s, d)),
    "pagerank_pairs"      -> ((s, d) => NearDup.pagerankPairs(s, d)),
    "embedding_dedup"     -> ((s, d) => Similarity.embeddingDedup(s, d)),
    "semdedup"            -> ((s, d) => Similarity.semDedup(s, d, cellCap = cfg.semDedupCellCap)),
    "semdedup_keep_best"  -> ((s, d) => Similarity.semDedupKeepBestGate(s, d, cellCap = cfg.semDedupCellCap)),
    "semdedup_budget"     -> ((s, d) => Similarity.semDedupBudget(s, d, cfg.semDedupDropFrac, cellCap = cfg.semDedupCellCap)),
    "semdedup_serve"      -> ((s, d) => Similarity.semDedupServeGate(s, d)),
    "stream_semdedup"     -> ((s, d) => graft.streaming.Streams.streamSemDedup(s, d)),
    "stream_catalog_serve" -> ((s, d) => graft.streaming.Streams.streamCatalogServe(s, d, cfg.jaccardThreshold, cfg.dedupDfCap)),
    "embedding_dedup_lsh" -> ((s, d) => Similarity.embeddingDedupLsh(s, d)),
    "embedding_quantize"  -> (Similarity.embeddingQuantize _),
    "ann_bruteforce"      -> ((s, d) => Similarity.annBruteforce(s, d)),
    "ann_lsh"             -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf"             -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_ivf_rerank"      -> ((s, d) => Similarity.annIvfRerank(s, d)),
    "ann_ivf_append"      -> ((s, d) => Similarity.annIvfAppendServe(s, d)),
    "ann_ivf_retrain"     -> ((s, d) => Similarity.annIvfRetrainServe(s, d)),
    "ann_ivf_delete"      -> ((s, d) => Similarity.annIvfDeleteServe(s, d)),
    "ann_ivf_pq"          -> ((s, d) => Similarity.annIvfPq(s, d)),
    "ann_ivf_pq_serve"    -> ((s, d) => Similarity.annIvfPqAppendServe(s, d)),
    "ann_ivf_opq"         -> ((s, d) => Similarity.annIvfOpq(s, d)),
    "ann_ivf_opq_serve"   -> ((s, d) => Similarity.annIvfOpqServe(s, d)),
    "ann_ivf_adaptive"    -> ((s, d) => Similarity.annIvfAdaptive(s, d)),
    "ann_ivf_pq_adaptive" -> ((s, d) => Similarity.annIvfPqAdaptiveGate(s, d)),
    "lang_id"             -> (TextAnalysis.langId _),
    "quality_score"       -> (TextAnalysis.qualityScore _),
    "token_count"         -> (TextAnalysis.tokenCount _),
    "doc_fingerprint"     -> (NearDup.docFingerprint _),
    "substring_dedup"     -> ((s, d) => NearDup.substringDedup(s, d)),
    "substring_dedup_strip" -> ((s, d) => NearDup.substringStrip(s, d)),
    "stream_substring_dedup" -> ((s, d) => graft.streaming.Streams.streamSubstringDedup(s, d)),
    "keyword_extract"     -> ((s, d) => TextAnalysis.keywordExtract(s, d)),
    "topic_classify"      -> (TextAnalysis.topicClassify _),
    "nb_quality_classify" -> ((s, d) => TextAnalysis.nbQualityClassify(s, d)),
    "dsir_select"         -> ((s, d) => TextAnalysis.dsirSelect(s, d)),
    "nb_quality_calibrate" -> ((s, d) => TextAnalysis.nbQualityCalibrate(s, d)),
    "pipeline_clean_corpus" -> ((s, d) => TextAnalysis.pipelineCleanCorpus(s, d)),
    "perplexity_score"    -> (TextAnalysis.perplexityScore _),
    // block D — multimodal
    "mm_metadata"         -> (Multimodal.mmMetadata _),
    "mm_feature_extract"  -> ((s, d) => Multimodal.mmFeatureExtract(s, d)),
    // block E — streaming (batch-equivalent plans; streaming specs in tests)
    "stream_window_agg"   -> (graft.streaming.Streams.streamWindowAgg _),
    "stream_window_topk"  -> (graft.streaming.Streams.streamWindowTopk _),
    "stream_sessionize"   -> (graft.streaming.Streams.streamSessionize _),
    "stream_dedup"        -> (graft.streaming.Streams.streamDedup _),
    "stream_join"         -> (graft.streaming.Streams.streamJoin _),
    "stream_enrich"       -> (graft.streaming.Streams.streamEnrich _),
    "stream_quality_classify" -> ((s, d) => graft.streaming.Streams.streamQualityClassify(s, d)),
    "stream_dsir_select"  -> ((s, d) => graft.streaming.Streams.streamDsirSelect(s, d)),
    "stream_decontaminate" -> ((s, d) => graft.streaming.Streams.streamDecontaminate(s, d)),
    "stream_asof_enrich"  -> (graft.streaming.Streams.streamAsofEnrich _),
    "stream_near_dedup"   -> (graft.streaming.Streams.streamNearDedup _),
    "stream_mm_dedup"     -> ((s, d) => graft.streaming.Streams.streamMmDedup(s, d)),
    "stream_bm25"         -> ((s, d) => graft.streaming.Streams.streamBm25(s, d)),
    "stream_ivf_append"   -> ((s, d) => graft.streaming.Streams.streamIvfAppend(s, d)),
    "stream_scd2_apply"   -> ((s, d) => graft.streaming.Streams.streamScd2Apply(s, d)),
    "stream_upsert_sink"  -> ((s, d) => graft.streaming.Streams.streamUpsertSink(s, d,
      maxAttempts = cfg.sinkMaxAttempts, initialDelayMs = cfg.sinkInitialDelayMs)),
    // block F — governance / curation
    "pii_redact"          -> (Govern.piiRedact _),
    "repetition_score"    -> (Govern.repetitionScore _),
    "decontaminate"       -> ((s, d) => Govern.decontaminate(s, d)),
    "sample_split"        -> (Govern.sampleSplit _),
    "stratified_sample"   -> (Govern.stratifiedSample _),
    "weighted_sample"     -> ((s, d) => Govern.weightedSample(s, d)),
    "drift_report"        -> ((s, d) => Govern.driftReport(s, d)),
    "mixture_sample"      -> ((s, d) => Govern.mixtureSample(s, d)),
    "doc_chunk"           -> ((s, d) => TextAnalysis.docChunk(s, d)),
    "sentence_stats"      -> (Govern.sentenceStats _),
    "csv_ingest"          -> (Govern.csvRoundtrip _),
    "pack_sequences"      -> ((s, d) => Govern.packSequences(s, d)),
    "resample_fill"       -> (TimeSeries.resampleFill _),
    "centroid_per_label"  -> (Similarity.centroidPerLabel _),
    "knn_classify"        -> ((s, d) => Similarity.knnClassify(s, d)),
    "knn_classify_ivf"    -> ((s, d) => Similarity.knnClassifyIvf(s, d)),
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
    "sessionize"          -> Analytics.sessionizeSql(cfg.gapMinutes),
    "pivot_wide"          -> Analytics.pivotWideSql,
    "rollup_cube"         -> Analytics.rollupCubeSql,
    // block C (md5-derived hash/plane families make minhash, simhash,
    // fingerprint AND ann_lsh fully gateable; HLL + the IVF family
    // (ann_ivf / ann_ivf_rerank / ann_ivf_append) stay rows-only:
    // engine-specific sketches / float kmeans iteration — each graded
    // quantitatively cross-engine in tools/check.py)
    "text_exact_dedup"    -> TextAnalysis.textExactDedupSql,
    "line_dedup"          -> TextAnalysis.lineDedupSql,
    "line_dedup_serve"    -> TextAnalysis.lineDedupServeSql(),
    // stream fold keeps the whole reference (no erasure step)
    "stream_line_index"   -> TextAnalysis.lineDedupServeSql(refPred = "TRUE"),
    "doc_fingerprint"     -> NearDup.docFingerprintSql,
    "minhash_lsh_dedup"   -> NearDup.minhashLshDedupSql(cfg.dedupBucketCap),
    "simhash_dedup"       -> NearDup.simhashDedupSql(cfg.maxHamming, cfg.dedupBucketCap),
    "ngram_jaccard_dedup" -> NearDup.ngramJaccardDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap),
    "cross_dedup"         -> NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap),
    "dedup_catalog_serve" -> NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap),
    "line_catalog_serve"  -> TextAnalysis.lineDedupServeSql(refPred = "TRUE"),
    "fleet_catalog_serve" -> NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap),
    // the four-kind rollback must restore the epoch-1 fleet answer
    // exactly: from-scratch recompute against the 70% prefix reference
    "fleet_rollback_serve" -> NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap,
      refPred = "doc_id <= (SELECT max(doc_id) * 7 // 10 FROM documents)"),
    // two epochs = two df contexts: each half recomputes from scratch
    // against its own epoch's reference (even-id batches pre-cutover
    // vs the 70% prefix; odd-id batches post-cutover vs the full set)
    "stream_catalog_serve" -> ("SELECT * FROM (" +
      NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap,
        refPred = "doc_id <= (SELECT max(doc_id) * 7 // 10 FROM documents)",
        newPred = "(doc_id % 2) = 0") +
      ") UNION ALL SELECT * FROM (" +
      NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap,
        newPred = "(doc_id % 2) = 1") + ")"),
    // the tombstoned index serve must equal a from-scratch recompute
    // on the surviving reference corpus
    "cross_dedup_serve"   -> NearDup.crossDedupSql(cfg.jaccardThreshold, cfg.dedupDfCap,
      refPred = "doc_id % 7 <> 0"),
    // N streamed appends into the prefix-built index must serve the
    // full-reference answer exactly
    "stream_dedup_index"  -> NearDup.crossDedupSql(),
    "dedup_cluster"       -> NearDup.dedupClusterSql(),
    "dedup_cluster_star"  -> NearDup.dedupClusterSql(),
    "dedup_keep_best"     -> NearDup.dedupKeepBestSql(),
    "pagerank_pairs"      -> NearDup.pagerankPairsSql(),
    "embedding_dedup"     -> Similarity.embeddingDedupSql(),
    "embedding_dedup_lsh" -> Similarity.embeddingDedupLshSql(),
    "embedding_quantize"  -> Similarity.embeddingQuantizeSql,
    "ann_bruteforce"      -> Similarity.annBruteforceSql(),
    "ann_lsh"             -> Similarity.annLshSql(),
    "skew_salted_agg"     -> Skew.saltedAggSql,
    "null_skew_join"      -> Skew.nullSkewJoinSql,
    "value_histogram"     -> Analytics.valueHistogramSql(),
    "bloom_prejoin"       -> BloomJoin.bloomPrejoinSql(),
    "funnel_stages"       -> Analytics.funnelStagesSql,
    "equidepth_histogram" -> Analytics.equidepthHistogramSql,
    "scd2_intervals"      -> Scd.scd2IntervalsSql,
    // the incremental MERGE must equal the from-scratch recompute —
    // and so must N of them folded as a stream of change batches
    "scd2_apply"          -> Scd.scd2IntervalsSql,
    "stream_scd2_apply"   -> Scd.scd2IntervalsSql,
    // N idempotent sink deliveries must land exactly the one-shot merge
    "stream_upsert_sink"  -> Scd.upsertMergeSql,
    "capped_per_group"    -> Govern.cappedPerGroupSql(),
    "corpus_shard"        -> Govern.corpusShardSql(),
    "zorder_layout"       -> Govern.zorderLayoutSql(),
    "compaction_plan"     -> Govern.compactionPlanSql(),
    "stats_prune"         -> Govern.statsPruneSql(),
    "source_quality_block" -> Govern.sourceQualityBlockSql(),
    "curation_audit"      -> Govern.curationAuditSql(),
    "pipeline_training_manifest" -> Govern.trainingManifestSql(),
    "tfidf_terms"         -> TextAnalysis.tfidfTermsSql(),
    "sparse_tfidf_pairs"  -> TextAnalysis.sparseTfidfPairsSql(),
    "bm25_retrieve"       -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod),
    // the persisted-index serve must equal the one-shot retrieval —
    // and so must serve-after-append on the raw appendable layout
    "bm25_serve"          -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod),
    "bm25_append"         -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod),
    // the tombstoned+vacuumed index must equal a from-scratch build
    // on the surviving corpus (delete = exact erasure)
    "bm25_delete"         -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod,
      pred = "doc_id % 3 <> 0"),
    // the impact layout's STALENESS-BOUNDED forget: stats stay
    // global (stale), served postings + panel exclude the tombstoned
    "bm25_stale_serve"    -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod,
      servedPred = "doc_id % 5 <> 3"),
    // the whole catalog lifecycle (build → supersede-on-drift →
    // vacuum → fleet lookup) must be answer-invisible
    "bm25_catalog_serve"  -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod),
    "bm25_rollback_serve" -> TextAnalysis.bm25RetrieveSql(cfg.k, cfg.dfCap, cfg.qMod,
      pred = "doc_id <= (SELECT max(doc_id) * 7 // 10 FROM documents)"),
    "doc_embed"           -> TextAnalysis.docEmbedSql(),
    "hybrid_retrieve"     -> TextAnalysis.hybridRetrieveSql(),
    "hybrid_serve"        -> TextAnalysis.hybridServeSql(cfg.k, cfg.dfCap, cfg.nQueries,
      wLex = cfg.wLex, wSem = cfg.wSem),
    // the two-kind epoch cutover (registerAll → vacuum → fleet
    // lookups) must be answer-invisible vs the directly-served pair
    "hybrid_catalog_serve" -> TextAnalysis.hybridServeSql(cfg.k, cfg.dfCap, cfg.nQueries,
      wLex = cfg.wLex, wSem = cfg.wSem),
    "typo_neighbors"      -> TextAnalysis.typoNeighborsSql,
    "bpe_pair_counts"     -> TextAnalysis.bpePairCountsSql(),
    "bpe_train_merges"    -> TextAnalysis.bpeTrainMergesSql(),
    "bpe_encode"          -> TextAnalysis.bpeEncodeSql(),
    "substring_dedup"     -> NearDup.substringDedupSql(),
    "substring_dedup_strip" -> NearDup.substringStripSql(),
    "stream_substring_dedup" -> graft.streaming.Streams.streamSubstringDedupSql(),
    "mm_dedup"            -> Multimodal.mmDedupSql,
    "mm_resize"           -> Multimodal.mmResizeSql,
    "mm_frame_sample"     -> Multimodal.mmFrameSampleSql(),
    "mm_phash"            -> Multimodal.mmPhashSql,
    "mm_phash_dedup"      -> Multimodal.mmPhashDedupSql(),
    "mm_phash_cluster"    -> Multimodal.mmPhashClusterSql(),
    "asof_join"           -> AsOf.asofStateJoinSql,
    "range_join_pairs"    -> RangeJoin.rangePairsSql(),
    "lang_id"             -> TextAnalysis.langIdSql,
    "quality_score"       -> TextAnalysis.qualityScoreSql,
    "token_count"         -> TextAnalysis.tokenCountSql,
    "keyword_extract"     -> TextAnalysis.keywordExtractSql(),
    "topic_classify"      -> TextAnalysis.topicClassifySql,
    "nb_quality_classify" -> TextAnalysis.nbQualityClassifySql(),
    "dsir_select"         -> TextAnalysis.dsirSelectSql(),
    "nb_quality_calibrate" -> TextAnalysis.nbQualityCalibrateSql(),
    "pipeline_clean_corpus" -> TextAnalysis.pipelineCleanCorpusSql(),
    "perplexity_score"    -> TextAnalysis.perplexityScoreSql,
    "mm_metadata"         -> Multimodal.mmMetadataSql,
    "mm_feature_extract"  -> Multimodal.mmFeatureExtractSql,
    // block E (stream_near_dedup hash-gates on the md5-minhash
    // truncation-cap oracle; stream_sessionize on B8's window oracle)
    "stream_near_dedup"   -> graft.streaming.Streams.streamNearDedupSql(),
    "stream_mm_dedup"     -> graft.streaming.Streams.streamMmDedupSql(),
    // finalized-batch parity: the incremental index must serve C23's
    // own answer, so it gates on C23's own oracle
    "stream_bm25"         -> TextAnalysis.bm25RetrieveSql(),
    "stream_window_agg"   -> graft.streaming.Streams.streamWindowAggSql,
    "stream_window_topk"  -> graft.streaming.Streams.streamWindowTopkSql(),
    "stream_dedup"        -> graft.streaming.Streams.streamDedupSql,
    "stream_join"         -> graft.streaming.Streams.streamJoinSql,
    "stream_enrich"       -> graft.streaming.Streams.streamEnrichSql,
    // frozen-model micro-batch scoring ≡ one-shot scoring: E19 gates
    // on C32's own oracle (the E7-on-B12 posture)
    "stream_quality_classify" -> TextAnalysis.nbQualityClassifySql(),
    "stream_dsir_select"  -> TextAnalysis.dsirSelectSql(),
    "stream_decontaminate" -> Govern.decontaminateSql(),
    "stream_asof_enrich"  -> operators.AsOf.asofStateJoinSql,
    "stream_sessionize"   -> graft.streaming.Streams.streamSessionizeSql(),
    // block F — governance / curation
    "pii_redact"          -> Govern.piiRedactSql,
    "repetition_score"    -> Govern.repetitionScoreSql,
    "decontaminate"       -> Govern.decontaminateSql(),
    "sample_split"        -> Govern.sampleSplitSql,
    "stratified_sample"   -> Govern.stratifiedSampleSql,
    "weighted_sample"     -> Govern.weightedSampleSql(),
    "drift_report"        -> Govern.driftReportSql(),
    "mixture_sample"      -> Govern.mixtureSampleSql(),
    "doc_chunk"           -> TextAnalysis.docChunkSql(),
    "sentence_stats"      -> Govern.sentenceStatsSql,
    "csv_ingest"          -> Govern.csvRoundtripSql,
    "pack_sequences"      -> Govern.packSequencesSql(),
    "resample_fill"       -> TimeSeries.resampleFillSql,
    "centroid_per_label"  -> Similarity.centroidPerLabelSql,
    "knn_classify"        -> Similarity.knnClassifySql(),
    // the IVF form at nprobe = nlist is exact by construction — same oracle
    "knn_classify_ivf"    -> Similarity.knnClassifySql(),
    "vocab_build"         -> TextAnalysis.vocabBuildSql()
  )
}
