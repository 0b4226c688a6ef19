package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the governance/curation block (SURVEY.md §2 F1-F7).
  * The DuckDB gate is the equivalence check; these pin the semantic
  * properties that must survive data regeneration. */
class GovernSpec extends AnyFunSuite {

  test("drift_report: a planted distribution shift scores high; a stable stream scores low") {
    val s = TestSpark.spark
    import s.implicits._
    // "shifty": values in [0,1) for the first half, [9,10) for the
    // second -> disjoint bins, KS = 1.0 (1e6 micros). "stable": the
    // SAME deterministic value pattern in both halves -> KS ~ 0.
    val ev = ((0 until 500).map(i => ("shifty", (i % 100) / 100.0, i.toLong)) ++
      (500 until 1000).map(i => ("shifty", 9.0 + (i % 100) / 100.0, i.toLong)) ++
      (0 until 500).map(i => ("stable", (i % 100) / 10.0, i.toLong)) ++
      (500 until 1000).map(i => ("stable", (i % 100) / 10.0, i.toLong)))
      .toDF("event_type", "value", "us")
    val out = graft.operators.Govern.driftReportOf(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("shifty") == 1000000L, s"planted shift must score max drift: $out")
    assert(out("stable") <= 20000L, s"stable stream must score ~0 drift: $out")
  }

  test("weighted_sample: selection probability tracks the weight (A-Res race)") {
    val s = TestSpark.spark
    import s.implicits._
    // 500 docs, one lang: 100 heavy (w=2000) vs 400 light (w=100).
    // Weight mass is 200k vs 40k, so an m=50 A-Res draw is dominated
    // by heavy docs; the md5 race is deterministic, so the measured
    // split is a fixed number - pinned with slack (binomial-ish
    // expectation ~41 heavy of 50)
    val docs = ((0 until 100).map(i => (i.toLong, "xx", 2000L)) ++
      (100 until 500).map(i => (i.toLong, "xx", 100L))).toDF("doc_id", "lang", "n_chars")
    val out = graft.operators.Govern.weightedSampleOf(docs, m = 50)
      .collect().map(r => r.getLong(2))
    assert(out.length == 50)
    val heavy = out.count(_ == 2000L)
    assert(heavy >= 30, s"heavy docs underrepresented: $heavy/50")
    // and light docs still get in (sampling, not a hard threshold)
    assert(heavy < 50, s"light docs must keep nonzero mass: $heavy/50")
  }

  import TestSpark._

  test("pii_redact: planted PII is counted and fully redacted") {
    val df = operators.Govern.piiRedact(spark, sf).cache()
    // every planted doc detected
    assert(df.filter(col("doc_id") % 7 === 0 && col("n_emails") < 1).count() == 0)
    assert(df.filter(col("doc_id") % 11 === 0 && col("n_urls") < 1).count() == 0)
    assert(df.filter(col("doc_id") % 13 === 0 && col("n_phones") < 1).count() == 0)
    // nothing PII-shaped survives in the redacted text
    assert(df.filter(
      regexp_count(col("redacted"), lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")) +
      regexp_count(col("redacted"), lit("https?://[^\\s<]+")) +
      regexp_count(col("redacted"), lit("\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b")) > 0).count() == 0)
    // docs with no plant are untouched
    val clean = df.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0 &&
      col("doc_id") % 13 =!= 0)
    assert(clean.filter(col("n_emails") + col("n_urls") + col("n_phones") =!= 0).count() == 0)
    df.unpersist()
  }

  test("mixture_sample: temperature flattening downsamples the head, keeps the tail") {
    val docs = Tables.documents(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = operators.Govern.mixtureSample(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1)).as("k"),
        (first(col("keep_rate_micros")) / 1e6).as("r")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // rates follow min(1, 5/sqrt(n)): strictly smaller for bigger languages
    val rates = kept.view.mapValues(_._2).toMap
    assert(rates.keySet == docs.keySet)
    for ((a, na) <- docs; (b, nb) <- docs if na < nb)
      assert(rates(a) >= rates(b), s"rate($a,n=$na) < rate($b,n=$nb)")
    // realized keep fraction tracks the rate (binomial tolerance)
    for ((lang, (k, r)) <- kept) {
      val n = docs(lang).toDouble
      val tol = 4 * math.sqrt(r * (1 - r) * n) + 1
      assert(math.abs(k - r * n) <= tol, s"$lang kept $k of $n at rate $r")
    }
  }

  test("doc_chunk: chunks tile each document with the declared overlap") {
    import spark.implicits._
    val doc = Tables.documents(spark, sf).filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks")).limit(1).collect()(0)
    val toks = doc.getSeq[String](1)
    val chunks = operators.TextAnalysis.docChunk(spark, sf)
      .filter(col("doc_id") === doc.getLong(0)).orderBy(col("chunk_idx")).collect()
    // chunk count = ceil(n / stride); every start token matches the doc
    assert(chunks.length == (toks.length + 23) / 24)
    chunks.foreach { c =>
      val idx = c.getInt(1); val ct = c.getString(3).split(" ").toSeq
      assert(ct == toks.slice(idx * 24, idx * 24 + 32), s"chunk $idx mismatch")
      assert(c.getInt(2) == ct.length)
    }
    // full consecutive chunks overlap by chunkSize - stride = 8 tokens
    chunks.sliding(2).foreach {
      case Array(a, b) if a.getInt(2) == 32 =>
        assert(a.getString(3).split(" ").takeRight(8).toSeq ==
          b.getString(3).split(" ").take(8).toSeq)
      case _ => ()
    }
  }

  test("repetition_score: fractions bounded, counts consistent") {
    val df = operators.Govern.repetitionScore(spark, sf).cache()
    assert(df.filter(col("dup_frac") < 0 || col("dup_frac") >= 1).count() == 0)
    assert(df.filter(col("top_frac") <= 0 || col("top_frac") > 1).count() == 0)
    assert(df.filter(col("n_distinct") > col("n_bigrams")).count() == 0)
    // a doc that is one phrase repeated must score near-max dup_frac
    import spark.implicits._
    val loop = Seq((1L, ("spark rocks " * 50).trim)).toDF("doc_id", "text")
    val toks = split(trim($"text"), "\\s+")
    // reuse the operator's shape on a planted frame via the same expr
    val planted = loop.withColumn("toks", toks)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))")).as("gram"))
      .groupBy($"doc_id", $"gram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n"), count(lit(1)).as("d"))
      .select(($"n" - $"d").cast("double") / $"n".cast("double")).head().getDouble(0)
    assert(planted > 0.95)
    df.unpersist()
  }

  test("decontaminate: benchmark docs never flagged; counts positive") {
    val df = operators.Govern.decontaminate(spark, sf).cache()
    assert(df.filter(col("doc_id") % 17 === 0).count() == 0)
    assert(df.filter(col("n_shared_grams") < 1).count() == 0)
    assert(df.count() > 0)
    df.unpersist()
  }

  test("sample_split: deterministic, buckets in range, splits consistent") {
    val a = operators.Govern.sampleSplit(spark, sf).cache()
    assert(a.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    assert(a.filter(
      (col("bucket") < 80 && col("split") =!= "train") ||
      (col("bucket") >= 80 && col("bucket") < 90 && col("split") =!= "val") ||
      (col("bucket") >= 90 && col("split") =!= "test")).count() == 0)
    // identical assignment on a second evaluation (hash, not random())
    val b = operators.Govern.sampleSplit(spark, sf)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // roughly 80/10/10 (loose: the md5 bucket is uniform)
    val n = a.count().toDouble
    val train = a.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.6 && train / n < 0.95)
    a.unpersist()
  }

  test("stratified_sample: per-lang rate respected") {
    val df = operators.Govern.stratifiedSample(spark, sf).cache()
    assert(df.filter(col("lang") === "en" && col("bucket") >= 10).count() == 0)
    assert(df.filter(col("lang") =!= "en" && col("bucket") >= 30).count() == 0)
    assert(df.count() > 0)
    df.unpersist()
  }

  test("sentence_stats: per-doc invariants") {
    val df = operators.Govern.sentenceStats(spark, sf).cache()
    assert(df.filter(col("n_sentences") < 1).count() == 0)
    assert(df.filter(col("avg_words") > col("max_words")).count() == 0)
    // conservation: sentence words never exceed the doc's tokens, and
    // adding back one removed 'the' per split covers the doc's tokens
    val sums = df.select(col("doc_id"),
      (col("avg_words") * col("n_sentences")).as("sum_words"), col("n_sentences"))
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("double").as("n_toks"),
      (size(split(col("text"), " the ")) - 1).cast("double").as("n_splits"))
    val joined = sums.join(docs, "doc_id")
    assert(joined.filter(col("sum_words") > col("n_toks") + lit(0.5)).count() == 0)
    assert(joined.filter(col("sum_words") + col("n_splits") < col("n_toks") - lit(0.5)).count() == 0)
    df.unpersist()
  }

  test("pack_sequences: doc-count preserved, ranges ordered, offsets sane") {
    val df = operators.Govern.packSequences(spark, sf).cache()
    val totalDocs = Tables.documents(spark, sf).count()
    assert(df.agg(sum(col("n_docs"))).head().getLong(0) == totalDocs)
    assert(df.filter(col("first_doc") > col("last_doc")).count() == 0)
    assert(df.filter(col("seq_idx") < 0 || col("n_docs") < 1).count() == 0)
    // greedy packing: docs are never split, so a sequence overshoots the
    // 2048 budget by at most its largest doc
    val docToks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_tokens"))
    val maxDoc = docToks.agg(max(col("n_tokens"))).head().getLong(0)
    assert(df.filter(col("sum_tokens") >= lit(2048L) + maxDoc).count() == 0)
    df.unpersist()
  }

  test("resample_fill: grid complete per user, fill total, no null values") {
    val df = operators.TimeSeries.resampleFill(spark, sf).cache()
    // one row per user-hour over each user's span, hours unique
    assert(df.count() ==
      df.select(col("user_id"), col("hr")).distinct().count())
    assert(df.filter(col("value_filled").isNull).count() == 0)
    // every user's first grid hour is an observed event hour
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("hr"))
    assert(df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("observed") =!= 1).count() == 0)
    // observed count equals distinct (user, event-hour) pairs in events
    val evHours = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .distinct().count()
    assert(df.filter(col("observed") === 1).count() == evHours)
    df.unpersist()
  }

  test("centroid_per_label: one row per (label, dim), means bounded") {
    val df = operators.Similarity.centroidPerLabel(spark, sf).cache()
    val nLabels = Tables.embeddings(spark, sf).select("label").distinct().count()
    assert(df.count() == nLabels * 64)
    assert(df.filter(col("c_mean") < -1 || col("c_mean") > 1).count() == 0)
    val totalVecs = Tables.embeddings(spark, sf).count()
    assert(df.agg(sum(col("n_vecs"))).head().getLong(0) == totalVecs * 64)
    df.unpersist()
  }

  test("knn_classify: one prediction per query, votes within k") {
    val k = 5
    val df = operators.Similarity.knnClassify(spark, sf, k = k, nQueries = 20).cache()
    assert(df.count() == df.select("query_id").distinct().count())
    assert(df.filter(col("votes") < 1 || col("votes") > k).count() == 0)
    val labels = Tables.embeddings(spark, sf).select(col("label").as("pred_label")).distinct()
    assert(df.join(labels, Seq("pred_label"), "left_anti").count() == 0)
    df.unpersist()
  }

  test("vocab_build: ranks contiguous, coverage monotone to 1.0") {
    val df = operators.TextAnalysis.vocabBuild(spark, sf).cache()
    val n = df.count()
    assert(df.agg(max(col("rank"))).head().getInt(0).toLong == n)
    assert(df.agg(min(col("rank"))).head().getInt(0) == 1)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("rank"))
    assert(df.withColumn("prev", lag(col("cum_cov"), 1).over(w))
      .filter(col("prev").isNotNull && col("cum_cov") < col("prev")).count() == 0)
    // the synthetic vocab is far under topN, so coverage must close at 1.0
    assert(math.abs(df.agg(max(col("cum_cov"))).head().getDouble(0) - 1.0) < 1e-9)
    df.unpersist()
  }

  test("capped_per_group: cap respected, small cells kept whole, deterministic") {
    val cap = 10
    val df = operators.Govern.cappedPerGroup(spark, sf, cap).cache()
    val cells = df.groupBy(col("lang"), col("source")).count()
    assert(cells.filter(col("count") > cap).count() == 0)
    val fullCells = Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("full_n"))
    // cells under the cap keep every doc
    assert(cells.join(fullCells, Seq("lang", "source"))
      .filter(col("full_n") <= cap && col("count") =!= col("full_n")).count() == 0)
    df.unpersist()
    // determinism: collect two UNCACHED materializations to the driver —
    // an exceptAll of canonically-equal cached plans would compare the
    // cache to itself (see DeterminismSpec)
    val run1 = operators.Govern.cappedPerGroup(spark, sf, cap)
      .collect().map(_.toString).sorted.toSeq
    val run2 = operators.Govern.cappedPerGroup(spark, sf, cap)
      .collect().map(_.toString).sorted.toSeq
    assert(run1 == run2)
  }

  test("corpus_shard: positions contiguous per shard, full coverage, banded rank exact") {
    val n = 8
    val df = operators.Govern.corpusShard(spark, sf, n).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(df.count() == nDocs)
    assert(df.select("doc_id").distinct().count() == nDocs)
    assert(df.filter(col("shard") < 0 || col("shard") >= n).count() == 0)
    // per shard: positions are exactly 1..count (contiguous, no dup) —
    // this fails if the band-offset arithmetic is off by one anywhere
    val per = df.groupBy("shard").agg(
      count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"),
      countDistinct("pos").as("d"))
    assert(per.filter(col("mn") =!= 1 || col("mx") =!= col("c") ||
      col("d") =!= col("c")).count() == 0,
      "within-shard positions must be a contiguous 1..n_shard sequence")
    // md5 keys spread shards roughly uniformly (no empty shard at sf)
    assert(per.count() == n)
    df.unpersist()
  }

  test("zorder_layout: exact Morton codes (dual-path), full file chunks, and real data-skipping locality") {
    import org.apache.spark.sql.expressions.Window
    // 256 rows/file → ~23 files at the test SF: enough files for the
    // locality claim to be measurable (the registry default of 4096
    // yields only 2 files on 6k rows, where any layout's bbox is huge)
    val rowsPerFile = 256
    val df = operators.Govern.zorderLayout(spark, sf, rowsPerFile).cache()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val n = li.count()
    assert(df.count() == n)
    // dual-path Morton check: recompute zval with an INDEPENDENT
    // formulation (per-bit transform/aggregate instead of the
    // shift-or-mask rounds) over the same min-max scaling. Multiset
    // compare — the synthetic lineitem has duplicate (orderkey,
    // linenumber) pairs, so a key join would cross-match dup rows.
    val b = li.agg(min("l_partkey").as("minx"), max("l_partkey").as("maxx"),
      min("l_suppkey").as("miny"), max("l_suppkey").as("maxy"))
    val ref = li.crossJoin(broadcast(b))
      .withColumn("zx", expr("((l_partkey - minx) * 65535) div greatest(1L, maxx - minx)"))
      .withColumn("zy", expr("((l_suppkey - miny) * 65535) div greatest(1L, maxy - miny)"))
      .withColumn("zval", expr(
        """aggregate(sequence(0, 15), 0L, (acc, i) ->
          |  acc + shiftleft((zx >> i) & 1L, 2*i) + shiftleft((zy >> i) & 1L, 2*i+1))"""
          .stripMargin))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("zval"))
    assert(df.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zval")
      .exceptAll(ref).count() == 0,
      "shift-or-mask interleave must equal the per-bit formulation")
    // file chunks: ids contiguous from 0, every file full except the last
    val files = df.groupBy("file_id").agg(count(lit(1)).as("c"),
      min("zval").as("mnz"), max("zval").as("mxz")).cache()
    val nFiles = files.count()
    assert(files.agg(min("file_id"), max("file_id")).first()
      == org.apache.spark.sql.Row(0, nFiles.toInt - 1))
    assert(files.filter(col("file_id") < nFiles - 1 && col("c") =!= rowsPerFile)
      .count() == 0, "every non-final file must hold exactly rowsPerFile rows")
    // z-ordering: file boundaries respect zval order (ties may span)
    val wb = Window.orderBy(col("file_id"))
    assert(files.withColumn("nxt", lead(col("mnz"), 1).over(wb))
      .filter(col("nxt").isNotNull && col("mxz") > col("nxt")).count() == 0)
    // THE point of the layout — data skipping: mean per-file bounding
    // rectangle in (partkey, suppkey) space must beat a key-ordered
    // layout of the same file size by 2x+ (min/max file stats prune
    // either dimension's filters only if the rectangles are small)
    def meanArea(assigned: org.apache.spark.sql.DataFrame): Double =
      assigned.groupBy("fid").agg(
          ((max("l_partkey") - min("l_partkey") + 1) *
           (max("l_suppkey") - min("l_suppkey") + 1)).as("area"))
        .agg(avg("area")).first().getDouble(0)
    val zArea = meanArea(df.withColumnRenamed("file_id", "fid"))
    val naive = li.withColumn("rn",
        row_number().over(Window.orderBy(col("l_orderkey"), col("l_linenumber"))))
      .withColumn("fid", expr(s"cast((rn - 1) div $rowsPerFile as int)"))
    val nArea = meanArea(naive)
    assert(zArea < nArea * 0.5,
      s"z-order mean file bbox area $zArea not < half of key-ordered $nArea")
    files.unpersist(); df.unpersist()
  }

  test("compaction_plan: exact exclusive offsets, contiguous bins, payload within max-file of target") {
    import org.apache.spark.sql.expressions.Window
    val target = 16384L
    val df = operators.Govern.compactionPlan(spark, sf, target).cache()
    val docs = Tables.documents(spark, sf)
    assert(df.count() == docs.count())
    // bin consistency: bin_id is exactly start_off div target
    assert(df.filter(expr(s"bin_id != cast(start_off div $target as int)")).count() == 0)
    // dual-path offsets: one global exclusive-cumsum window (test-only
    // single partition) must reproduce the banded two-pass offsets
    val ref = docs.select(col("doc_id"), col("n_chars").cast("long").as("size"))
      .withColumn("start_off", coalesce(sum("size").over(
        Window.orderBy("doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
    assert(df.select("doc_id", "size", "start_off")
      .exceptAll(ref.select("doc_id", "size", "start_off")).count() == 0,
      "banded two-pass offsets must equal the global cumsum")
    // packing quality: every bin's payload is within one max file size
    // of the target (the sequential-coalescing guarantee), except the
    // final partial bin which may be arbitrarily small
    val maxSize = ref.agg(max("size")).first().getLong(0)
    val lastBin = df.agg(max("bin_id")).first().getInt(0)
    val bins = df.groupBy("bin_id").agg(sum("size").as("payload"))
    assert(bins.filter(col("bin_id") =!= lastBin &&
      (col("payload") < target - maxSize || col("payload") > target + maxSize))
      .count() == 0,
      s"non-final bins must pack to target ± max file size ($target ± $maxSize)")
    // bins partition the id order contiguously: max doc offset of bin k
    // never exceeds min of bin k+1 (monotone assignment)
    val wb = Window.orderBy(col("bin_id"))
    val rng = df.groupBy("bin_id").agg(min("start_off").as("mn"), max("start_off").as("mx"))
    assert(rng.withColumn("nxt", lead(col("mn"), 1).over(wb))
      .filter(col("nxt").isNotNull && col("mx") > col("nxt")).count() == 0)
    df.unpersist()
  }

  test("stats_prune: pruned read equals the full-scan filter; files touched shrink") {
    // 256 rows/file, same as the zorder spec: ~23 files at the test SF
    val rowsPerFile = 256
    val pruned = operators.Govern.statsPrune(spark, sf, rowsPerFile).cache()
    val layout = operators.Govern.zorderLayout(spark, sf, rowsPerFile)
    // recompute the corner-box predicate independently
    val r = layout.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    def lv(i: Int): Long = r.getAs[Number](i).longValue()
    val (pmin, pmax, smin, smax) = (lv(0), lv(1), lv(2), lv(3))
    val (pHi, sHi) = (pmin + (pmax - pmin) / 8, smin + (smax - smin) / 8)
    val matchRows = layout.filter(col("l_partkey").between(pmin, pHi) &&
      col("l_suppkey").between(smin, sHi))
    // no row lost: reading ONLY the surviving files and filtering gives
    // exactly the full-scan filter result
    val prunedRead = layout
      .join(pruned.select("file_id"), Seq("file_id"), "left_semi")
      .filter(col("l_partkey").between(pmin, pHi) &&
        col("l_suppkey").between(smin, sHi))
    assert(matchRows.count() == prunedRead.count() &&
      matchRows.drop("file_id").exceptAll(prunedRead.drop("file_id")).count() == 0,
      "pruned read must return the identical row multiset")
    // n_match accounting ties the survivor set to real row counts
    assert(pruned.agg(sum("n_match")).first().getLong(0) == matchRows.count())
    // the measured payoff: the 1/8 x 1/8 corner box on a z-ordered
    // layout touches a small fraction of the files
    val nFiles = layout.select("file_id").distinct().count()
    val touched = pruned.count()
    assert(touched * 2 <= nFiles,
      s"pruning must skip at least half the files (touched $touched of $nFiles)")
    pruned.unpersist()
    spark.catalog.clearCache()
  }

  test("stats_prune drives a REAL partition-pruned parquet read: same rows, fewer files opened") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // the sibling spec checks the pruning DECISION on the layout frame;
    // this one makes it physical: write the layout as a partition-per-
    // file parquet lake, scan back only the survivor files, and measure
    // files-opened from the scan's own numFiles metric
    val rowsPerFile = 256
    val lake = java.nio.file.Files.createTempDirectory("graft_zlake").toFile
    lake.deleteOnExit()
    operators.Govern.zorderWrite(spark, sf, lake.getAbsolutePath, rowsPerFile)
    val survivors = operators.Govern.statsPrune(spark, sf, rowsPerFile)
      .select("file_id").collect().map(_.getInt(0)).toSeq
    // the corner-box predicate, recomputed as in the sibling spec
    val layout = operators.Govern.zorderLayout(spark, sf, rowsPerFile)
    val r = layout.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    def lv(i: Int): Long = r.getAs[Number](i).longValue()
    val (pHi, sHi) = (lv(0) + (lv(1) - lv(0)) / 8, lv(2) + (lv(3) - lv(2)) / 8)
    def box(df: DataFrame): DataFrame = df.filter(
      col("l_partkey").between(lv(0), pHi) && col("l_suppkey").between(lv(2), sHi))
    val fullScan = box(spark.read.parquet(lake.getAbsolutePath))
    val prunedRead = box(operators.Govern.prunedScan(
      spark, lake.getAbsolutePath, survivors))
    // no row lost: the pruned physical read returns the identical
    // multiset (a skipped file's bbox is disjoint from the box)
    assert(fullScan.count() == prunedRead.count() &&
      fullScan.exceptAll(prunedRead).count() == 0,
      "pruned physical read must equal the full-scan filter")
    // the measured payoff: directory pruning actually happened — the
    // pruned scan opened exactly the survivor files, at most half of
    // the lake (same bar as the decision-level spec)
    val (nFull, nPruned) = (filesOpened(fullScan), filesOpened(prunedRead))
    assert(nPruned == survivors.length,
      s"pruned scan opened $nPruned files, expected ${survivors.length} survivors")
    assert(nPruned * 2 <= nFull,
      s"pruning must skip at least half the physical files ($nPruned of $nFull)")
    spark.catalog.clearCache()
  }

  test("zorder_layout: the scalar-bounds cross carries NO join condition (nullability pin)") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    // the inner join on band infers isnotnull(band); if zval were
    // nullable, pushdown would inline the whole Morton expression —
    // un-CSE'd, interpreted — into this join's condition (measured
    // 14x on the scan stage). coalesce pins zval non-nullable so the
    // inferred filter folds away; this asserts it stays folded.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // the registry query now returns the memoized CHECKPOINT scan (an
    // opaque RDD, same as the ngram memo) — pin the shape on the
    // UNCACHED build core where the cross stays visible
    val plan = operators.Govern.zorderLayoutBuild(spark, sf, 4096)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(all)
    val bnljs = all(plan).collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnljs.nonEmpty, "expected the scalar-bounds cross to plan as BNLJ")
    bnljs.foreach { j =>
      assert(j.condition.isEmpty,
        s"zorder_layout cross must stay condition-free, got: ${j.condition}")
    }
  }

  test("curriculum_order: positions a permutation, bands easy→hard and contiguous, within-band order is the md5 key") {
    val s = TestSpark.spark
    import s.implicits._
    // three difficulty tiers: pure common vocabulary (low bits), mixed,
    // unique-token noise (high bits) — plus a token-free doc (absent)
    val docs = ((0L until 8L).map(i => (i, "common common common common word word")) ++
      (8L until 16L).map(i => (i, s"common word mid$i rare$i other$i extra$i")) ++
      (16L until 24L).map(i => (i, s"zz$i qq$i ww$i vv$i uu$i tt$i")) :+
      ((24L, "  ")))
      .toDF("doc_id", "text")
    val out = graft.operators.Govern.curriculumOrderOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bits_micros"),
        r.getAs[Int]("band"), r.getAs[Int]("train_pos")))
    assert(out.length == 24 && !out.exists(_._1 == 24L))
    // positions are exactly 1..n
    assert(out.map(_._4).sorted.toSeq == (1 to 24).toSeq)
    // band is monotone in position: every doc in band b precedes b+1
    val byPos = out.sortBy(_._4)
    assert(byPos.sliding(2).forall {
      case Array(a, b) => a._3 <= b._3
      case _ => true }, s"bands must be contiguous in training order: ${byPos.toSeq}")
    // the easy tier trains first, the noise tier last
    val firstTier = byPos.take(8).map(_._1).toSet
    assert(firstTier == (0L until 8L).toSet, s"easy docs first: $firstTier")
    assert(byPos.takeRight(8).map(_._1).toSet == (16L until 24L).toSet)
    // within a band the order is the md5 key, NOT doc_id: the easy
    // tier's ids must not come out 0, 1, 2, … (md5 scrambles them)
    assert(byPos.take(8).map(_._1).toSeq != (0L until 8L).toSeq,
      "within-band order must be the pseudo-random key, not insertion order")
  }

  test("mixture_allocate: quotas sum exactly to the budget; sqrt temperature upweights the tail; leftovers to largest remainders") {
    val s = TestSpark.spark
    import s.implicits._
    // head lang: 90 docs x 10 tokens = 900; tail lang: 10 docs x 10 = 100
    // sqrt shares: 30 vs 10 -> quotas 750/250 of B=1000 (exact split,
    // no leftover); proportional would have given 900/100
    val docs = ((0 until 90).map(i => (i.toLong, "big", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")) ++
      (0 until 10).map(i => ((100 + i).toLong, "small", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Govern.mixtureAllocateOf(docs, budget = 1000L)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("quota_tokens")))).toMap
    assert(out("big") == ((900L, 750L)) && out("small") == ((100L, 250L)), s"$out")
    // an odd budget forces a leftover seat: 751/250 splits 1001 with
    // the extra going to the larger remainder
    val out2 = graft.operators.Govern.mixtureAllocateOf(docs, budget = 1001L)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("quota_tokens")).toMap
    assert(out2.values.sum == 1001L, s"quotas must sum exactly to the budget: $out2")
    // three-lang case: conservation holds whatever the remainders
    val docs3 = docs.unionAll(Seq((200L, "mid", "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "lang", "text"))
    val out3 = graft.operators.Govern.mixtureAllocateOf(docs3, budget = 997L)
      .collect().map(r => r.getAs[Long]("quota_tokens"))
    assert(out3.sum == 997L && out3.forall(_ >= 0))
  }

  test("curation_audit: kept ⇔ no flag fires; every flag agrees with its own stage; benchmark docs absent") {
    import spark.implicits._
    val audit = operators.Govern.curationAudit(spark, sf).localCheckpoint()
    val rows = audit.collect()
    assert(rows.nonEmpty)
    // kept is exactly the conjunction of the five flags
    assert(rows.forall { r =>
      r.getAs[Boolean]("kept") == !(r.getAs[Boolean]("is_dup") ||
        r.getAs[Boolean]("contaminated") || r.getAs[Boolean]("low_quality") ||
        r.getAs[Boolean]("deselected") || r.getAs[Boolean]("blocked_source"))
    })
    // benchmark members never appear
    assert(rows.forall(_.getAs[Long]("doc_id") % 17 != 0))
    // one row per training doc
    assert(rows.length ==
      Tables.documents(spark, sf).filter(col("doc_id") % 17 =!= 0).count().toInt)
    // each flag column agrees with the stage that owns it
    val cont = operators.Govern.decontaminate(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => r.getAs[Boolean]("contaminated") ==
      cont.contains(r.getAs[Long]("doc_id"))))
    val lowq = operators.TextAnalysis.nbQualityClassify(spark, sf)
      .filter(col("pred") === "drop")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => r.getAs[Boolean]("low_quality") ==
      lowq.contains(r.getAs[Long]("doc_id"))))
    val desel = operators.TextAnalysis.dsirSelect(spark, sf)
      .filter(!col("selected"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => r.getAs[Boolean]("deselected") ==
      desel.contains(r.getAs[Long]("doc_id"))))
    val blockedSrc = operators.Govern.sourceQualityBlock(spark, sf)
      .filter(col("blocked")).select(col("source"))
      .collect().map(_.getString(0)).toSet
    assert(rows.forall(r => r.getAs[Boolean]("blocked_source") ==
      blockedSrc.contains(r.getAs[String]("source"))))
    spark.catalog.clearCache()
  }

  test("source_quality_block: each threshold blocks its planted source; the clean source survives") {
    import spark.implicits._
    // four planted sources, one per failure mode + one clean:
    //  - dupfarm: 10 docs, 8 share one normalized text (7 excess) → 7*5 > 10
    //  - shortfarm: 4 docs, 3 under 200 chars → 3*2 > 4
    //  - contfarm: 5 docs, 2 flagged contaminated → 2*5 > 5
    //  - clean: 10 distinct long docs, nothing flagged
    val long = "x " * 150 // 300 chars
    val docs = (
      (0L until 8L).map(i => (i, s"dup body $long", "dupfarm", 300L)) ++
      Seq((8L, s"uniq a $long", "dupfarm", 300L), (9L, s"uniq b $long", "dupfarm", 300L)) ++
      (10L until 13L).map(i => (i, s"tiny $i", "shortfarm", 10L)) :+
      (13L, s"long enough $long", "shortfarm", 300L)) ++
      (14L until 19L).map(i => (i, s"cont doc $i $long", "contfarm", 300L)) ++
      (19L until 29L).map(i => (i, s"clean doc $i $long", "clean", 300L))
    val contaminated = Seq(14L, 15L).toDF("doc_id")
    val out = operators.Govern.sourceQualityBlockOf(
        docs.toDF("doc_id", "text", "source", "n_chars"), contaminated)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_contaminated"),
          r.getAs[Long]("n_dup_excess"), r.getAs[Long]("n_short"),
          r.getAs[Boolean]("blocked")))).toMap
    assert(out.keySet == Set("dupfarm", "shortfarm", "contfarm", "clean"))
    assert(out("dupfarm") == ((10L, 0L, 7L, 0L, true)), s"dupfarm = ${out("dupfarm")}")
    assert(out("shortfarm") == ((4L, 0L, 0L, 3L, true)))
    assert(out("contfarm") == ((5L, 2L, 0L, 0L, true)))
    assert(out("clean") == ((10L, 0L, 0L, 0L, false)))
  }

  test("pipeline_training_manifest: survivors respect every upstream gate; shard positions contiguous") {
    val mf = operators.Govern.trainingManifest(spark, sf).cache()
    // no benchmark member, no planted-twin id, every doc at most once
    assert(mf.filter(col("doc_id") % 17 === 0).count() == 0)
    assert(mf.filter(col("doc_id") >= 1000000L).count() == 0)
    assert(mf.select("doc_id").distinct().count() == mf.count())
    // survivors ⊆ mixture accepts, ⊆ dedup keepers, ∩ contaminated = ∅
    val mixed = operators.Govern.mixtureSample(spark, sf).select("doc_id")
    assert(mf.select("doc_id").exceptAll(mixed).count() == 0)
    val keepers = operators.NearDup.dedupKeepBest(spark, sf)
      .filter(col("keep")).select("doc_id")
    assert(mf.select("doc_id").exceptAll(keepers).count() == 0)
    val contaminated = operators.Govern.decontaminate(spark, sf).select("doc_id")
    assert(mf.select("doc_id").join(contaminated, "doc_id").count() == 0)
    // shard positions are a contiguous 1..n_shard sequence
    val per = mf.groupBy("shard").agg(
      count(lit(1)).as("c"), min("pos").as("mn"), max("pos").as("mx"),
      countDistinct("pos").as("d"))
    assert(per.filter(col("mn") =!= 1 || col("mx") =!= col("c") ||
      col("d") =!= col("c")).count() == 0)
    mf.unpersist()
    spark.catalog.clearCache()
  }

  test("equidepth_histogram: four buckets per type, roughly balanced") {
    val df = operators.Analytics.equidepthHistogram(spark, sf).cache()
    val types = df.select("event_type").distinct().count()
    assert(df.count() == types * 4) // every type fills all 4 buckets
    // equi-depth up to ties: no bucket beyond 45% of its type's rows
    val tot = df.groupBy(col("event_type")).agg(sum(col("n_events")).as("t"))
    assert(df.join(tot, "event_type")
      .filter(col("n_events") > col("t") * 0.45).count() == 0)
    df.unpersist()
  }

  test("scd2_intervals: one open row per key, intervals ordered") {
    val df = operators.Scd.scd2Intervals(spark, sf).cache()
    assert(df.count() == Tables.events(spark, sf).count())
    val perUser = df.filter(col("is_current")).groupBy(col("user_id")).count()
    assert(perUser.filter(col("count") =!= 1).count() == 0)
    assert(df.filter(col("valid_to").isNotNull && col("valid_to") < col("valid_from"))
      .count() == 0)
    df.unpersist()
  }

  test("funnel_stages: stage counts are monotone non-increasing") {
    val rows = operators.Analytics.funnelStages(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // getOrElse: an empty stage emits no row (groupBy of an empty set) —
    // that is a valid funnel, not a test crash
    def n(stage: String): Long = rows.getOrElse(stage, 0L)
    assert(rows.nonEmpty)
    assert(n("1_view") >= n("2_click_after_view"))
    assert(n("2_click_after_view") >= n("3_purchase_after_click"))
  }

  test("tfidf_terms: k terms per doc, positive weights, contiguous ranks") {
    val df = operators.TextAnalysis.tfidfTerms(spark, sf).cache()
    val perDoc = df.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("maxrk"))
    assert(perDoc.filter(col("n") > 3 || col("n") =!= col("maxrk")).count() == 0)
    assert(df.filter(col("tfidf") <= 0).count() == 0)
    assert(df.filter(col("rk") < 1 || col("rk") > 3).count() == 0)
    df.unpersist()
  }

  test("mm_dedup: planted twin payloads collapse, copies conserved") {
    // robust to regenerated data: if k raw texts are byte-identical the
    // group has 2k copies — assert evenness + conservation, not ==2
    val df = operators.Multimodal.mmDedup(spark, sf).cache()
    assert(df.filter(col("n_copies") < 2 || col("n_copies") % 2 =!= 0).count() == 0)
    assert(df.filter(col("keeper_id") >= 1000000L).count() == 0)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(df.agg(sum(col("n_copies"))).head().getLong(0) == 2 * totalDocs)
    df.unpersist()
  }

  test("csv_ingest: roundtrip matches the direct aggregate") {
    val rt = operators.Govern.csvRoundtrip(spark, sf)
    val direct = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    assert(rt.except(direct).count() == 0 && direct.except(rt).count() == 0)
  }

  test("contam_overlap_report: fractions and verdicts exact, zero-hit docs included, hits agree with decontaminate") {
    val s = spark
    import s.implicits._
    // BenchMod = 17, so doc 0 is the benchmark
    val docs = Seq(
      (0L, "b1 b2 b3 b4 b5 b6 b7"),      // benchmark: 4 distinct 4-grams
      (1L, "b1 b2 b3 b4 b5 b6 b7"),      // verbatim copy -> 4/4 dirty
      (2L, "b1 b2 b3 b4 x1 x2 x3 x4"),   // one shared gram of 5 -> partial
      (3L, "c1 c2 c3 c4 c5")             // no overlap -> clean
    ).toDF("doc_id", "text")
    val out = operators.Govern.contamOverlapOf(docs, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((4L, 4L, 1000000L, "dirty")))
    assert(out(2L) == ((5L, 1L, 200000L, "partial")))
    assert(out(3L) == ((2L, 0L, 0L, "clean")),
      "a zero-hit doc must appear with verdict clean (F3's inner join drops it)")
    assert(!out.contains(0L), "the benchmark doc itself is not graded")

    // real corpus: the docs this report marks as hit (n_shared > 0)
    // must be exactly decontaminate's flag set, with identical counts
    val rep = operators.Govern.contamOverlapReport(spark, sf)
      .filter(col("n_shared") > 0).select(col("doc_id"), col("n_shared"))
    val f3 = operators.Govern.decontaminate(spark, sf)
      .select(col("doc_id"), col("n_shared_grams").as("n_shared"))
    assert(rep.exceptAll(f3).count() == 0 && f3.exceptAll(rep).count() == 0,
      "hit set must agree with decontaminate row-for-row")
    spark.catalog.clearCache()
  }

  test("source_overlap: identical sources read 1.0, disjoint read 0, KMV tracks exact Jaccard") {
    val s = spark
    import s.implicits._
    // planted panel: A == B verbatim, C disjoint vocabulary, D = half
    // of A's stream + its own tail (exact shingle J(A,D) = 148/448)
    val wa = (1 to 300).map("a" + _).mkString(" ")
    val wc = (1 to 300).map("c" + _).mkString(" ")
    val wd = ((1 to 150).map("a" + _) ++ (1 to 150).map("d" + _)).mkString(" ")
    val docs = Seq(("A", wa), ("B", wa), ("C", wc), ("D", wd)).toDF("source", "text")
    val est = operators.Govern.sourceOverlapOf(docs, 128).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(est.size == 6, "4 sources -> 6 pairs")
    assert(est(("A", "B"))._3 == 1000000L,
      "identical shingle sets must estimate exactly 1.0 (d == k')")
    assert(est(("A", "C"))._3 == 0L && est(("B", "C"))._3 == 0L,
      "disjoint shingle sets must estimate exactly 0")
    val exactAD = 148.0 / 448.0
    val gotAD = est(("A", "D"))._3.toDouble / 1e6
    assert(math.abs(gotAD - exactAD) <= 0.15,
      s"KMV estimate $gotAD too far from exact $exactAD (k = 128, SE ~ 0.04)")

    // real corpus: estimates track the EXACT pairwise shingle Jaccard
    // within KMV error (mean abs error over all pairs <= 0.1)
    val real = Tables.documents(spark, sf).select(col("source"), col("text"))
    val sh = real
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .filter(size(col("w")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("g"))
      .select(col("source"),
        conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct().localCheckpoint()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("ni")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = operators.Govern.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4) / 1e6).toMap
    val errs = got.map { case (pair, e) =>
      val ni = inter.getOrElse(pair, 0L).toDouble
      val exact = ni / (sizes(pair._1) + sizes(pair._2) - ni)
      math.abs(e - exact)
    }
    assert(errs.sum / errs.size <= 0.1,
      s"mean abs KMV error ${errs.sum / errs.size} exceeds 0.1 (max ${errs.max})")
    spark.catalog.clearCache()
  }

  test("pii_structured: Luhn/mod-97 validation separates real identifiers from random digit runs") {
    val s = spark
    import s.implicits._
    // known-good checksums: 4111111111111111 is the canonical
    // Luhn-valid test PAN; DE89370400440532013000 is the published
    // valid IBAN example. Off-by-one variants must be rejected.
    val docs = Seq(
      (1L, "pay with 4111111111111111 now"),          // valid card
      (2L, "pay with 4111111111111112 now"),          // bad check digit
      (3L, "send to DE89370400440532013000 today"),   // valid IBAN
      (4L, "send to DE88370400440532013000 today"),   // bad check digits
      (5L, "order id 1234567890123456 is not a card"),// random run, Luhn fails
      (6L, "no identifiers here at all"),
      (7L, "both 4111111111111111 and DE89370400440532013000")
    ).toDF("doc_id", "text")
    val out = operators.Govern.piiStructuredOf(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(out(0) == (1L, 1, 0, 0, "pay with <CARD> now"))
    assert(out(1) == (2L, 0, 0, 1, "pay with 4111111111111112 now"),
      "a checksum-failing candidate must stay in the text, counted rejected")
    assert(out(2) == (3L, 0, 1, 0, "send to <IBAN> today"))
    assert(out(3) == (4L, 0, 0, 1, "send to DE88370400440532013000 today"))
    assert(out(4) == (5L, 0, 0, 1, "order id 1234567890123456 is not a card"),
      "a random 16-digit run is the false positive the checksum exists to spare")
    assert(out(5) == (6L, 0, 0, 0, "no identifiers here at all"))
    assert(out(6) == (7L, 1, 1, 0, "both <CARD> and <IBAN>"))
    // corpus invariants: planted-valid ids (even) always redact,
    // planted-invalid (odd) always reject — the plant's check-digit
    // fold and the validator's fold agree
    val full = operators.Govern.piiStructured(spark, sf).localCheckpoint()
    assert(full.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 0 &&
      col("n_cards") =!= 1).count() == 0, "every even planted card validates")
    assert(full.filter(col("doc_id") % 5 === 0 && col("doc_id") % 2 === 1 &&
      col("n_cards") =!= 0).count() == 0, "every odd planted card rejects")
    assert(full.filter(col("doc_id") % 6 === 0 && col("doc_id") % 2 === 0 &&
      col("n_ibans") =!= 1).count() == 0, "every even planted IBAN validates")
    assert(full.filter(col("doc_id") % 6 === 0 && col("doc_id") % 2 === 1 &&
      col("n_ibans") =!= 0).count() == 0, "every odd planted IBAN rejects")
  }
}
