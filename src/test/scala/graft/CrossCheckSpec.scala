package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent re-derivations: each operator checked against a
  * differently-expressed computation of the same semantics (the DuckDB
  * gate already cross-checks engines; these cross-check formulations
  * inside Spark, so they hold even where the oracle is rows-only). */
class CrossCheckSpec extends AnyFunSuite {
  import TestSpark._

  test("range_join_pairs equals the naive inequality join") {
    val got = operators.RangeJoin.rangePairs(spark, sf)
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("b.us") > col("a.us") && col("b.us") <= col("a.us") + 300000000L)
      .select(col("a.event_id").as("id1"), col("b.event_id").as("id2"),
        col("a.user_id"), (col("b.us") - col("a.us")).as("gap_us"))
    assert(got.count() == naive.count())
    assert(got.exceptAll(naive).count() == 0)
  }

  test("scd_change_detect op counts match independent set algebra") {
    val o = Tables.orders(spark, sf)
    val oldK = o.filter(col("o_orderkey") % 5 =!= 0).select(col("o_orderkey"))
    val neuK = o.filter(col("o_orderkey") % 7 =!= 0).select(col("o_orderkey"))
    val inserts = neuK.exceptAll(oldK).count()
    val deletes = oldK.exceptAll(neuK).count()
    val common = oldK.intersect(neuK).count()
    val updatesExpected = o // common keys whose price changed (key%3==0 doubles)
      .filter(col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 7 =!= 0 &&
        col("o_orderkey") % 3 === 0 && col("o_totalprice") =!= 0.0)
      .count()
    val m = operators.Scd.scdChangeDetect(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.getOrElse("insert", 0L) == inserts)
    assert(m.getOrElse("delete", 0L) == deletes)
    assert(m.getOrElse("update", 0L) == updatesExpected)
    assert(m.getOrElse("unchanged", 0L) == common - updatesExpected)
  }

  test("corpus_shard banded rank equals the naive one-window-per-shard formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = operators.Govern.corpusShard(spark, sf)
    val naiveW = Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
    val naive = Tables.documents(spark, sf).select(col("doc_id"))
      .withColumn("skey",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":shard"))), 1, 12), 16, 10)
          .cast("long"))
      .withColumn("shard", (col("skey") % 8).cast("int"))
      .withColumn("pos", row_number().over(naiveW))
      .select(col("doc_id"), col("shard"), col("pos"))
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "band offset + in-band rank must equal the definitional global rank per shard")
  }

  test("curriculum_order banded position equals the naive one-global-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = operators.Govern.curriculumOrder(spark, sf)
      .select(col("doc_id"), col("train_pos"))
    val naive = operators.TextAnalysis.perplexityOf(
        Tables.documents(spark, sf).select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        floor(col("bits_per_token") * lit(1e6) + lit(0.5)).cast("long").as("bm"))
      .withColumn("band", expr("bm div 1000000"))
      .withColumn("ukey",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":curr"))), 1, 12), 16, 10)
          .cast("long"))
      .withColumn("train_pos",
        row_number().over(Window.orderBy(col("band"), col("ukey"), col("doc_id"))).cast("int"))
      .select(col("doc_id"), col("train_pos"))
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
      "band offset + in-(band, sub) rank must equal the definitional global order")
  }

  test("shardBy equals the naive rank on seeded random id sets (sparse, dense, huge ids)") {
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(777)
    for ((n, maxId) <- Seq((50, 1000L), (400, 1L << 40), (300, 64L))) {
      val ids = Seq.fill(n)(math.abs(rnd.nextLong()) % maxId).distinct
      val df = ids.toDF("doc_id")
      val got = operators.Govern.shardBy(df, 8)
      val naive = df
        .withColumn("skey",
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":shard"))), 1, 12), 16, 10)
            .cast("long"))
        .withColumn("shard", (col("skey") % 8).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("pos"))
      assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0,
        s"banded rank diverges on n=$n maxId=$maxId")
    }
  }

  test("dedup_keep_best keep bit equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val kb = operators.NearDup.dedupKeepBest(spark, sf)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    val naive = kb.select(col("doc_id"), col("cluster_id"), col("quality"))
      .withColumn("keep", (row_number().over(w) === 1).cast("boolean"))
    assert(kb.exceptAll(naive).count() == 0 && naive.exceptAll(kb).count() == 0,
      "two-step hash argmax must equal rank-1-per-cluster")
    spark.catalog.clearCache()
  }

  test("date_derive counts cover all orders exactly once") {
    val dd = operators.Clean.dateDerive(spark, sf)
    assert(dd.agg(sum("n_orders")).head().getLong(0) == Tables.orders(spark, sf).count())
  }

  test("q5 equals the same query phrased in SQL on temp views") {
    val s = spark
    Seq("region", "nation", "customer", "supplier", "orders", "lineitem").foreach { t =>
      Tables.table(s, sf, t).createOrReplaceTempView(t)
    }
    val sql = s.sql(
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin)
    val got = operators.Analytics.q5LocalSupplier(s, sf)
    assert(got.exceptAll(sql).count() == 0)
    assert(sql.exceptAll(got).count() == 0)
  }

  test("pivot_wide row sums equal per-user event counts") {
    val pw = operators.Analytics.pivotWide(spark, sf)
    val total = pw.select(
      (col("n_click") + col("n_error") + col("n_purchase") + col("n_signup") + col("n_view"))
        .as("s"))
      .agg(sum("s")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("quality_score is bounded and monotone in components") {
    val qs = operators.TextAnalysis.qualityScore(spark, sf)
    assert(qs.filter(col("quality") < 0.0 || col("quality") > 1.0).count() == 0)
    assert(qs.filter(col("diversity") > 1.0 || col("stop_ratio") > 1.0).count() == 0)
  }

  test("knn_classify_ivf at nprobe = nlist equals brute-force knn_classify; index memo is shared") {
    // two consumers, one build: the memo must hand back the SAME frames
    val idx1 = operators.Similarity.ivfIndex(spark, sf, 16)
    val idx2 = operators.Similarity.ivfIndex(spark, sf, 16)
    assert(idx1._1 eq idx2._1, "centroids rebuilt — ivfIndex memo missed")
    assert(idx1._2 eq idx2._2, "inverted lists rebuilt — ivfIndex memo missed")
    // full-probe IVF = exact: the equi-join-on-cell plan must reproduce
    // the broadcast-crossJoin brute force bit-for-bit
    val ivf = operators.Similarity.knnClassifyIvf(spark, sf)
    val bf = operators.Similarity.knnClassify(spark, sf)
    assert(ivf.exceptAll(bf).count() == 0 && bf.exceptAll(ivf).count() == 0,
      "nprobe = nlist probe must equal brute-force votes exactly")
    spark.catalog.clearCache()
  }

  test("kn_bigram_score: order-sensitivity, driver re-derivation, KN normalization") {
    val s = spark
    import s.implicits._
    val sentence = "the quick brown fox jumps over the lazy dog"
    // same token MULTISET as `sentence`, different order
    val scrambled = "dog the lazy fox quick jumps brown over the"
    val docs = ((1 to 20).map(i => (i.toLong, sentence)) ++
      Seq((100L, sentence), (101L, scrambled))).toDF("doc_id", "text")

    // (a) the discrimination KN exists for: the unigram LM can't see
    // word order (same multiset -> same bits), the bigram LM must
    val uni = operators.TextAnalysis.perplexityOf(docs)
      .select($"doc_id", $"bits_per_token").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(100L) == uni(101L),
      "scrambled twin must keep its unigram bits (same token multiset)")
    val kn = operators.TextAnalysis.knBigramOf(docs)
      .select($"doc_id", $"n_bigrams", $"bits_per_bigram").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(kn(101L)._2 > kn(100L)._2 + 1.0,
      s"scrambled twin must score clearly higher KN bits: " +
        s"fluent=${kn(100L)._2} scrambled=${kn(101L)._2}")
    assert(kn(100L)._1 == 8L && kn(101L)._1 == 8L, "9 tokens -> 8 bigrams")

    // (b) driver-side re-derivation of the exact KN formula
    val bgs = docs.collect().flatMap { r =>
      val w = r.getString(1).trim.split("\\s+")
      w.sliding(2).map(p => (r.getLong(0), (p(0), p(1)))).toSeq
    }
    val cb = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c1 = cb.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val nf = cb.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val nb = cb.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val b = cb.size.toLong
    val n1 = cb.values.count(_ == 1L).toLong
    val n2 = cb.values.count(_ == 2L).toLong
    val d = n1.toDouble / (n1 + 2L * n2).toDouble
    def p(w1: String, w2: String): Double =
      (math.max(cb.getOrElse((w1, w2), 0L).toDouble - d, 0.0)
        + d * nf(w1).toDouble * (nb.getOrElse(w2, 0L).toDouble / b.toDouble)) / c1(w1).toDouble
    for (id <- Seq(100L, 101L)) {
      val doc = bgs.filter(_._1 == id).map(_._2)
      val bits = -doc.map(g => math.log(p(g._1, g._2)) / math.log(2.0)).sum / doc.size
      assert(math.abs(bits - kn(id)._2) < 1e-5,
        s"doc $id: engine bits ${kn(id)._2} vs driver re-derivation $bits")
    }

    // (c) KN's defining invariant: P(.|w1) is a proper distribution —
    // summed over the FULL vocabulary it must hit 1 exactly
    val vocab = (cb.keys.map(_._1) ++ cb.keys.map(_._2)).toSeq.distinct
    for (w1 <- c1.keys) {
      val mass = vocab.map(w2 => p(w1, w2)).sum
      // vocab misses nothing: every w2 with nb > 0 is in it, and
      // P for nb = 0 words is 0 under the continuation model
      assert(math.abs(mass - 1.0) < 1e-9,
        s"sum_w2 P(w2|$w1) = $mass, must be 1 (KN normalization)")
    }
  }

  test("kn_stale_serve: backoff prefers continuation diversity; seen bigrams beat backoff; driver parity") {
    val s = spark
    import s.implicits._
    // frozen LM (ids % 10 < 7): "glue" follows FOUR distinct contexts
    // (count 4); "francisco" occurs FIVE times but only ever after
    // "san" (continuation diversity 1) — the published KN example
    val ref = Seq(
      (1L, "a1 glue"), (2L, "a2 glue"), (3L, "a3 glue"), (4L, "a4 glue"),
      (5L, "san francisco san francisco san francisco san francisco san francisco"),
      (6L, "base base base")).toDF("doc_id", "text")
    // grown docs (ids % 10 >= 7): every backoff leg
    val grown = Seq(
      (7L, "nov glue"),       // unseen context -> pure continuation
      (17L, "nov francisco"), // unseen context, low-diversity word
      (27L, "nov zzz"),       // both unseen -> Laplace floor
      (37L, "san glue"),      // seen context, unseen bigram -> backoff mass
      (47L, "san francisco")  // seen bigram -> discounted direct estimate
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.knStaleServeOf(ref.unionAll(grown), ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all 11 docs scored, stale and new alike, all finite
    assert(out.size == 11 && out.values.forall(b => !b.isNaN && !b.isInfinite))
    // THE Kneser–Ney discrimination: under an unseen context, the
    // 4-context word beats the 5-count-but-1-context word, which
    // still beats a fully unseen word
    assert(out(7L) < out(17L) && out(17L) < out(27L),
      s"continuation-diversity ordering violated: glue=${out(7L)} " +
        s"francisco=${out(17L)} zzz=${out(27L)}")
    // a seen bigram's discounted direct estimate beats pure backoff
    assert(out(47L) < out(37L),
      s"seen bigram ${out(47L)} must beat backoff ${out(37L)}")

    // driver re-derivation of every leg (D, P'cont, backoff, direct)
    val bgs = ref.collect().flatMap { r =>
      r.getString(1).trim.split("\\s+").sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cb = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = cb.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val nf = cb.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val nb = cb.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong }
    val b = cb.size.toLong
    val c = nb.size.toLong
    val n1 = cb.values.count(_ == 1L).toLong
    val n2 = cb.values.count(_ == 2L).toLong
    val d = if (n1 + 2 * n2 == 0) 0.5 else n1.toDouble / (n1 + 2L * n2).toDouble
    def pc(w2: String): Double = (nb.getOrElse(w2, 0L) + 1.0) / (b + c).toDouble
    def p(w1: String, w2: String): Double = c1.get(w1) match {
      case None => pc(w2)
      case Some(cw1) =>
        (math.max(cb.getOrElse((w1, w2), 0L).toDouble - d, 0.0)
          + d * nf(w1).toDouble * pc(w2)) / cw1.toDouble
    }
    for ((id, txt) <- Seq((7L, "nov glue"), (17L, "nov francisco"),
      (27L, "nov zzz"), (37L, "san glue"), (47L, "san francisco"))) {
      val doc = txt.split(" ").sliding(2).map(x => (x(0), x(1))).toSeq
      val bits = -doc.map(g => math.log(p(g._1, g._2)) / math.log(2.0)).sum / doc.size
      assert(math.abs(bits - out(id)) < 1e-5,
        s"doc $id: engine ${out(id)} vs driver $bits")
    }
  }

  test("kn_stale_serve: zero-singleton LM (n1=0, n2>0) takes the D=0.5 default, never log2(0)") {
    val s = spark
    import s.implicits._
    // frozen LM with NO singleton bigram types but a doubleton:
    // "a b a b a b" -> (a,b)×3, (b,a)×2 => n1 = 0, n2 = 1. The raw
    // estimate D = n1/(n1+2n2) = 0 would zero the backoff mass, and
    // an UNSEEN bigram under a seen context ((a,c): c(a,c)=0,
    // c(a·)=3) would score p = (max(0-0,0) + 0·nf·pc)/3 = 0 —
    // log2(0). The guard must widen to n1 == 0, not just n1+2n2 == 0.
    val ref = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val grown = Seq((7L, "a c")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.knStaleServeOf(ref.unionAll(grown), ref)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(out.size == 2, s"both docs must score: $out")
    val byId = out.map(r => r._1 -> r).toMap
    // the unseen-bigram doc keeps its bigram in the count AND scores
    // finite bits (the old d=0 path either dropped it from the sum
    // while n_bigrams still counted it, or errored)
    assert(byId(7L)._2 == 1L, "one bigram in 'a c'")
    assert(!byId(7L)._3.isNaN && !byId(7L)._3.isInfinite,
      s"backoff bits must be finite: ${byId(7L)._3}")
    // driver parity with D = 0.5: p(c|a) = 0.5·nf(a)·pc(c)/c(a·)
    // where nf(a)=1, pc(c)=(0+1)/(btypes+ctypes)=(0+1)/(2+2), c(a·)=3
    val expect = -math.log(0.5 * 1.0 * (1.0 / 4.0) / 3.0) / math.log(2.0)
    assert(math.abs(byId(7L)._3 - expect) < 1e-5,
      s"engine ${byId(7L)._3} vs driver $expect")
  }

  test("kn_append: delta-log store merge equals from-scratch retrain; commit-last; full retraction drops the type") {
    val s = spark
    import s.implicits._
    val ta = operators.TextAnalysis
    val a = Seq((1L, "the quick brown fox jumps"),
      (2L, "the quick red fox sleeps")).toDF("doc_id", "text")
    val b = Seq((3L, "a lazy dog naps"), (4L, "the quick brown fox runs")).toDF("doc_id", "text")
    val gone = Seq((2L, "the quick red fox sleeps")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("kn_store_spec").toString
    try {
      // write + append + retract, then score the survivors from the
      // store: EXACTLY the from-scratch LM on the surviving corpus
      ta.knStoreWrite(a, tmp)
      ta.knStoreAppend(b, tmp)
      ta.knStoreRetract(gone, tmp)
      val survivors = a.filter($"doc_id" =!= 2L).unionAll(b)
      val served = ta.knStoreScore(s, tmp, survivors)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      val scratch = ta.knBigramOf(survivors)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(served == scratch,
        s"store-served scores must equal the retrain bit-for-bit: $served vs $scratch")

      // the retracted doc's exclusive types are gone from the merge;
      // shared types survive with the survivor count
      val counts = ta.knStoreCounts(s, tmp)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(!counts.contains(("red", "fox")), "fully-retracted type must vanish")
      assert(counts(("the", "quick")) == 2L,
        s"shared type keeps the surviving count: ${counts(("the", "quick"))}")

      // commit-last: an uncommitted delta batch is invisible
      ta.knStoreDelta(Seq((9L, "zz yy zz yy")).toDF("doc_id", "text"), tmp,
        overwrite = false, sign = 1L, commit = false)
      val after = ta.knStoreCounts(s, tmp)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(after == counts, "uncommitted batch must not change the merged LM")

      // vacuum: the delta history (3 committed batches + 1 orphan)
      // compacts to ONE live batch; the merged LM is unchanged
      ta.knStoreVacuum(s, tmp)
      val vac = ta.knStoreCounts(s, tmp)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(vac == counts, "vacuum must preserve the merged LM exactly")
      assert(s.read.parquet(s"$tmp/commits").count() == 1L,
        "vacuum must retire the commit history down to one batch")

      // degenerate store lifecycle: an EMPTY-corpus write must leave
      // a READABLE store (non-partitioned parquet keeps its schema on
      // a zero-row write — unlike the partitionBy stores, whose gates
      // guard empties for exactly that reason), an append onto the
      // empty store revives it, and vacuuming the empty store is safe
      val tmp2 = java.nio.file.Files.createTempDirectory("kn_store_empty").toString
      try {
        ta.knStoreWrite(a.filter($"doc_id" < 0L), tmp2)
        assert(ta.knStoreCounts(s, tmp2).count() == 0L,
          "empty-corpus store must read back as an empty LM, not crash")
        ta.knStoreVacuum(s, tmp2)
        assert(ta.knStoreCounts(s, tmp2).count() == 0L,
          "vacuum of an empty store must stay readable")
        ta.knStoreAppend(b, tmp2)
        val revived = ta.knStoreScore(s, tmp2, b)
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
        val direct = ta.knBigramOf(b)
          .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
        assert(revived == direct, "append onto an empty store must train the batch's own LM")
      } finally {
        val p2 = new org.apache.hadoop.fs.Path(tmp2)
        p2.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p2, true)
      }
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Driver-side interpolated trigram KN over a token corpus: returns
    * (tables, p) where p(w1,w2,w3) is the three-level estimate with
    * the stale-serve backoff legs (pure continuation on unseen
    * contexts, Laplace floor on unseen words). laplace=false gives
    * the self-trained form (pl = nl/mtypes, no floor). */
  private def driverKn3(refDocs: Seq[String], laplace: Boolean)
  : (String, String, String) => Double = {
    val tgs = refDocs.flatMap(_.trim.split("\\s+").sliding(3)
      .filter(_.length == 3).map(a => (a(0), a(1), a(2))))
    val ct = tgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c12 = ct.groupBy { case ((w1, w2, _), _) => (w1, w2) }
      .map { case (k, v) => k -> v.values.sum }
    val nf12 = ct.groupBy { case ((w1, w2, _), _) => (w1, w2) }
      .map { case (k, v) => k -> v.size.toLong }
    val cc = ct.keys.toSeq.groupBy(k => (k._2, k._3)).map { case (k, v) => k -> v.size.toLong }
    val ccs = cc.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val nfm = cc.groupBy(_._1._1).map { case (k, v) => k -> v.size.toLong }
    val nl = cc.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val mtypes = cc.size.toLong
    val ltypes = nl.size.toLong
    val n1t = ct.values.count(_ == 1L).toLong
    val n2t = ct.values.count(_ == 2L).toLong
    val n1m = cc.values.count(_ == 1L).toLong
    val n2m = cc.values.count(_ == 2L).toLong
    val d3 = if (n1t == 0) 0.5 else n1t.toDouble / (n1t + 2 * n2t).toDouble
    val d2 = if (n1m == 0) 0.5 else n1m.toDouble / (n1m + 2 * n2m).toDouble
    def pl(w3: String): Double =
      if (laplace) (nl.getOrElse(w3, 0L) + 1.0) / math.max(mtypes + ltypes, 1L).toDouble
      else nl.getOrElse(w3, 0L).toDouble / mtypes.toDouble
    def pm(w2: String, w3: String): Double = ccs.get(w2) match {
      case None => pl(w3)
      case Some(cs) =>
        (math.max(cc.getOrElse((w2, w3), 0L).toDouble - d2, 0.0)
          + d2 * nfm(w2).toDouble * pl(w3)) / cs.toDouble
    }
    (w1: String, w2: String, w3: String) => c12.get((w1, w2)) match {
      case None => pm(w2, w3)
      case Some(c) =>
        (math.max(ct.getOrElse((w1, w2, w3), 0L).toDouble - d3, 0.0)
          + d3 * nf12((w1, w2)).toDouble * pm(w2, w3)) / c.toDouble
    }
  }

  test("kn_trigram_score: driver re-derivation of the three-level recursion; proper normalization") {
    val s = spark
    import s.implicits._
    val sentence = "the quick brown fox jumps over the lazy dog"
    val other = "the lazy dog sleeps under the quick fox"
    val docs = ((1 to 10).map(i => (i.toLong, sentence)) ++
      (11 to 15).map(i => (i.toLong, other))).toDF("doc_id", "text")
    val out = operators.TextAnalysis.knTrigramOf(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.size == 15 &&
      out.values.forall(v => !v._2.isNaN && !v._2.isInfinite))
    assert(out(1L)._1 == 7L, "9 tokens -> 7 trigrams")

    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val p = driverKn3(texts.map(_._2).toSeq, laplace = false)
    for ((id, txt) <- Seq(texts.head, texts.last)) {
      val doc = txt.trim.split("\\s+").sliding(3).map(a => (a(0), a(1), a(2))).toSeq
      val bits = -doc.map(g => math.log(p(g._1, g._2, g._3)) / math.log(2.0)).sum / doc.size
      assert(math.abs(bits - out(id)._2) < 1e-5,
        s"doc $id: engine ${out(id)._2} vs driver $bits")
    }

    // interpolated KN's defining invariant, one order up: for every
    // SEEN context (w1,w2), Σ_w3 P(w3|w1,w2) over the vocabulary = 1
    val vocab = (sentence + " " + other).split("\\s+").distinct.toSeq
    val contexts = (sentence.split("\\s+").sliding(2) ++ other.split("\\s+").sliding(2))
      .map(a => (a(0), a(1))).toSeq.distinct
    for ((w1, w2) <- contexts) {
      val mass = vocab.map(w3 => p(w1, w2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-9,
        s"sum_w3 P(w3|$w1,$w2) = $mass, must be 1 (recursive KN normalization)")
    }
  }

  test("kn_trigram_stale_serve: each recursion rung backs off exactly one level; driver parity") {
    val s = spark
    import s.implicits._
    // frozen LM: enough structure that every serve leg is reachable
    val refTexts = Seq(
      "a b c a b c a b c",   // (a,b,c) seen trigram
      "x b c x b c",         // second context for (b,c): cc(b,c)=2
      "a b d",               // (a,b) context has two continuations
      "q r s q r s")
    val ref = refTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val grown = Seq(
      (107L, "a b c"),   // fully seen trigram: discounted direct leg
      (117L, "z b c"),   // unseen context (z,b): mid-level model P(c|b)
      (127L, "z z c"),   // unseen mid context z: pure continuation P'cont(c)
      (137L, "z z z"),   // fully unseen word: Laplace floor
      (147L, "a b s")    // seen context (a,b), unseen trigram: backoff mass
    ).toDF("doc_id", "text")
    val out = operators.TextAnalysis.knTrigramStaleServeOf(ref.unionAll(grown), ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.size == 9, s"all 9 docs scored: ${out.keySet}")
    assert(out.values.forall(b => !b.isNaN && !b.isInfinite),
      s"every leg finite: $out")
    // ordering: direct beats backoff-mass beats mid-model beats
    // continuation beats the Laplace floor on this corpus
    assert(out(107L) < out(147L),
      s"seen trigram ${out(107L)} must beat backoff mass ${out(147L)}")
    assert(out(117L) < out(137L),
      s"mid-level ${out(117L)} must beat fully-unseen ${out(137L)}")
    assert(out(127L) < out(137L),
      s"continuation ${out(127L)} must beat fully-unseen ${out(137L)}")

    val p = driverKn3(refTexts, laplace = true)
    for ((id, txt) <- Seq((107L, "a b c"), (117L, "z b c"), (127L, "z z c"),
      (137L, "z z z"), (147L, "a b s"))) {
      val doc = txt.split(" ").sliding(3).map(a => (a(0), a(1), a(2))).toSeq
      val bits = -doc.map(g => math.log(p(g._1, g._2, g._3)) / math.log(2.0)).sum / doc.size
      assert(math.abs(bits - out(id)) < 1e-5,
        s"doc $id: engine ${out(id)} vs driver $bits")
    }
  }
}
