package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C24 `substring_dedup` — pins the property the operator exists for:
  * CONTENT-DEFINED anchors find a shared span at ANY pair of offsets,
  * where fixed-stride windows only match offsets agreeing mod stride.
  * (The DuckDB hash gate is the cross-engine equivalence check.) */
class SubstringSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deterministic "unrelated" filler and a shared span, alphabetic so
  // normalization is a no-op
  private def block(seed: Int, n: Int): String =
    (0 until n).map(i => ('a' + ((i * 31 + seed * 17 + i * i * 7) % 26)).toChar).mkString

  private val X = block(99, 240) // the shared span, ~240 chars

  test("substring_dedup: shared span found at misaligned offsets; unrelated doc clean") {
    // D1 carries X after a 123-char prefix, D2 after a 38-char prefix:
    // offsets differ by 85, coprime to any power-of-two stride — a
    // fixed-stride scheme would select DIFFERENT windows inside X on
    // each side and report zero duplication
    val docs = Seq(
      (1L, block(1, 123) + X + block(2, 40)),
      (2L, block(3, 38) + X + block(4, 90)),
      (3L, block(5, 400))).toDF("doc_id", "norm")
    val out = operators.NearDup.substringAudit(docs, k = 64, anchorMod = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_win"), r.getAs[Long]("n_dup"), r.getAs[Long]("dup_pct")))).toMap
    assert(out(1L)._2 > 0 && out(2L)._2 > 0,
      s"shared span at misaligned offsets must be detected: $out")
    assert(out(3L)._2 == 0, s"unrelated doc must audit clean: $out")
    // both carriers see the SAME number of duplicated windows — the
    // anchors inside X are selected identically regardless of offset
    assert(out(1L)._2 == out(2L)._2,
      s"content-defined selection must pick identical windows in X: $out")
    out.foreach { case (_, (nw, nd, pct)) => assert(pct == 100 * nd / nw) }
  }

  test("substring_dedup registry corpus: planted partial re-crawls audit dirty, dup_pct sane") {
    val out = operators.NearDup.substringDedup(spark, sf).cache()
    // every emitted row's accounting is internally consistent
    assert(out.filter(col("n_dup") > col("n_win")).count() == 0)
    assert(out.filter(col("dup_pct") =!= expr("(100 * n_dup) div n_win")).count() == 0)
    // twins share their first 3/5 with the original: most twins that
    // carry windows at all should see duplication, and their originals
    // must see it symmetrically
    val twins = out.filter(col("doc_id") >= 1000000L)
    val dirtyTwins = twins.filter(col("n_dup") > 0).count()
    assert(dirtyTwins > 0, "no planted partial re-crawl detected at all")
    val origsDirty = out.filter(col("doc_id") < 1000000L && col("n_dup") > 0).count()
    assert(origsDirty >= dirtyTwins,
      "each dirty twin's shared windows must also flag its original")
    out.unpersist()
    spark.catalog.clearCache()
  }

  test("substring_dedup_strip: untouched docs byte-identical, shared span excised identically, idempotent") {
    val docs = Seq(
      (1L, block(1, 123) + X + block(2, 40)),
      (2L, block(3, 38) + X + block(4, 90)),
      (3L, block(5, 400))).toDF("doc_id", "norm")
    val out = operators.NearDup.substringStripOf(docs, k = 64, anchorMod = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned")))).toMap
    val (p1, s1) = (block(1, 123), block(2, 40))
    val (p2, s2) = (block(3, 38), block(4, 90))
    // a doc holding no shared window passes through byte-identical
    assert(out(3L) == ((0L, 0L, block(5, 400))),
      s"untouched doc must be byte-identical: ${out(3L)}")
    // both holders excise the SAME anchored interval of X (shared
    // windows lie fully inside X, so prefix/suffix survive whole)
    val (n1, r1, c1) = out(1L)
    val (n2, r2, c2) = out(2L)
    assert(r1 > 0 && r1 == r2 && n1 == n2,
      s"identical spans must be excised from both holders: $out")
    assert(c1.startsWith(p1) && c1.endsWith(s1))
    assert(c1.length == (p1 + X + s1).length - r1,
      "cleaned length must reconcile with n_removed")
    val xLeft = c1.substring(p1.length, c1.length - s1.length)
    assert(c2 == p2 + xLeft + s2,
      "both holders must keep the identical X remainder")
    // idempotence: stripping the stripped corpus removes nothing (the
    // X remainder fragments are shorter than one window)
    val again = operators.NearDup.substringStripOf(
      Seq((1L, c1), (2L, c2), (3L, out(3L)._3)).toDF("doc_id", "norm"),
      k = 64, anchorMod = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("cleaned")))).toMap
    assert(again.values.forall(_._1 == 0L), s"strip must be idempotent: $again")
    assert(again(1L)._2 == c1 && again(2L)._2 == c2)
  }

  test("selfrep_strip: repeat-free docs byte-identical; the later self-repeat excised, first survives; idempotent") {
    // `block` is PERIODIC (period 13) — fine for cross-doc span tests,
    // but a within-doc detector correctly strikes it; the self-repeat
    // spec needs aperiodic filler
    def rblock(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val rep = rblock(7, 100) // the within-doc repeated boilerplate
    val pre = rblock(8, 80)
    val mid = rblock(9, 44)
    val tail = rblock(10, 60)
    val clean = rblock(11, 300) // no repeats
    val docs = Seq(
      (1L, pre + rep + mid + rep + tail),
      (2L, clean)).toDF("doc_id", "norm")
    val out = operators.NearDup.selfrepStripOf(docs, k = 32, anchorMod = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_removed"),
          r.getAs[String]("cleaned")))).toMap
    // repeat-free doc passes through byte-identical
    assert(out(2L) == ((0L, 0L, clean)))
    val (n1, rm1, c1) = out(1L)
    assert(n1 >= 1 && rm1 >= 32, s"the planted self-repeat must strike: ${out(1L)}")
    // length reconciles exactly and the FIRST occurrence survives
    assert(c1.length == (pre + rep + mid + rep + tail).length - rm1)
    assert(c1.startsWith(pre + rep + mid.take(1)),
      "the first occurrence (and everything before the second) must survive")
    // excision only reaches inside the second occurrence: the strike
    // set is later-occurrence windows, whose positions all sit in it
    assert(c1.endsWith(tail))
    // a second pass finds nothing left to strike
    val again = operators.NearDup.selfrepStripOf(
      Seq((1L, c1), (2L, out(2L)._3)).toDF("doc_id", "norm"), k = 32, anchorMod = 4)
      .collect().map(r => (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned"), r.getAs[Long]("doc_id")))
    assert(again.forall(_._1 == 0L) &&
      again.find(_._3 == 1L).get._2 == c1, "the strip must be idempotent")
  }

  test("selfrep_strip registry corpus: exactly the planted fifth strikes; others byte-identical") {
    val out = operators.NearDup.selfrepStrip(spark, sf).localCheckpoint()
    val struck = out.filter(col("n_spans") > 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(struck.nonEmpty && struck.forall(_ % 5 == 0),
      s"only the planted self-repeat docs may strike: ${struck.take(5)}")
    // non-planted docs reassemble byte-identically to their norm
    val norms = operators.NearDup.selfrepCorpus(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = out.collect()
    assert(rows.filter(_.getAs[Long]("n_spans") == 0L).forall(r =>
      r.getAs[String]("cleaned") == norms(r.getAs[Long]("doc_id"))))
    spark.catalog.clearCache()
  }

  test("substring_dedup_strip registry corpus: stripped set == audit dirty set; lengths reconcile") {
    val strip = operators.NearDup.substringStrip(spark, sf).cache()
    val audit = operators.NearDup.substringDedup(spark, sf)
    // same window definition, same corpus: a doc is stripped iff the
    // C24 audit flags duplication on it
    val dirtyAudit = audit.filter(col("n_dup") > 0).select("doc_id")
    val dirtyStrip = strip.filter(col("n_removed") > 0).select("doc_id")
    assert(dirtyAudit.exceptAll(dirtyStrip).count() == 0 &&
      dirtyStrip.exceptAll(dirtyAudit).count() == 0,
      "strip and audit must agree on which docs carry shared windows")
    // every doc's cleaned length reconciles against its norm
    val bad = strip
      .join(operators.NearDup.substringCorpus(spark, sf), Seq("doc_id"))
      .filter(length(col("cleaned")) =!= length(col("norm")) - col("n_removed"))
      .count()
    assert(bad == 0, s"$bad docs fail length(cleaned) = length(norm) - n_removed")
    strip.unpersist()
    spark.catalog.clearCache()
  }
}
