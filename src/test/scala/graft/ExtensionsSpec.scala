package graft

import graft.plans.FuseVectorKernels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fusion rule rewrites the declarative HOF dot product into the
  * codegen kernel without changing results. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  private val hofDot =
    "aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"

  test("FuseVectorKernels: HOF dot product plans as dot_product_float, same values") {
    // TestSpark loads GraftExtensions (production parity), so the rule
    // is active session-wide: the declarative form must plan AS the
    // kernel, and its values must equal a driver-side reference fold.
    val df = Tables.embeddings(spark, sf)
      .select(col("embedding").as("va"), col("embedding").as("vb"))
    val q = df.select(expr(hofDot).as("dot"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product_float"), s"rule did not fire:\n$plan")
    val vals = q.collect().map(_.getDouble(0))
    val ref = df.collect().map { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(vals.sameElements(ref))
    // guard case: a FLOAT-typed product (rounds each term) must NOT fuse
    // into the double-accumulating kernel
    val floatForm =
      "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + cast(v as double))"
    val unfused = df.select(expr(floatForm).as("dot"))
    assert(!unfused.queryExecution.optimizedPlan.toString.contains("dot_product_float"))
  }

  test("byte_at SQL function is session-registered and reads payload bytes") {
    val r = spark.sql(
      "SELECT byte_at(cast('AB' as binary), 0) AS b0, byte_at(cast('AB' as binary), 5) AS oob")
      .head()
    assert(r.getInt(0) == 'A'.toInt && r.isNullAt(1))
  }

  test("StatsPruneRule: a plain filtered read of a registered lake is auto-pruned, same rows") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // the GovernSpec physical-pruning test drives prunedScan EXPLICITLY
    // (the reader names survivor file_ids); this one proves the
    // Catalyst rule injects the same decision for a reader who never
    // mentions file_id at all
    val rowsPerFile = 256
    val lake = java.nio.file.Files.createTempDirectory("graft_rulelake").toFile
    lake.deleteOnExit()
    operators.Govern.zorderWrite(spark, sf, lake.getAbsolutePath, rowsPerFile)
    val r = spark.read.parquet(lake.getAbsolutePath)
      .agg(min("l_partkey"), max("l_partkey")).first()
    val pHi = r.getLong(0) + (r.getLong(1) - r.getLong(0)) / 8
    def readBox(): DataFrame = spark.read.parquet(lake.getAbsolutePath)
      .filter(col("l_partkey") >= r.getLong(0) && col("l_partkey") <= pHi)
    // before registration: the rule is a no-op, every file is opened
    val before = readBox()
    val (rowsBefore, filesBefore) = (before.count(), filesOpened(before))
    try {
      operators.Govern.registerLakeStats(spark, lake.getAbsolutePath,
        Seq("l_partkey", "l_suppkey"))
      val after = readBox()
      assert(after.count() == rowsBefore &&
        readBox().exceptAll(before).count() == 0,
        "rule-pruned read must return the identical row multiset")
      val filesAfter = filesOpened(after)
      assert(filesAfter * 2 <= filesBefore,
        s"rule must skip at least half the files ($filesAfter of $filesBefore)")
      // soundness guard: a predicate the rule can't parse prunes nothing
      val opaque = spark.read.parquet(lake.getAbsolutePath)
        .filter((col("l_partkey") + col("l_suppkey")) % 2 === 0)
      assert(filesOpened(opaque) == filesBefore,
        "unparseable predicates must not prune")
      // and an explicit file_id predicate is left alone (prunedScan path)
      val explicit = spark.read.parquet(lake.getAbsolutePath)
        .filter(col("file_id") === 0)
      assert(filesOpened(explicit) == 1L)
      // IN-lists prune on their value envelope: three nearby keys from
      // the box corner reach only the files whose bbox overlaps them
      val inRead = spark.read.parquet(lake.getAbsolutePath)
        .filter(col("l_partkey").isin(r.getLong(0), r.getLong(0) + 1, r.getLong(0) + 2))
      val inFull = inRead.count()
      val inFiles = filesOpened(inRead)
      assert(inFiles * 2 <= filesBefore,
        s"IN-list envelope must prune ($inFiles of $filesBefore)")
      graft.plans.StatsPruneRegistry.unregister(lake.getAbsolutePath)
      val inNoReg = spark.read.parquet(lake.getAbsolutePath)
        .filter(col("l_partkey").isin(r.getLong(0), r.getLong(0) + 1, r.getLong(0) + 2))
      assert(inNoReg.count() == inFull, "IN pruning must preserve rows")
    } finally graft.plans.StatsPruneRegistry.unregister(lake.getAbsolutePath)
    spark.catalog.clearCache()
  }

  test("StatsPruneRule: string bounds, OR-of-boxes, and unknown-file safety") {
    import org.apache.spark.sql.{DataFrame, SaveMode}
    // a 10-file lake whose string column `cat` is constant per file
    // (catNN) and whose long column `id` ranges [100*f, 100*f+99] —
    // the categorical-lake shape (per-category directories) whose
    // dominant predicates are string equality and disjunctions
    val lake = java.nio.file.Files.createTempDirectory("graft_strlake").toFile
    lake.deleteOnExit()
    val df = spark.range(0, 1000).selectExpr(
      "id", "cast(id div 100 as int) as file_id",
      "concat('cat', lpad(cast(id div 100 as string), 2, '0')) as cat")
    df.repartition(col("file_id"))
      .write.partitionBy("file_id").mode(SaveMode.Overwrite)
      .parquet(lake.getAbsolutePath)
    def read(): DataFrame = spark.read.parquet(lake.getAbsolutePath)
    try {
      operators.Govern.registerLakeStats(spark, lake.getAbsolutePath, Seq("cat", "id"))
      // string equality: one file
      val eq = read().filter(col("cat") === "cat03")
      assert(eq.count() == 100 && filesOpened(eq) == 1,
        s"string-equality must prune to 1 file (opened ${filesOpened(eq)})")
      // string range: cat05..cat07 inclusive = 3 files
      val rng = read().filter(col("cat") >= "cat05" && col("cat") <= "cat07")
      assert(rng.count() == 300 && filesOpened(rng) == 3)
      // OR-of-boxes ACROSS columns: two disjuncts, disjoint file sets
      val or = read().filter(col("cat") === "cat03" || col("id") >= 850)
      assert(or.count() == 100 + 150 && filesOpened(or) == 3,
        s"disjunction must prune on the union of the boxes (opened ${filesOpened(or)})")
      // string IN-list prunes as exact point boxes (not an envelope:
      // cat01..cat08 envelope would be 8 files, points are 2)
      val in = read().filter(col("cat").isin("cat01", "cat08"))
      assert(in.count() == 200 && filesOpened(in) == 2,
        s"IN must prune per point box (opened ${filesOpened(in)})")
      // an unparseable DISJUNCT poisons its disjunction: nothing prunes
      val poisoned = read().filter(col("cat") === "cat03" || length(col("cat")) === 99)
      assert(filesOpened(poisoned) == 10, "unparseable disjunct must stop pruning")
      // ...but an unparseable CONJUNCT only widens: the parseable
      // conjunct still prunes to its own file
      val conj = read().filter(col("cat") === "cat03" && length(col("cat")) === 5)
      assert(filesOpened(conj) == 1, "unparseable conjunct must not stop pruning")
      // UNKNOWN-FILE SAFETY (exclusion injection): append a file the
      // registry has never seen; its matching rows must survive a
      // pruned read even though no stats cover it
      spark.range(0, 10).selectExpr(
          "id + 5000 as id", "cast(99 as int) as file_id", "'cat03' as cat")
        .repartition(col("file_id"))
        .write.partitionBy("file_id").mode(SaveMode.Append)
        .parquet(lake.getAbsolutePath)
      val afterAppend = read().filter(col("cat") === "cat03")
      assert(afterAppend.count() == 110,
        "rows in a file appended after registration must never be pruned")
      val appendOpened = filesOpened(read().filter(col("cat") === "cat03"))
      assert(appendOpened == 2,
        s"stale registration still prunes the 9 known disjoint files (opened $appendOpened)")
    } finally graft.plans.StatsPruneRegistry.unregister(lake.getAbsolutePath)
    spark.catalog.clearCache()
  }

  test("kernel agrees with a driver-side fold on real embeddings") {
    // NOTE: with GraftExtensions active session-wide, the HOF form
    // would itself plan as the kernel — comparing the two would be
    // kernel-vs-kernel (vacuous). The independent reference must live
    // outside the optimizer: a driver-side sequential fold.
    val e = Tables.fanout(Tables.embeddings(spark, sf)).limit(50)
      .select(col("embedding").as("va"), col("embedding").as("vb"))
    val kernel = e.select(
      graft.functions.VectorExpressions.dotF(col("va"), col("vb")).as("d"),
      col("va"))
      .collect()
    kernel.foreach { r =>
      val a = r.getSeq[Float](1)
      val ref = a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
      assert(r.getDouble(0) == ref, "kernel diverges from sequential driver fold")
    }
  }
}
