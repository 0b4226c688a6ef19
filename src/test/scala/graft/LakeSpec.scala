package graft

import graft.sources.Lake
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** File-source round trips: gzip jsonl with corrupt-record quarantine,
  * and the partitioned parquet sink with planner-visible pruning. */
class LakeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("jsonl.gz round trip: typed rows survive, schema enforced") {
    val dir = tmp("jsonl")
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    Lake.writeJsonlGz(docs, dir)
    // compressed files actually written
    val files = new java.io.File(dir).listFiles.map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = Lake.readJsonl(spark, dir, schema)
    val (clean, bad) = Lake.quarantine(back)
    assert(bad.count() == 0)
    assert(clean.count() == docs.count())
    assert(clean.exceptAll(docs).count() == 0)
  }

  test("corrupt jsonl lines are quarantined, not fatal; clean rows still typed") {
    val dir = tmp("corrupt")
    Files.write(Paths.get(dir, "batch_0.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "lang": "en", "n_chars": 10}""",
        """{"doc_id": BROKEN""",
        """{"doc_id": 2, "lang": "fr", "n_chars": 20}""",
        """not json at all"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val (clean, bad) = Lake.quarantine(Lake.readJsonl(spark, dir, schema))
    assert(clean.count() == 2)
    assert(bad.count() == 2)
    assert(clean.agg(sum("n_chars")).head().getLong(0) == 30)
  }

  test("partitioned sink: partition filters prune at plan time") {
    val dir = tmp("part")
    val orders = Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
    Lake.writePartitioned(orders, dir, Seq("o_year"))
    val pruned = Lake.readPartitioned(spark, dir).filter(col("o_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"))
    // pruned read matches predicate applied to the original
    assert(pruned.count() == orders.filter(col("o_year") === 1996).count())
    // only the matching partition directory is listed in the scan
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_year=")))
  }

  test("orc sink: round trip exact, partition pruning + data-predicate pushdown visible") {
    val dir = tmp("orc")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    Lake.writeOrc(docs, dir, Seq("lang"))
    val files = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(files.exists(_.startsWith("lang=")), "hive partition dirs expected")
    val back = Lake.readOrc(spark, dir)
    // exact round trip (modulo column order; lang comes back as a
    // partition column)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "lang", "source", "n_chars")
      .exceptAll(docs).count() == 0)
    // partition filter prunes at plan time; data filter pushes into ORC
    val pruned = back.filter(col("lang") === "en" && col("n_chars") > 100)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition pruning missing:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("n_chars"),
      s"ORC predicate pushdown missing:\n$plan")
    assert(pruned.count() ==
      docs.filter(col("lang") === "en" && col("n_chars") > 100).count())
  }

  test("schema evolution across ingest batches: mergeSchema unions columns, old rows null-fill") {
    val s = spark
    import s.implicits._
    val dir = tmp("evolve")
    // batch 1 lands with the v1 schema, batch 2 adds a column — the
    // routine crawl-pipeline reality (new extractor fields appear)
    Tables.documents(spark, sf).select($"doc_id", $"lang").limit(100)
      .write.parquet(s"$dir/batch=1")
    Tables.documents(spark, sf).select($"doc_id", $"lang", $"n_chars").limit(100)
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "batch"))
    assert(merged.count() == 200)
    // v1 rows surface the new column as null; v2 rows keep their values
    assert(merged.filter($"batch" === 1 && $"n_chars".isNotNull).count() == 0)
    assert(merged.filter($"batch" === 2 && $"n_chars".isNull).count() == 0)
  }

  test("writer lock: exclusive while held, named loser, released on every exit, stale lease broken") {
    import graft.sources.Lake
    val idx = java.nio.file.Files.createTempDirectory("graft_lock").toString
    // exclusion: a second writer inside the first's lease loses, and
    // the error names the holder
    val err = intercept[Lake.ConcurrentMaintenanceException] {
      Lake.withWriterLock(spark, idx, owner = "writer-a") {
        Lake.withWriterLock(spark, idx, owner = "writer-b")(fail("must not enter"))
      }
    }
    assert(err.getMessage.contains("writer-a"), s"loser must learn the holder: $err")
    // release on normal exit: the next writer takes the lease freely
    Lake.withWriterLock(spark, idx, owner = "writer-c")(())
    // release on THROWING exit too
    intercept[RuntimeException] {
      Lake.withWriterLock(spark, idx, owner = "writer-d")(sys.error("body blew up"))
    }
    Lake.withWriterLock(spark, idx, owner = "writer-e")(())
    // a crashed writer's stale lease (older than leaseMs) is broken
    // and taken over rather than wedging the index forever
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(s"$idx/_maintenance_lock")
    val out = fs.create(lock, false); out.write("dead-writer".getBytes); out.close()
    var entered = false
    Lake.withWriterLock(spark, idx, owner = "writer-f", leaseMs = 0L) { entered = true }
    assert(entered, "a stale lease must be broken and taken over")
    assert(!fs.exists(lock), "the takeover's own lease must release on exit")
    // and the REWRITING maintenance ops refuse to run under a foreign
    // live lease (the multi-writer hazard they exist to close)
    val out2 = fs.create(lock, false); out2.write("live-writer".getBytes); out2.close()
    intercept[Lake.ConcurrentMaintenanceException] {
      operators.TextAnalysis.bm25Vacuum(spark, idx)
    }
    intercept[Lake.ConcurrentMaintenanceException] {
      operators.Similarity.ivfCompact(spark, idx)
    }
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
  }

  test("snapshot retention: a live read pin blocks physical reclaim; release or expiry unblocks") {
    import graft.sources.Lake
    val s = spark
    import s.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft_pin").toString
    // a raw bm25 index with tombstoned rows a vacuum would reclaim
    val docs = (0 until 20).map(i =>
      (i.toLong, s"alpha$i beta${i % 3} gamma${i % 5} delta$i")).toDF("doc_id", "text")
    operators.TextAnalysis.bm25WriteRaw(docs, idx)
    // a long probe session resolves its snapshot and pins it, THEN a
    // concurrent curation pass deletes docs the snapshot still sees
    val snap = operators.TextAnalysis.bm25Snapshot(s, idx)
    val pin = Lake.pinSnapshot(s, idx, owner = "probe-1")
    operators.TextAnalysis.bm25Delete(s, idx,
      docs.filter($"doc_id" % 2 === 0).select($"doc_id"))
    val rowsBefore = s.read.parquet(s"$idx/postings").count()
    val err = intercept[Lake.PinnedSnapshotException] {
      operators.TextAnalysis.bm25Vacuum(s, idx)
    }
    assert(err.getMessage.contains("probe-1"),
      s"the refusal must name the live pin owner: $err")
    assert(s.read.parquet(s"$idx/postings").count() == rowsBefore,
      "a refused vacuum must reclaim nothing")
    // ... and the refusal must not leak the writer lease
    Lake.withWriterLock(s, idx, owner = "after-refusal")(())
    // the pinned serve still reads its complete snapshot
    val pinned = operators.TextAnalysis.bm25ServeRaw(s, idx, qMod = 1,
      snapshot = Some(snap))
    assert(pinned.filter($"doc_id" % 2 === 0).count() > 0,
      "the pinned snapshot must still see rows a vacuum would drop")
    // release → vacuum reclaims; pins are idempotent to double-release
    Lake.releasePin(s, idx, pin)
    Lake.releasePin(s, idx, pin)
    operators.TextAnalysis.bm25Vacuum(s, idx)
    assert(s.read.parquet(s"$idx/postings").count() < rowsBefore,
      "vacuum must reclaim once the pin is released")
    // a crashed reader's pin expires by its own TTL instead of
    // blocking maintenance forever
    Lake.pinSnapshot(s, idx, owner = "crashed-probe", ttlMs = 0L)
    Thread.sleep(5)
    operators.TextAnalysis.bm25Vacuum(s, idx) // must not throw
    assert(Lake.livePins(s, idx).isEmpty, "expired pins must be cleaned up")
    // the ivf reclaim steps honor the same gate
    val pin2 = Lake.pinSnapshot(s, idx, owner = "probe-2")
    intercept[Lake.PinnedSnapshotException] {
      operators.Similarity.ivfCompact(s, idx)
    }
    intercept[Lake.PinnedSnapshotException] {
      operators.Similarity.ivfRetrain(s, idx)
    }
    Lake.releasePin(s, idx, pin2)
    val fs2 = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs2.delete(new org.apache.hadoop.fs.Path(idx), true)
    spark.catalog.clearCache()
  }
}
