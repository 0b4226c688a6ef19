package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage audit of the CURRENT ngram-Jaccard inverted
  * index pipeline (postings → df-cap → pair counting) to attribute
  * wall time between the shingle build, the cap pass, and the pair
  * join. Not part of the library surface.
  */
object NgramAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[audit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    (1 to 2).foreach { rep =>
      println(s"[audit] === rep $rep ===")
      val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
      val corpus = Tables.fanout(docs.unionAll(
        docs.select(($"doc_id" + 1000000L).as("doc_id"), $"text")))

      val postings = timed("postings checkpoint")(corpus
        .withColumn("toks", split(trim($"text"), "\\s+"))
        .filter(size($"toks") >= 3)
        .select($"doc_id", explode(expr(
          """array_distinct(transform(sequence(0, size(toks)-3),
            |  i -> xxhash64(toks[i], toks[i+1], toks[i+2])))""".stripMargin)).as("sh"))
        .localCheckpoint())

      val hot = postings.groupBy($"sh")
        .agg(count(lit(1)).as("df"))
        .filter($"df" > 100)
        .select($"sh")
      val capped = postings.join(broadcast(hot), Seq("sh"), "left_anti")
      timed("hot-list + anti-join")(capped.count())

      val sizes = capped.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val pairs = capped.select($"doc_id".as("id1"), $"sh")
        .join(capped.select($"doc_id".as("id2"), $"sh"), Seq("sh"))
        .filter($"id1" < $"id2")
        .groupBy($"id1", $"id2")
        .agg(count(lit(1)).as("n_inter"))
        .join(sizes.select($"doc_id".as("id1"), $"n_sh".as("n1")), Seq("id1"))
        .join(sizes.select($"doc_id".as("id2"), $"n_sh".as("n2")), Seq("id2"))
        .withColumn("jaccard",
          $"n_inter".cast("double") / ($"n1" + $"n2" - $"n_inter").cast("double"))
        .filter($"jaccard" >= 0.5)
      timed("pair join + agg + verify")(pairs.count())
      // nothing is cache-manager cached here; the GC releases the
      // localCheckpoint blocks via the ContextCleaner between reps
      System.gc()
    }
    spark.stop()
  }
}
