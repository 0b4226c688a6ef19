package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage audit of the ngram-Jaccard pipeline volumes
  * (postings, candidate pairs, hot shingles) to pin down bench
  * instability. Not part of the library surface.
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

    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val corpus = Tables.fanout(docs.unionAll(
      docs.select(($"doc_id" + 1000000L).as("doc_id"), $"text")))
    timed("corpus count")(corpus.count())

    val shingled = corpus
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .filter(size($"toks") >= 3)
      .withColumn("shingles", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
      .select($"doc_id", $"shingles")

    val hashed = shingled
      .select($"doc_id",
        expr("array_sort(transform(shingles, s -> xxhash64(s)))").as("sh_sorted"))
      .withColumn("n_sh", size($"sh_sorted"))
      .persist()
    timed("hashed docs")(hashed.count())
    timed("shingle stats")(
      hashed.agg(sum($"n_sh"), max($"n_sh"), avg($"n_sh")).collect().mkString)

    val threshold = 0.5
    val prefixes = hashed
      .select($"doc_id", explode(expr(
        s"slice(sh_sorted, 1, size(sh_sorted) - cast(ceil($threshold * size(sh_sorted)) as int) + 1)"))
        .as("sh")).persist()
    timed("prefix postings")(prefixes.count())
    timed("hot shingles (top df)")(
      prefixes.groupBy($"sh").count().orderBy(desc("count")).limit(10)
        .collect().map(_.getLong(1)).mkString(","))
    timed("candidate pairs (sum df^2)")(
      prefixes.groupBy($"sh").count().agg(sum($"count" * $"count")).collect().mkString)

    val cand = prefixes.select($"doc_id".as("id1"), $"sh")
      .join(prefixes.select($"doc_id".as("id2"), $"sh"), Seq("sh"))
      .filter($"id1" < $"id2")
      .select((shiftleft($"id1", 32) + $"id2").as("pair"))
      .distinct().persist()
    timed("distinct candidates")(cand.count())

    val verified = cand
      .select(shiftright($"pair", 32).as("id1"),
        ($"pair".bitwiseAND(lit(0xffffffffL))).as("id2"))
      .join(broadcast(hashed.select($"doc_id".as("id1"), $"sh_sorted".as("sa"), $"n_sh".as("n1"))), Seq("id1"))
      .join(broadcast(hashed.select($"doc_id".as("id2"), $"sh_sorted".as("sb"), $"n_sh".as("n2"))), Seq("id2"))
      .withColumn("n_inter", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("jaccard",
        $"n_inter".cast("double") / ($"n1" + $"n2" - $"n_inter").cast("double"))
      .filter($"jaccard" >= threshold)
    timed("verified pairs")(verified.count())
    spark.stop()
  }
}
