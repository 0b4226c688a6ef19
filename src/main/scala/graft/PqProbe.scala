package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop recall probe for C7g `ann_ivf_pq` parameter tuning —
  * `runMain graft.PqProbe`. Not part of the registry. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val exact = operators.Similarity.annBruteforce(spark, sf, k = 5, nQueries = 50)
        .select(col("query_id"), col("neighbor_id")).cache()
      val total = exact.count()
      def recallOf(df: org.apache.spark.sql.DataFrame): Double =
        exact.join(df.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / total
      for ((m, kpq, sl) <- Seq((16, 32, 64), (16, 16, 64), (8, 32, 64), (16, 32, 128))) {
        val t0 = System.nanoTime()
        val r = recallOf(operators.Similarity.annIvfPq(spark, sf, m = m, kpq = kpq, shortlist = sl))
        println(f"PQPROBE sf=$sf m=$m kpq=$kpq shortlist=$sl recall@5=$r%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      exact.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
