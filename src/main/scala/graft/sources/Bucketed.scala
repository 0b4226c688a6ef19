package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY.md §5 "bucketing for co-located
  * joins").
  *
  * Writing both sides of a recurring fact-fact join bucketed by the
  * join key (same bucket count) lets every subsequent join run
  * shuffle-free: each task reads bucket i of both tables and joins
  * locally. At 100 TB this converts the single biggest recurring
  * shuffle (lineitem ⋈ orders on the order key) into a scan-local
  * join — the lakehouse equivalent of co-partitioned storage.
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * the join can also skip its local sort). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket specs Spark plans a SortMergeJoin whose children are bare
    * bucketed scans — no Exchange on either side (assert it in specs /
    * plan audits rather than trusting it). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
