package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` key is an operator from the checklist; `oracleSql`
  * holds the DuckDB-equivalent SQL for the hash-compare gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (Analytics.q1Pricing _)
  )

  /** DuckDB-equivalent SQL per query (column names/aliases must match
    * the Spark result exactly — the driver sorts columns by name and
    * hash-compares values). */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> Analytics.q1PricingSql
  )
}
