package graft.operators

import graft.Tables
import graft.functions.NumericAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Status-machine / progress / run-stats operators (SURVEY.md §2 A9-A12).
  *
  * Reference behavior: the ETL claims the N oldest pending batches
  * (FOR UPDATE SKIP LOCKED, arxiv_etl.py:42-58), tracks
  * pending→processing→finished|failed transitions with timestamps
  * (arxiv_etl.py:113-126), per-category progress
  * (arxiv_collector.py:77-104) and per-category run statistics
  * (arxiv_collector.py:106-117).
  */
object Status {

  /** A9 `status_claim` — deterministically claim the N oldest pending
    * work items (event_type = 'error' stands in for 'pending').
    *
    * Scale: ORDER BY + LIMIT plans as TakeOrderedAndProject — each
    * partition keeps its local top-N, the driver merges N×partitions
    * rows; no global sort materializes. This is the distributed
    * analogue of SKIP LOCKED claiming.
    */
  def statusClaim(spark: SparkSession, dir: String, n: Int = 100): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_type" === "error")
      .orderBy($"ts", $"event_id")
      .limit(n)
      .select($"event_id", $"user_id", $"ts",
        lit("processing").as("claim_status"))
  }

  def statusClaimSql(n: Int = 100): String =
    s"""SELECT event_id, user_id, ts, 'processing' AS claim_status
       |FROM events WHERE event_type = 'error'
       |ORDER BY ts, event_id LIMIT $n""".stripMargin

  /** A10 `status_rollup` — per-status monitoring rollup: counts, value
    * totals, first/last timestamps, distinct workers. One partial-agg
    * shuffle on a tiny key space. */
  def statusRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        dsum($"value").as("sum_value"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        countDistinct($"user_id").as("n_users"))
  }

  val statusRollupSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |       MIN(ts) AS first_ts, MAX(ts) AS last_ts,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  /** A11 `run_stats` — per-category run statistics (the reference's
    * `category_run_stats`: counts + volume per category). */
  def runStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        (sum($"n_chars").cast("double") / count(lit(1))).as("avg_chars"))
  }

  val runStatsSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY source""".stripMargin

  /** A12 `progress_report` — per-category progress split (the
    * reference's `category_progress` finished/pending view), done =
    * docs above a size threshold standing in for 'Finished'. */
  def progressReport(spark: SparkSession, dir: String, threshold: Int = 400): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("total"),
        sum(when($"n_chars" > threshold, 1L).otherwise(0L)).as("finished"))
      .withColumn("pending", $"total" - $"finished")
      .withColumn("pct_done", $"finished".cast("double") / $"total".cast("double"))
  }

  def progressReportSql(threshold: Int = 400): String =
    s"""SELECT source, COUNT(*) AS total,
       |       CAST(COUNT(*) FILTER (WHERE n_chars > $threshold) AS BIGINT) AS finished,
       |       CAST(COUNT(*) - COUNT(*) FILTER (WHERE n_chars > $threshold) AS BIGINT) AS pending,
       |       CAST(COUNT(*) FILTER (WHERE n_chars > $threshold) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pct_done
       |FROM documents GROUP BY source""".stripMargin
}
