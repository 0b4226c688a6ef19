package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact + incremental deduplication (SURVEY.md §2 A2, A3).
  *
  * Reference behavior: the collector skips records whose `entry_id` is
  * already in the in-flight batch or in a lookback-window seen-set
  * loaded from the DB (arxiv_collector.py:118-130, 232-236).
  */
object Dedup {

  /** A2 `exact_dedup_key` — first-writer-wins dedup on a composite key.
    * Keeps the earliest record (min event_id) per (user_id, event_type).
    *
    * Scale: a single hash-partitioned aggregation — no global sort, no
    * window. `min_by` carries the payload of the winning row through
    * the partial/final aggregate, so the shuffle moves one row per key
    * per map partition, not the raw data. This is the 100 TB-safe form
    * of "SELECT DISTINCT ON".
    */
  def exactDedupKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id", $"event_type")
      .agg(
        min($"event_id").as("first_event_id"),
        min_by($"value", $"event_id").as("first_value"),
        count(lit(1)).as("n_dups"))
  }

  val exactDedupKeySql: String =
    """SELECT user_id, event_type,
      |       MIN(event_id) AS first_event_id,
      |       arg_min("value", event_id) AS first_value,
      |       COUNT(*) AS n_dups
      |FROM events GROUP BY user_id, event_type""".stripMargin

  /** A3 `incremental_dedup` — anti-join of a re-ingested batch against
    * the lookback seen-set. Models the reference's overlapping
    * reprocessing windows: `seen` = ids ingested during [seenLo, seenHi),
    * `incoming` = the batch covering [incLo, incHi); only records not in
    * the seen-set survive.
    *
    * Scale: LEFT ANTI join shuffles both sides on the id — with the
    * seen-set filtered to the lookback window first (pushed to the
    * scan), its size is bounded regardless of total history size, which
    * is exactly why the reference uses a lookback. If the seen-set fits
    * in memory it broadcasts (Catalyst/AQE decides from stats).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val seen = ev
      .filter($"ts" >= lit("2024-01-10 00:00:00").cast("timestamp") &&
              $"ts" <  lit("2024-01-20 00:00:00").cast("timestamp"))
      .select($"event_id")
    val incoming = ev
      .filter($"ts" >= lit("2024-01-15 00:00:00").cast("timestamp") &&
              $"ts" <  lit("2024-01-25 00:00:00").cast("timestamp"))
    incoming.join(seen, Seq("event_id"), "left_anti")
      .select($"event_id", $"user_id", $"event_type", $"value")
  }

  val incrementalDedupSql: String =
    """SELECT event_id, user_id, event_type, "value"
      |FROM events i
      |WHERE i.ts >= TIMESTAMP '2024-01-15 00:00:00' AND i.ts < TIMESTAMP '2024-01-25 00:00:00'
      |  AND NOT EXISTS (
      |    SELECT 1 FROM events s
      |    WHERE s.ts >= TIMESTAMP '2024-01-10 00:00:00' AND s.ts < TIMESTAMP '2024-01-20 00:00:00'
      |      AND s.event_id = i.event_id)""".stripMargin
}
