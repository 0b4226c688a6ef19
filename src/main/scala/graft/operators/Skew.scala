package graft.operators

import graft.Tables
import graft.functions.NumericAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation (SURVEY.md §5 "salting for skew").
  *
  * A plain `groupBy(key)` over a skewed key ships EVERY row of the hot
  * key to one reducer. The salted two-phase form splits each key into
  * `salts` sub-keys for the first (parallel) aggregation, then merges
  * the per-salt partials in a second, tiny aggregation — the hot key's
  * work spreads across `salts` reducers and the second shuffle carries
  * |keys| × salts rows regardless of input size.
  *
  * Every partial here composes exactly (counts sum, decimal sums sum,
  * min/max of min/max), so the result is bit-identical to the direct
  * aggregation — which is how it is gated (same oracle SQL as a plain
  * GROUP BY).
  */
object Skew {

  /** `skew_salted_agg` — per-event_type stats via salt → partial →
    * merge. The salt is derived from the row's id (deterministic, no
    * rand()) — any roughly uniform per-row value works. */
  def saltedAgg(spark: SparkSession, dir: String, salts: Int = 16): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("salt", pmod($"event_id", lit(salts)))
      .groupBy($"event_type", $"salt")
      .agg(
        count(lit(1)).as("pn"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("psum"),
        min($"value").as("pmin"),
        max($"value").as("pmax"))
      .groupBy($"event_type")
      .agg(
        sum($"pn").as("n_events"),
        sum($"psum").cast("double").as("sum_value"),
        min($"pmin").as("min_value"),
        max($"pmax").as("max_value"))
  }

  val saltedAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |       MIN("value") AS min_value, MAX("value") AS max_value
      |FROM events GROUP BY event_type""".stripMargin
}
