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

  /** `null_skew_join` — the null-hot-key join pattern: in a shuffled
    * LEFT join, every null-keyed row hashes to ONE reducer, so a fact
    * table where a third of the keys are null (unresolved users,
    * unparseable ids — routine crawl reality) funnels a third of
    * 100 TB through a single task. Null keys can never match, so the
    * fix is structural, not statistical: split the nulls off BEFORE
    * the shuffle, join only the non-null rows, and union the null rows
    * back with null-filled dimension columns. Result is row-identical
    * to the plain LEFT join — which is how it is gated (plain LEFT
    * JOIN oracle over the same nullified key).
    *
    * (AQE's skew-join split handles oversized partitions generically,
    * but it still shuffles the null rows and rewrites them into
    * several tasks; the structural split never shuffles them at all —
    * they stay a scan-local branch of the union.) */
  def nullSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // plant the null skew deterministically: every 3rd event loses its
    // user id (same expression in the oracle)
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"event_type",
        when($"user_id" % 3 === 0, lit(null)).otherwise($"user_id").as("uid"))
    val dim = Tables.customer(spark, dir)
      .select($"c_custkey".as("uid"), $"c_mktsegment".as("segment"),
        $"c_nationkey".as("nation_key"))
    val matched = ev.filter($"uid".isNotNull).join(dim, Seq("uid"), "left")
    val nulls = ev.filter($"uid".isNull)
      .withColumn("segment", lit(null).cast("string"))
      // take the null branch's type FROM the dim schema — a hardcoded
      // cast silently widens the union (and the emitted type) when the
      // generator changes the key's physical type, as it did in r9
      // (c_nationkey int64 → int32)
      .withColumn("nation_key", lit(null).cast(dim.schema("nation_key").dataType))
    matched.unionByName(nulls)
      .select($"event_id", $"event_type", $"uid", $"segment", $"nation_key")
  }

  val nullSkewJoinSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |         CASE WHEN user_id % 3 = 0 THEN NULL ELSE user_id END AS uid
      |  FROM events)
      |SELECT e.event_id, e.event_type, e.uid,
      |       c.c_mktsegment AS segment, c.c_nationkey AS nation_key
      |FROM ev e LEFT JOIN customer c ON e.uid = c.c_custkey""".stripMargin
}
