package graft.operators

import graft.Tables
import graft.plans.{AsOfJoin, AsOfStrategy}
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.functions._

/** AS-OF join operator surface (SURVEY.md §2 B12). See
  * [[graft.plans.AsOfJoin]] for the custom logical/physical operator.
  */
object AsOf {

  /** Join each left row to the latest right row with the same key and
    * `right.ts <= left.ts` (inner). Key and ts columns must be
    * Long-valued (internal timestamp micros are Long), and the right
    * side must be UNIQUE per (key, ts) — with duplicates the winner
    * would depend on shuffle order (pre-aggregate the right side, as
    * [[asofStateJoin]] does). Registers the planner strategy on the
    * session if missing so the operator works without
    * `spark.sql.extensions` wiring. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, leftTs: String,
               rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    GraftShim.ofRows(spark,
      AsOfJoin(l, r, attr(l, leftKey), attr(r, rightKey), attr(l, leftTs), attr(r, rightTs)))
  }

  /** B12 `asof_join` — enrich every event with the user's state as of
    * the event time: the state stream is the user's `signup` events
    * (value = state), and each event picks up the latest state at or
    * before its timestamp. DuckDB's native ASOF JOIN is the oracle. */
  def asofStateJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"ts")
    // one state row per (user, ts): ties would otherwise resolve by
    // shuffle order on both engines (max keeps it deterministic)
    val state = Tables.events(spark, dir)
      .filter($"event_type" === "signup")
      .groupBy($"user_id".as("r_user_id"), $"ts".as("r_ts"))
      .agg(max($"value").as("state_value"))
    asofJoin(ev, state, "user_id", "ts", "r_user_id", "r_ts")
      .select($"event_id", $"user_id", $"ts",
        $"r_ts".as("state_ts"), $"state_value")
  }

  val asofStateJoinSql: String =
    """SELECT e.event_id, e.user_id, e.ts, s.ts AS state_ts, s.state_value
      |FROM events e
      |ASOF JOIN (SELECT user_id, ts, MAX("value") AS state_value
      |           FROM events WHERE event_type = 'signup' GROUP BY 1, 2) s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts""".stripMargin
}
