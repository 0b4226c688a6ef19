package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over `events` (SURVEY.md §2 B14):
  * resample an irregular event stream onto a fixed hourly grid with
  * forward fill — the feature-engineering step that turns event logs
  * into model-ready regular series.
  */
object TimeSeries {

  /** B14 `resample_fill` — per-user hourly grid between that user's
    * first and last event hour; each grid hour carries the last
    * observed value at or before it (forward fill), plus an
    * observed-this-hour flag.
    *
    * Shape: one partial-agg per (user, hour) picks the hour's last
    * event (max_by on (ts, event_id) — no sort), one tiny per-user
    * agg builds the grid bounds, `sequence`+`explode` generates grid
    * rows executor-side (never on the driver), and one window per
    * user does the fill. Scale: everything keys on user_id — grid
    * generation is ~rows×hours/user and distributes with the keys;
    * the fill window is bounded by a user's grid span. Skewed
    * power-users split naturally by bounding the grid span per
    * (user, day) if spans grow unbounded. */
  def resampleFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", date_trunc("hour", $"ts").as("hr"),
        $"ts", $"event_id", $"value")
    // last event per (user, hour): hash agg, ties by (ts, event_id)
    val hourly = ev.groupBy($"user_id", $"hr")
      .agg(max_by($"value", struct($"ts", $"event_id")).as("obs_value"))
    val grid = ev.groupBy($"user_id")
      .agg(min($"hr").as("mn"), max($"hr").as("mx"))
      .select($"user_id",
        explode(sequence($"mn", $"mx", expr("INTERVAL 1 HOUR"))).as("hr"))
    val w = Window.partitionBy($"user_id").orderBy($"hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select($"user_id", $"hr",
        last($"obs_value", ignoreNulls = true).over(w).as("value_filled"),
        $"obs_value".isNotNull.cast("int").as("observed"))
  }

  val resampleFillSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hr, ts, event_id, "value" FROM events),
      |hourly AS (
      |  SELECT user_id, hr, "value" AS obs_value
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY user_id, hr ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM ev)
      |  WHERE rn = 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
      |  FROM (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM ev GROUP BY user_id))
      |SELECT g.user_id, g.hr,
      |       last_value(h.obs_value IGNORE NULLS) OVER (
      |         PARTITION BY g.user_id ORDER BY g.hr
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
      |       CAST(h.obs_value IS NOT NULL AS INT) AS observed
      |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr""".stripMargin
}
