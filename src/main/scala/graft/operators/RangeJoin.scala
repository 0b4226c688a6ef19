package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketized range join (SURVEY.md §2 B13).
  *
  * A time-range self-join (`b.ts ∈ (a.ts, a.ts + Δ]`) expressed
  * naively is an inequality join: Spark plans it as a join on the
  * equality part only (here: user) and filters the range afterwards —
  * every user's events pair quadratically before the filter. The
  * bucketization trick bounds that: bucket timestamps into Δ-sized
  * cells, join on (user, cell) with the left side exploded to its own
  * and the next cell (any in-range pair must land in one of the two),
  * then apply the exact range predicate. Candidate pairs shrink from
  * |group|² to pairs within ±2Δ — the standard interval-join plan that
  * engines with native range joins build internally.
  *
  * Gated against the plain inequality join in DuckDB: same rows, the
  * bucketing provably changes nothing but the work.
  */
object RangeJoin {

  /** B13 `range_join_pairs` — per-user event pairs within `deltaSec`. */
  def rangePairs(spark: SparkSession, dir: String, deltaSec: Long = 300L): DataFrame = {
    import spark.implicits._
    val deltaUs = deltaSec * 1000000L
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"))
    val a = e.select($"user_id", $"event_id".as("id1"), $"us".as("us1"),
        explode(array(floor($"us" / deltaUs), floor($"us" / deltaUs) + 1)).as("cell"))
    val b = e.select($"user_id", $"event_id".as("id2"), $"us".as("us2"),
        floor($"us" / deltaUs).as("cell"))
    a.join(b, Seq("user_id", "cell"))
      .filter($"us2" > $"us1" && $"us2" <= $"us1" + deltaUs)
      .select($"id1", $"id2", $"user_id", ($"us2" - $"us1").as("gap_us"))
  }

  def rangePairsSql(deltaSec: Long = 300L): String =
    s"""SELECT a.event_id AS id1, b.event_id AS id2, a.user_id,
       |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
       |FROM events a JOIN events b
       |  ON a.user_id = b.user_id
       | AND b.ts > a.ts
       | AND epoch_us(b.ts) <= epoch_us(a.ts) + $deltaSec * 1000000""".stripMargin
}
