package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom AsOfJoin operator must agree with the composed
  * (join + window) formulation it replaces, and its plan must carry
  * the SortMergeJoin shuffle shape. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("asof_join equals join+window reference; plan shuffles once per side") {
    val got = operators.AsOf.asofStateJoin(spark, sf)

    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val st = Tables.events(spark, sf).filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("state_ts"),
        col("value").as("state_value"))
    val w = Window.partitionBy("event_id").orderBy(col("state_ts").desc)
    val ref = ev.join(st, ev("user_id") === st("s_user_id") && ev("ts") >= col("state_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("state_ts"), col("state_value"))

    assert(got.count() == ref.count())
    assert(got.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(got).count() == 0)

    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n${plan.take(800)}")
    // EnsureRequirements must have inserted the per-side shuffle + sort
    assert(plan.contains("Exchange hashpartitioning(user_id"))
    assert(plan.contains("Sort [user_id"))
  }

  test("asof_join drops events with no prior state") {
    val got = operators.AsOf.asofStateJoin(spark, sf)
    // every joined state must be at or before the event time
    assert(got.filter(col("state_ts") > col("ts")).count() == 0)
  }
}
