package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: the whole point is the ABSENCE of a
  * shuffle — asserted against the physical plan, not assumed. */
class BucketedSpec extends AnyFunSuite {
  import TestSpark._

  test("same-bucketed tables join without any Exchange") {
    val s = spark
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      val orders = Tables.orders(s, sf).select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(s, sf)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum("l_quantity").as("qty"))
      Bucketed.writeBucketed(orders, "b_orders", "o_orderkey")
      Bucketed.writeBucketed(li, "b_lineitem", "o_orderkey")

      val joined = Bucketed.bucketedJoin(s, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and it is not just an empty plan — values survive
      assert(joined.count() == orders.join(li, "o_orderkey").count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
