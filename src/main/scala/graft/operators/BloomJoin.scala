package graft.operators

import graft.Tables
import graft.functions.NumericAgg.dsum
import org.apache.spark.sql.{DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** B16 `bloom_prejoin` — bloom-filter semi-join reduction: build a
  * bloom filter over the (already filtered) dim join keys, pre-filter
  * the fact side with `might_contain` BEFORE the join shuffle, then
  * run the exact join. False positives pass the bloom and are removed
  * by the join, so the result is bit-identical to the plain join —
  * which is exactly what the oracle checks.
  *
  * This is the manual form of Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`, off by default and broadcast-bounded), and
  * uses the same plan shape: the bloom build rides into the probe
  * plan as a SCALAR SUBQUERY (one deferred single-value job, no eager
  * driver work at DataFrame-construction time, no megabyte literal in
  * the plan). At 100 TB the win is that non-matching fact rows die at
  * the scan projection instead of riding the join shuffle. Built on
  * the internal `BloomFilterAggregate` / `BloomFilterMightContain`
  * expressions via GraftShim
  * (spark/sql/catalyst/expressions/BloomFilterMightContain.scala).
  */
object BloomJoin {

  private def dimKeys(spark: SparkSession, dir: String, priority: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderpriority" === priority)
      .select($"o_orderkey")
  }

  /** The fact side filtered by the bloom built over the dim keys — the
    * observable middle of the operator (the spec asserts it keeps every
    * true match while pruning most non-matches, shuffle-free). */
  def bloomPrefilteredFact(spark: SparkSession, dir: String,
                           priority: String = "1-URGENT",
                           expectedItems: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val bloomAgg = GraftShim.column(
      new BloomFilterAggregate(
        GraftShim.expression(xxhash64($"o_orderkey")),
        Literal(expectedItems), Literal(expectedItems * 8))
        .toAggregateExpression())
    // the single-row bloom aggregate as a scalar subquery: evaluated
    // once at execution, shared by every probe task
    val bloomSub = ScalarSubquery(
      dimKeys(spark, dir, priority).agg(bloomAgg.as("bf"))
        .queryExecution.analyzed)
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
      .filter(GraftShim.column(BloomFilterMightContain(
        bloomSub, GraftShim.expression(xxhash64($"l_orderkey")))))
  }

  def bloomPrejoin(spark: SparkSession, dir: String,
                   priority: String = "1-URGENT",
                   expectedItems: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val prefiltered = bloomPrefilteredFact(spark, dir, priority, expectedItems)
    val dim = dimKeys(spark, dir, priority)
    // probe output: the exact join drops bloom false positives
    prefiltered
      .join(dim, prefiltered("l_orderkey") === dim("o_orderkey"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"))
  }

  def bloomPrejoinSql(priority: String = "1-URGENT"): String =
    s"""SELECT l_returnflag, COUNT(*) AS n_items,
       |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '$priority'
       |GROUP BY l_returnflag""".stripMargin
}
