package graft.operators

import graft.Tables
import graft.functions.NumericAgg._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytical query surface over the star schema (SURVEY.md §2 block B).
  *
  * Scale notes: every aggregation relies on Spark's partial aggregation
  * (HashAggregate → shuffle on group keys → HashAggregate); dimension
  * joins broadcast explicitly so fact tables never shuffle for them.
  */
object Analytics {

  /** B1 `q1_pricing` — grouped aggregation, TPC-H Q1 shape (flagship).
    * Reference analogue: the per-category record statistics the pipeline
    * tracks (arxiv_collector.py:106-117), generalized to the canonical
    * scan-filter-aggregate. Partial agg on 2 low-cardinality keys: the
    * shuffle moves only |groups|×partitions rows at any scale. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** B2 `q3_shipping` — 3-way join + filter + agg + top-k (TPC-H Q3
    * shape). The fact-fact join (orders⋈lineitem) shuffles on the order
    * key after date filters are pushed to both scans; the customer dim
    * is broadcast so the fact never shuffles for it. Top-10 plans as
    * TakeOrderedAndProject (per-partition top-k, driver merge — no
    * global sort), ties broken by o_orderkey for determinism. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1998-06-01 00:00:00").cast("timestamp")
    val cust = Tables.customer(spark, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** B3 `q5_local_supplier` — 6-way star join (TPC-H Q5 shape): local
    * suppliers' revenue per nation within one region+year. All four
    * dimension sides (supplier, customer, nation, region) broadcast —
    * the only shuffle left is lineitem⋈orders on the order key, then a
    * partial agg on 25 nations. This is the canonical 100 TB star-join
    * plan: fact shuffles once, dims never do. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lo = lit("1996-01-01 00:00:00").cast("timestamp")
    val hi = lit("1997-01-01 00:00:00").cast("timestamp")
    val region = Tables.region(spark, dir).filter($"r_name" === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(spark, dir).select($"c_custkey", $"c_nationkey")
    val supp = Tables.supplier(spark, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lo && $"o_orderdate" < hi)
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("revenue"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** B4 `topk_per_group` — top-k rows per group via window rank; one
    * shuffle on the group key. For heavily skewed groups at scale the
    * same semantics can pre-aggregate a per-partition top-k before the
    * window (partial top-k pattern); rank ties broken by event_id. */
  def topkPerGroup(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value".desc, $"event_id")
    Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"user_id", $"value")
      .withColumn("rank_in_type", row_number().over(w))
      .filter($"rank_in_type" <= k)
  }

  def topkPerGroupSql(k: Int = 5): String =
    s"""SELECT event_type, event_id, user_id, "value",
       |       CAST(rn AS INT) AS rank_in_type
       |FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY "value" DESC, event_id) AS rn
       |      FROM events)
       |WHERE rn <= $k""".stripMargin

  /** B4b `topk_per_group_agg` — same semantics as B4, expressed as the
    * custom bounded-memory aggregate [[graft.functions.TopKAgg]]
    * instead of a window: partial aggregation keeps a k-heap per group
    * per map task, the shuffle moves heaps (k rows per group per
    * partition), and no group is ever fully sorted. THIS is the form
    * that survives 100 TB facts with hot groups; it is gated against
    * the identical oracle as the window form. The tiny winner set
    * broadcasts back onto the fact to recover payload columns. */
  def topkPerGroupAgg(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val top = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(graft.functions.TopKAgg.topk($"value", $"event_id", k).as("top"))
      .select($"event_type", posexplode($"top"))
      .select($"event_type", ($"pos" + 1).cast("int").as("rank_in_type"),
        $"col.id".as("event_id"))
    Tables.events(spark, dir).select($"event_id", $"user_id", $"value")
      .join(broadcast(top), Seq("event_id"))
      .select($"event_type", $"event_id", $"user_id", $"value", $"rank_in_type")
  }

  /** B5 `window_running` — running sum + lag over ordered per-user
    * partitions. The running sum goes through exact decimal addition so
    * the prefix values hash-match any engine regardless of how its
    * window aggregator associates (segment trees vs naive). One shuffle
    * on user_id; state per partition is O(1). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("running_value",
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .over(w).cast("double"))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .withColumn("delta", when($"prev_value".isNotNull, $"value" - $"prev_value"))
  }

  val windowRunningSql: String =
    """SELECT user_id, event_id, ts, "value",
      |  CAST(SUM(CAST("value" AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_value,
      |  lag("value", 1) OVER w AS prev_value,
      |  "value" - lag("value", 1) OVER w AS delta
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** B6 `approx_distinct` — HLL++ approximate distinct users per event
    * type. No oracle (HLL implementations differ across engines); the
    * spec asserts the estimate is within rsd of the exact count. At
    * scale this is the point: a fixed-size sketch per group mergeable
    * across partitions — the shuffle carries sketches, not ids. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
  }

  /** B7 `quantile_stats` — exact quantiles per group (exact
    * `percentile`, interpolation type R-7 — same definition DuckDB's
    * `quantile_cont` uses; 0.25-step fractions are binary-exact so the
    * interpolated values hash-match). Exact percentile sorts within
    * groups; at 100 TB swap in `percentile_approx` (KLL-style sketch,
    * mergeable) — kept exact here because the oracle demands it. */
  def quantileStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        min($"l_quantity").as("min_qty"),
        percentile($"l_quantity", lit(0.25)).as("p25_qty"),
        percentile($"l_quantity", lit(0.5)).as("p50_qty"),
        percentile($"l_quantity", lit(0.75)).as("p75_qty"),
        max($"l_quantity").as("max_qty"),
        count(lit(1)).as("n"))
  }

  val quantileStatsSql: String =
    """SELECT l_returnflag,
      |  min(l_quantity) AS min_qty,
      |  quantile_cont(l_quantity, 0.25) AS p25_qty,
      |  quantile_cont(l_quantity, 0.5)  AS p50_qty,
      |  quantile_cont(l_quantity, 0.75) AS p75_qty,
      |  max(l_quantity) AS max_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** B7b `approx_quantiles` — B7's promised 100 TB path made real: the
    * MERGEABLE quantile sketch (`percentile_approx`, Spark's
    * Greenwald-Khanna-family summary) replaces the within-group sort —
    * sketches combine map-side and merge associatively, so the
    * aggregation is one two-phase hash agg at any scale. Sketch
    * internals are engine-specific, so this is a rows-only gate with a
    * QUANTITATIVE grade in tools/check.py: every estimate must lie
    * inside DuckDB's exact rank band [quantile(q−ε), quantile(q+ε)]
    * — the ε-rank guarantee the sketch contracts (ε = 1/accuracy,
    * checked at 2ε for cross-implementation slack). */
  def approxQuantiles(spark: SparkSession, dir: String,
                      accuracy: Int = 1000): DataFrame = {
    import spark.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(
        percentile_approx($"value", array(qs.map(lit): _*), lit(accuracy)).as("est"),
        count(lit(1)).as("n"))
      .select($"event_type", $"n", posexplode($"est"))
      .select($"event_type",
        element_at(array(qs.map(lit): _*), $"pos" + 1).as("q"),
        $"col".as("est"), $"n")
  }

  /** B8 `sessionize` — gap-based sessionization (30-min inactivity
    * splits a session). Classic two-window form: flag session starts
    * with lag, prefix-sum the flags into session ordinals, then
    * aggregate per session. Both windows share one shuffle on user_id
    * (same partitioning, Spark reuses the exchange). The streaming
    * analogue is E2 via flatMapGroupsWithState. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        // microsecond-precision gap: unix_timestamp truncates to whole
        // seconds, which disagrees with fractional-second oracles for
        // gaps straddling the boundary by < 1s
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) >
            gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        dsum($"value").as("session_value"))
  }

  def sessionizeSql(gapMinutes: Int = 30): String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, "value",
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
       |                   > $gapMinutes * CAST(60000000 AS BIGINT)
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx, COUNT(*) AS n_events,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end,
       |       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS session_value
       |FROM sessions GROUP BY user_id, session_idx""".stripMargin

  /** B9 `pivot_wide` — event types pivoted to wide per-user feature
    * columns. Pivot values are declared explicitly: with unknown values
    * Spark runs an extra distinct job AND the output schema becomes
    * data-dependent — both wrong at scale. One partial-agg shuffle. */
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .select($"user_id" +: eventTypes.map(t => col(t).as(s"n_$t")): _*)
  }

  val pivotWideSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
      |  COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
      |FROM events GROUP BY user_id""".stripMargin

  /** B10 `rollup_cube` — multi-level rollup (lang, source) with grand
    * total. Subtotal rows are marked with a COALESCE 'ALL' sentinel —
    * valid here because lang/source are non-null with no literal 'ALL';
    * on data without that guarantee, switch the sentinel to
    * `grouping(col)` flags. One shuffle (rollup expands to grouping
    * sets inside a single aggregate). */
  def rollupCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .rollup($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .select(
        coalesce($"lang", lit("ALL")).as("lang"),
        coalesce($"source", lit("ALL")).as("source"),
        $"n_docs", $"sum_chars")
  }

  val rollupCubeSql: String =
    """SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
      |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin

  /** B15 `value_histogram` — fixed-width value histograms per event
    * type (10 buckets of 50, top bucket open). Fixed bucket edges keep
    * the op a single two-phase hash aggregate — data-dependent edges
    * (equi-depth) would need a quantile pre-pass; at 100 TB you run
    * B7's quantile sketch once and feed the edges in as literals. */
  def valueHistogram(spark: SparkSession, dir: String, width: Double = 50.0,
                     nBuckets: Int = 10): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      // explicit null guard: least() SKIPS null arguments in both Spark
      // and DuckDB, so floor(null/width) would silently land in the top
      // bucket instead of being excluded
      .filter($"value".isNotNull)
      .select($"event_type",
        least(floor($"value" / width), lit(nBuckets - 1).cast("long")).as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n_events"))
  }

  def valueHistogramSql(width: Double = 50.0, nBuckets: Int = 10): String =
    s"""SELECT event_type,
       |       least(CAST(FLOOR("value" / $width) AS BIGINT), ${nBuckets - 1}) AS bucket,
       |       COUNT(*) AS n_events
       |FROM events WHERE "value" IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** B18 `equidepth_histogram` — data-dependent (equi-depth) binning:
    * compute each event type's value quartiles (B7's exact percentile,
    * hash-proven identical cross-engine), broadcast the tiny edge
    * table back, and bucket every event against its own type's edges.
    * The composition B15's doc points at — quantile pass once, edges
    * ride as a broadcast, binning stays a scan-side when-chain +
    * two-phase count. Equi-depth by construction: ~n/4 per bucket up
    * to ties. */
  def equidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"value".isNotNull)
      .select($"event_type", $"value")
    val edges = ev.groupBy($"event_type").agg(
      percentile($"value", lit(0.25)).as("p25"),
      percentile($"value", lit(0.5)).as("p50"),
      percentile($"value", lit(0.75)).as("p75"))
    ev.join(broadcast(edges), Seq("event_type"))
      .withColumn("bucket",
        when($"value" < $"p25", 0)
          .when($"value" < $"p50", 1)
          .when($"value" < $"p75", 2)
          .otherwise(3))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n_events"))
  }

  val equidepthHistogramSql: String =
    """WITH edges AS (
      |  SELECT event_type,
      |         quantile_cont("value", 0.25) AS p25,
      |         quantile_cont("value", 0.5)  AS p50,
      |         quantile_cont("value", 0.75) AS p75
      |  FROM events WHERE "value" IS NOT NULL GROUP BY event_type)
      |SELECT e.event_type,
      |       CASE WHEN e."value" < p25 THEN 0
      |            WHEN e."value" < p50 THEN 1
      |            WHEN e."value" < p75 THEN 2 ELSE 3 END AS bucket,
      |       COUNT(*) AS n_events
      |FROM events e JOIN edges USING (event_type)
      |WHERE e."value" IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  /** B17 `funnel_stages` — ordered-event funnel: how many users viewed,
    * then clicked AFTER their first view, then purchased AFTER that
    * first qualifying click. The ordering constraint is what makes this
    * a funnel rather than three counts; each stage anchors on the
    * previous stage's first qualifying timestamp.
    *
    * Scale: three per-user min-aggregations (two-phase hash agg each)
    * chained by per-key joins — everything keys on user_id, no windows
    * over raw events, no cross-stage shuffle wider than one row per
    * user per stage. */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"user_id", $"event_type", $"ts")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val clicks = ev.filter($"event_type" === "click")
      .join(views, Seq("user_id"))
      .filter($"ts" >= $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val purchases = ev.filter($"event_type" === "purchase")
      .join(clicks, Seq("user_id"))
      .filter($"ts" >= $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    views.select(lit("1_view").as("stage"), $"user_id")
      .unionAll(clicks.select(lit("2_click_after_view").as("stage"), $"user_id"))
      .unionAll(purchases.select(lit("3_purchase_after_click").as("stage"), $"user_id"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
  }

  val funnelStagesSql: String =
    """WITH views AS (
      |  SELECT user_id, MIN(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |clicks AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_click
      |  FROM events e JOIN views v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
      |  GROUP BY e.user_id),
      |purchases AS (
      |  SELECT e.user_id, MIN(e.ts) AS t_purchase
      |  FROM events e JOIN clicks c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      |  GROUP BY e.user_id)
      |SELECT stage, COUNT(*) AS n_users FROM (
      |  SELECT '1_view' AS stage, user_id FROM views
      |  UNION ALL SELECT '2_click_after_view', user_id FROM clicks
      |  UNION ALL SELECT '3_purchase_after_click', user_id FROM purchases)
      |GROUP BY stage""".stripMargin
}
