package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert + slowly-changing history operators (SURVEY.md §2 A6-A8).
  *
  * Reference behavior: idempotent `ON CONFLICT DO NOTHING` inserts
  * (pg_engine.py:104-125) and an append-only `arxiv_papers_history`
  * table carrying per-operation rows with versions
  * (create_table.sql:85-107, arxiv_etl.py:84-111).
  */
object Scd {

  /** A6 `upsert_merge` — first-writer-wins merge: existing rows are
    * kept, incoming rows are inserted only when their key is absent
    * (the exact semantics of the reference's ON CONFLICT DO NOTHING).
    * base = orders with key % 3 != 0; incoming = a re-priced snapshot
    * of keys % 2 == 0.
    *
    * Scale: LEFT ANTI + UNION ALL — one shuffle on the key. On a real
    * lakehouse sink this is `MERGE INTO ... WHEN NOT MATCHED THEN
    * INSERT`; expressing it as anti-join keeps the plan shuffle-minimal
    * and lets AQE broadcast the smaller side.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val base = o.filter($"o_orderkey" % 3 =!= 0)
      .select($"o_orderkey", $"o_totalprice", lit("base").as("src"))
    val incoming = o.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", ($"o_totalprice" * lit(1.1)).as("o_totalprice"),
        lit("incoming").as("src"))
    base.unionAll(incoming.join(base.select($"o_orderkey"), Seq("o_orderkey"), "left_anti"))
  }

  val upsertMergeSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, 'base' AS src FROM orders WHERE o_orderkey % 3 <> 0),
      |incoming AS (
      |  SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 'incoming' AS src
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT * FROM base
      |UNION ALL
      |SELECT * FROM incoming i
      |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.o_orderkey = i.o_orderkey)""".stripMargin

  /** A7 `scd_current` — current-state view over an append-only event
    * history: the latest record per key (reference: `arxiv_papers` as
    * the "current" projection of `arxiv_papers_history`).
    *
    * Scale: window row_number over (key, ts desc) = one shuffle on the
    * key; ties broken by event_id so the result is deterministic. For
    * extreme key cardinality the same semantics can run as
    * `max_by(struct(...), struct(ts, event_id))` aggregation (partial
    * agg, smaller shuffle) — window form kept here for clarity.
    */
  def scdCurrent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id".as("last_event_id"),
        $"event_type".as("last_event_type"), $"value".as("last_value"))
  }

  val scdCurrentSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
      |       "value" AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1""".stripMargin

  /** A8 `scd_change_detect` — diff two snapshots into operation rows
    * (insert / update / delete / unchanged), the reference's
    * history-table `operation_type` computed set-wise instead of
    * row-at-a-time. [[scdDiff]] is the general two-frame form (full
    * outer join, one key shuffle). The gated query's snapshots both
    * derive from `orders`, whose key is unique — so the diff collapses
    * to ONE scan + projection (each snapshot's value becomes a
    * conditional column; a key missing from a snapshot is a null) and
    * the only exchange left is the 4-group partial agg. Deriving both
    * sides from a shared scan instead of scanning twice and
    * full-outer-joining the halves is what fixed this query's r2 bench
    * regression (2.2 s → scan-bound).
    */
  def scdChangeDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .filter($"o_orderkey" % 5 =!= 0 || $"o_orderkey" % 7 =!= 0)
      .select($"o_orderkey".as("key"),
        when($"o_orderkey" % 5 =!= 0, $"o_totalprice").as("old_price"),
        when($"o_orderkey" % 7 =!= 0,
          when($"o_orderkey" % 3 === 0, $"o_totalprice" * lit(2.0))
            .otherwise($"o_totalprice")).as("new_price"))
      .select($"key",
        when($"old_price".isNull, lit("insert"))
          .when($"new_price".isNull, lit("delete"))
          .when($"old_price" =!= $"new_price", lit("update"))
          .otherwise(lit("unchanged")).as("op"))
      .groupBy($"op").agg(count(lit(1)).as("n"))
  }

  /** General snapshot diff for arbitrary sources: full outer join on
    * `keyCol`, one shuffle, one per-key op row (insert/delete/update/
    * unchanged — aggregate downstream as needed). `oldCol`/`newCol`
    * name the compared value column in each snapshot. Use when the
    * snapshots do NOT share a uniquely-keyed scan (otherwise prefer the
    * [[scdChangeDetect]] single-scan shape). */
  def scdDiff(old: DataFrame, neu: DataFrame, keyCol: String = "key",
              oldCol: String = "old_price", newCol: String = "new_price"): DataFrame = {
    val joined = old.join(neu, Seq(keyCol), "full_outer")
    joined.select(col(keyCol),
      when(col(oldCol).isNull, lit("insert"))
        .when(col(newCol).isNull, lit("delete"))
        .when(col(oldCol) =!= col(newCol), lit("update"))
        .otherwise(lit("unchanged")).as("op"))
  }

  val scdChangeDetectSql: String =
    """WITH old AS (
      |  SELECT o_orderkey AS key, o_totalprice AS old_price FROM orders WHERE o_orderkey % 5 <> 0),
      |neu AS (
      |  SELECT o_orderkey AS key,
      |         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2.0 ELSE o_totalprice END AS new_price
      |  FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT CASE WHEN old_price IS NULL THEN 'insert'
      |            WHEN new_price IS NULL THEN 'delete'
      |            WHEN old_price <> new_price THEN 'update'
      |            ELSE 'unchanged' END AS op,
      |       COUNT(*) AS n
      |FROM old FULL OUTER JOIN neu USING (key)
      |GROUP BY 1""".stripMargin

  /** A15 `scd2_intervals` — materialize the full SCD TYPE-2 view from
    * the change log: every event becomes a version row whose validity
    * runs until the key's next change (`lead` over (key, ts)); the
    * open-ended row is the current one. This completes the reference's
    * append-only history design (create_table.sql:85-107): A7 gives the
    * latest row, this gives every row WITH its validity interval — the
    * as-of-queryable form (pairs with the AS-OF join, B12).
    *
    * Scale: one shuffle on the entity key, one window per key ordered
    * by time — the same shape as sessionization; no self-joins. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    intervalsOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts")))

  /** Frame-based core of A15 (events = (user_id, event_id, event_type,
    * ts)) — shared with the incremental [[scd2Apply]], whose output
    * must equal this recomputed from scratch. */
  private[graft] def intervalsOf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      // monotone per-key version ordinal (the reference's history
      // `version BIGINT`, create_table.sql:88) — same window as the
      // lead(), so one sort, one Window node computes both.
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", $"ts")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("is_current", $"valid_to".isNull)
      .drop("ts")
  }

  /** Extension `scd2_apply` (A15b) — INCREMENTAL SCD2 merge: apply a
    * strictly-later change batch to an existing interval table in one
    * plan — close each affected key's open interval at its first new
    * event, continue that key's version numbering through the new
    * events, and append their intervals — the nightly `MERGE INTO`
    * a cluster runs against the reference's append-only history table
    * (create_table.sql:85-107, arxiv_etl.py:84-111) instead of
    * recomputing A15 from all history. The gated entry splits `events`
    * at a derived 75% event-time boundary (integer micros arithmetic,
    * engine-exact), builds the base interval table from the prefix,
    * applies the suffix as the change batch, and must HASH-EQUAL the
    * from-scratch A15 over all events ([[scd2IntervalsSql]] is the
    * oracle — the strongest possible gate for an incremental
    * operator: full-recompute parity through an independent engine).
    *
    * Scale: this is the incremental posture A6-A8/A15 lack — work is
    * one pass-through of the base table (broadcast-joined against the
    * per-affected-key first-new-event row, which is change-batch
    * sized) plus one (key)-shuffled window over the CHANGE BATCH
    * only. Closed history rows are immutable (the batch is strictly
    * later), so nothing base-sized ever shuffles or sorts; on a
    * lakehouse sink the pass-through becomes the MERGE's
    * copy-unmodified-files path and only the open-row files rewrite.
    *
    * Correctness of the split form: per key, base events all precede
    * change events in (ts, event_id) order (the boundary is strict),
    * so concatenating the base windows with the change windows
    * reproduces the full-history window exactly: versions continue at
    * the open row's version, the open row's valid_to becomes the
    * key's first change ts, and keys absent from either side pass
    * through / number from 1. */
  def scd2Apply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      // epoch micros of the NTZ wall clock (session pinned UTC):
      // integer split arithmetic both engines compute identically
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
    val bnd = ev.agg(min($"us").as("mn"), max($"us").as("mx"))
      .select(expr("mn + ((mx - mn) * 3) div 4").as("t_split"))
    val tagged = ev.crossJoin(broadcast(bnd))
    val base = intervalsOf(
      tagged.filter($"us" < $"t_split").drop("us", "t_split"))
    val changes = tagged.filter($"us" >= $"t_split").drop("us", "t_split")
    scd2ApplyOf(base, changes)
  }

  /** The one-plan MERGE core: `base` = an A15-shaped interval table,
    * `changes` = (user_id, event_id, event_type, ts) all strictly
    * later than every base event of their key. */
  def scd2ApplyOf(base: DataFrame, changes: DataFrame): DataFrame = {
    import base.sparkSession.implicits._
    // change-batch-sized per-key metadata: when the key's open
    // interval closes (its first new event)
    val firstNew = changes.groupBy($"user_id").agg(min($"ts").as("first_new_ts"))
    // pass through the base table once: only affected keys' open rows
    // change (close at first_new_ts); closed history is immutable
    val baseAdj = base.join(firstNew, Seq("user_id"), "left")
      .select($"user_id", $"event_id", $"event_type", $"version",
        $"valid_from",
        when($"is_current" && $"first_new_ts".isNotNull, $"first_new_ts")
          .otherwise($"valid_to").as("valid_to"),
        ($"is_current" && $"first_new_ts".isNull).as("is_current"))
    // version continuation: the open row carries its key's max version
    val offs = base.filter($"is_current").select($"user_id", $"version".as("base_v"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changesV = changes.join(offs, Seq("user_id"), "left")
      .select($"user_id", $"event_id", $"event_type",
        (coalesce($"base_v", lit(0L)) + row_number().over(w)).as("version"),
        $"ts".as("valid_from"),
        lead($"ts", 1).over(w).as("valid_to"),
        lead($"ts", 1).over(w).isNull.as("is_current"))
    baseAdj.unionAll(changesV)
  }

  val scd2IntervalsSql: String =
    """SELECT user_id, event_id, event_type,
      |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
      |       ts AS valid_from,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM events""".stripMargin
}
