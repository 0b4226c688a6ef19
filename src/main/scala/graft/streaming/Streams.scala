package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators (SURVEY.md §2 E1-E2).
  *
  * Both transforms are written against a DataFrame/Dataset of events so
  * the SAME code runs in batch (driver gate, on the parquet tables) and
  * in streaming (readStream/MemoryStream, exercised by the spec).
  * That batch/stream unification is Structured Streaming's core design
  * and how a production pipeline validates streaming logic offline.
  */
object Streams {

  /** E1 `stream_window_agg` — tumbling 1-hour event-time windows per
    * event type. On a stream: `withWatermark("ts", ...)` bounds state —
    * windows older than the watermark finalize and evict. In batch the
    * identical plan is a groupBy on the derived window struct.
    * Scale: partial agg per (window, type); state size = open windows ×
    * types, independent of throughput. */
  def windowAgg(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    // Watermarks require TIMESTAMP (with zone); NTZ event time is cast
    // in the session TZ (pinned UTC) so window bounds are unchanged.
    val in = if (withWatermark)
      events.withColumn("ts", col("ts").cast("timestamp")).withWatermark("ts", "2 hours")
    else events
    in.groupBy(
        window(col("ts"), "1 hour").as("win"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Driver-gate batch entry for E1. */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.events(spark, dir))

  /** E8 `stream_window_topk` — per-window heavy hitters: the top-k
    * users by decimal-exact summed value inside each (1-hour window,
    * event_type) — the trending-users/items staple. Two chained
    * aggregations: per-user window sums, then the bounded-memory
    * [[graft.functions.TopKAgg]] k-heap per window. On a stream both
    * are stateful under one watermark (Spark's multiple-stateful-
    * operator support for event-time windows, append mode); in batch
    * the identical plan is two hash aggregations. State = open
    * windows × types × (active users + k) — independent of
    * throughput; after the first agg the shuffle moves partial
    * k-heaps, never event rows. Hash-gated on a window + row_number
    * oracle: ordering is (decimal-exact sum cast double) DESC, ties
    * to the lowest user_id — exactly the heap's admission order. */
  def windowTopk(events: DataFrame, k: Int = 3,
                 withWatermark: Boolean = false): DataFrame = {
    import events.sparkSession.implicits._
    val in = if (withWatermark)
      events.withColumn("ts", col("ts").cast("timestamp")).withWatermark("ts", "2 hours")
    else events
    val per = in
      .groupBy(window($"ts", "1 hour").as("win"), $"event_type", $"user_id")
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("user_value"))
    per.groupBy($"win", $"event_type")
      .agg(graft.functions.TopKAgg.topk($"user_value", $"user_id", k).as("top"))
      .select($"win.start".as("window_start"), $"event_type", posexplode($"top"))
      .select($"window_start", $"event_type",
        ($"pos" + 1).cast("int").as("rank_in_window"),
        $"col.id".as("user_id"), $"col.value".as("user_value"))
  }

  def streamWindowTopk(spark: SparkSession, dir: String): DataFrame =
    windowTopk(Tables.events(spark, dir))

  def streamWindowTopkSql(k: Int = 3): String =
    s"""WITH per AS (
       |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       |         user_id,
       |         CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS user_value
       |  FROM events GROUP BY 1, 2, 3)
       |SELECT window_start, event_type, CAST(rn AS INT) AS rank_in_window,
       |       user_id, user_value
       |FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY window_start, event_type
       |    ORDER BY user_value DESC, user_id) AS rn
       |  FROM per)
       |WHERE rn <= $k""".stripMargin

  val streamWindowAggSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  final case class Ev(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                              session_start: java.time.LocalDateTime,
                              session_end: java.time.LocalDateTime)
  /** Open-session state (streaming mode): O(1) per key — only the open
    * session's bounds/count (micros) and the per-user emitted-session
    * counter survive between micro-batches, never the events. */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, idx: Long)

  /** E2 `stream_sessionize` — stateful sessionization with
    * flatMapGroupsWithState: events group by user; a gap > `gapMinutes`
    * closes the current session and emits it; the OPEN session is held
    * in O(1) state and flushed by `GroupStateTimeout.EventTimeTimeout`
    * once the stream's watermark passes its gap horizon (last event +
    * gap) — an abandoned session cannot leak state forever, the same
    * aging posture as E6. The re-arm is watermark-clamped like E6's, so
    * a backfill that jumps the watermark past the horizon in one batch
    * can't arm an already-expired timestamp. After a timeout flush the
    * key keeps an idx-only TOMBSTONE (n = 0, no timeout armed): a user
    * returning later continues at session_idx + 1, so
    * (user_id, session_idx) stays unique over the stream's lifetime
    * and matches the batch/B8 numbering — at 4 longs per ever-seen
    * user this is the cheap end of the state/correctness trade
    * (removing the counter would silently collide downstream keys).
    *
    * In batch mode Spark feeds each key's whole group once with fresh
    * state and timeouts never fire, so the trailing session is emitted
    * at end-of-group — the identical session set as the declarative B8
    * window formulation, which is E2's oracle. Streaming callers must
    * watermark the input ([[sessionizeStream]] wires it); scale: state
    * per key is O(1), keys shard across executors on the groupBy hash. */
  def sessionizeTyped(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // gap measured in MICROS to match the batch analogue (Analytics
    // .sessionize casts ts to micros) — second-resolution truncation
    // would split/merge sessions whose boundary events differ by <1s.
    val gapMicros = gapMinutes * 60000000L
    val isStreaming = events.isStreaming
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          def micros(e: Ev): Long =
            e.ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + e.ts.getNano / 1000L
          def ldt(us: Long): java.time.LocalDateTime =
            java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
              (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
          if (state.hasTimedOut) {
            // watermark passed last event + gap: the open session is
            // definitively closed (anything older would be late-dropped).
            // Keep an idx-only tombstone (n = 0, no timeout re-armed) so
            // a returning user continues the numbering instead of
            // colliding on (user_id, session_idx = 1).
            val st = state.get
            state.update(SessionState(0L, 0L, 0L, st.idx + 1))
            Iterator.single(SessionOut(userId, st.idx + 1, st.n, ldt(st.startUs), ldt(st.lastUs)))
          } else {
            val sorted = evs.toSeq.sortBy(e => (micros(e), e.event_id))
            val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var idx = state.getOption.map(_.idx).getOrElse(0L)
            // a tombstone (n = 0) carries only the counter — no open session
            var open = state.getOption.filter(_.n > 0L).map(s => (s.startUs, s.lastUs, s.n))
            sorted.foreach { e =>
              val us = micros(e)
              open match {
                case Some((s0, l0, n0)) if us - l0 > gapMicros =>
                  idx += 1
                  out += SessionOut(userId, idx, n0, ldt(s0), ldt(l0))
                  open = Some((us, us, 1L))
                case Some((s0, l0, n0)) =>
                  open = Some((math.min(s0, us), math.max(l0, us), n0 + 1))
                case None =>
                  open = Some((us, us, 1L))
              }
            }
            if (isStreaming) {
              open.foreach { case (s0, l0, n0) =>
                state.update(SessionState(s0, l0, n0, idx))
                // flush-by-timeout when the watermark passes the gap
                // horizon (last event + gap); if the watermark has
                // ALREADY passed that horizon (backfill jump), arm at
                // wm + 1 so the expired session fires on the very next
                // watermark advance instead of waiting a further full
                // gap of event-time progress
                val wmMs = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                  math.max(l0 / 1000L + gapMinutes * 60000L, wmMs + 1L))
              }
            } else {
              // batch: timeouts never fire — emit the trailing session
              open.foreach { case (s0, l0, n0) =>
                idx += 1
                out += SessionOut(userId, idx, n0, ldt(s0), ldt(l0))
              }
            }
            out.iterator
          }
      }
  }

  /** Streaming wiring for E2: watermark the (NTZ) event time, then run
    * [[sessionizeTyped]]; open sessions age out via its event-time
    * timeout once the watermark passes their gap horizon.
    *
    * The timeout timestamps inside the state function interpret the
    * NTZ wall time AS UTC (LocalDateTime.toEpochSecond(UTC)), so the
    * watermark must live on the SAME epoch: a bare
    * `cast(ts as timestamp)` would interpret the wall time in the
    * session zone and shift the watermark by the zone offset —
    * flushing sessions hours early or retaining state hours late on
    * any non-UTC session. `from_utc_timestamp(cast(..), sessionTZ)`
    * cancels the session-zone interpretation exactly (up to the
    * offset-at-instant vs offset-at-wall subtlety within a DST
    * transition hour; pin the session to UTC — as every main in this
    * repo does — to remove even that). */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30,
                       delayThreshold: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    sessionizeTyped(
      events.toDF()
        .withColumn("event_time",
          from_utc_timestamp(col("ts").cast("timestamp"), tz))
        .withWatermark("event_time", delayThreshold)
        .as[Ev],
      gapMinutes)
  }

  /** E3 `stream_dedup` — the reference's exact dedup on the primary id
    * (arxiv_collector.py:118-130) as a stream: `dropDuplicates(id)`
    * with a watermark bounds the seen-set state to the lookback window,
    * exactly the reference's windowed seen-set but maintained by the
    * state store instead of a DB query. The same transform runs in
    * batch for the gate (duplicated input → distinct rows: values are
    * deterministic because duplicates are exact copies). */
  def dedup(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val in = if (withWatermark)
      events.withColumn("ts", col("ts").cast("timestamp")).withWatermark("ts", "1 hour")
    else events
    in.dropDuplicates("event_id")
  }

  /** Driver-gate batch entry for E3: events ∪ exact copy → dedup. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    dedup(ev.unionAll(ev))
  }

  val streamDedupSql: String =
    """SELECT event_id, user_id, event_type, "value" FROM events""".stripMargin

  /** E4 `stream_join` — stream-stream INTERVAL JOIN: every `purchase`
    * matches the same user's `view` events from the preceding hour
    * (view.ts ∈ [purchase.ts − 1h, purchase.ts]) — the attribution
    * join. In streaming both sides carry watermarks and the time bound
    * makes state expirable: Spark keeps only one hour of views per key.
    * The SAME transform runs in batch for the gate, where it is a plain
    * conditional equi-join.
    * Scale: shuffle on user_id both sides; per-key state bounded by the
    * interval, not the stream length. */
  def intervalJoin(purchases: DataFrame, views: DataFrame,
                   withWatermark: Boolean = false): DataFrame = {
    val (p, v) =
      if (withWatermark)
        (purchases.withColumn("p_ts", col("p_ts").cast("timestamp"))
           .withWatermark("p_ts", "2 hours"),
         views.withColumn("v_ts", col("v_ts").cast("timestamp"))
           .withWatermark("v_ts", "2 hours"))
      else (purchases, views)
    p.join(v,
      p("user_id") === v("v_user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"),
      "inner")
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Driver-gate batch entry for E4. */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    intervalJoin(purchases, views)
  }

  val streamJoinSql: String =
    """SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
      |       p.ts AS p_ts, v.ts AS v_ts
      |FROM events p JOIN events v
      |  ON p.user_id = v.user_id
      | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
      |WHERE p.event_type = 'purchase' AND v.event_type = 'view'""".stripMargin

  /** E5 `stream_enrich` — stream-STATIC dimension enrichment: each
    * event joins the broadcast customer dimension on user id. This is
    * the stateless streaming shape the interval join (E4) is not: no
    * watermark, no state store — the dimension is a broadcast the
    * stream probes per micro-batch, so throughput is scan-bound and
    * the static side refreshes per batch (Spark re-plans the static
    * relation each micro-batch, the standard slowly-changing-dim
    * pattern). Left join: events with no dimension row survive with
    * nulls rather than vanishing — an enrichment must never drop
    * facts. The SAME transform gates in batch. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"), "left")
      .select(events("event_id"), events("user_id"), events("event_type"),
        events("value"), dim("c_mktsegment").as("segment"),
        dim("c_nationkey").as("nation_key"))

  /** Driver-gate batch entry for E5. */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    enrich(
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")))

  val streamEnrichSql: String =
    """SELECT e.event_id, e.user_id, e.event_type, e."value",
      |       c.c_mktsegment AS segment, c.c_nationkey AS nation_key
      |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin

  /** E19 `stream_quality_classify` — the LEARNED quality filter (C32)
    * applied AT INGEST: the NB model trains once batch-side (the
    * nightly teacher/train job, `nbTrain`) and each arriving doc
    * micro-batch scores against the frozen broadcast classes×dim
    * model (`nbScore`) — E5's stream-static stateless shape, so a
    * doc's verdict depends on the model and its own tokens alone and
    * per-batch scoring provably equals one-shot scoring (the gate:
    * the replayed corpus hash-equals C32's oracle; StreamingSpec
    * drives real MemoryStream batches through a foreachBatch scorer
    * and pins row parity plus batch-composition irrelevance). */
  def streamQualityClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.fanout(graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text"))
    val (model, priors) = graft.operators.TextAnalysis.nbTrainFor(spark, dir)
    graft.operators.TextAnalysis.nbScore(docs, model, priors)
  }

  /** E20 `stream_dsir_select` — the DSIR importance filter (C33)
    * applied AT INGEST: the log-ratio model AND the selection
    * threshold eps freeze batch-side (`dsirTrain`, the nightly job
    * over the reference corpus), and each arriving doc micro-batch
    * scores statelessly against the frozen pair (`dsirScore`) — E19's
    * stream-static shape with the threshold frozen too, because a
    * per-batch quantile would redefine the selection as data arrives.
    * A doc's (logw, selected) verdict depends on the frozen pair and
    * its own tokens alone, so per-batch scoring ≡ one-shot scoring:
    * the gate replays the corpus through train+score and hash-equals
    * C33's oracle; StreamingSpec drives real MemoryStream batches
    * through a foreachBatch scorer and pins row parity plus
    * batch-composition irrelevance. */
  def streamDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.fanout(graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text"))
    val fit = graft.operators.TextAnalysis.dsirFitFor(spark, dir)
    graft.operators.TextAnalysis.dsirScore(docs, fit._1, fit._3)
  }

  /** E22 `stream_source_block` — the domain blocklist (F18) applied
    * AT INGEST as admission control: the per-source verdict table
    * freezes batch-side (the nightly aggregate over yesterday's
    * corpus — domain-cardinality, broadcast), and each arriving doc
    * micro-batch tags statelessly by one broadcast join on `source`.
    * A doc's verdict depends on the frozen table and its own source
    * alone (a source unseen by the nightly job admits by default —
    * blocklist, not allowlist), so N micro-batches ≡ one one-shot
    * tagging: the gate replays the corpus and hash-equals a
    * LEFT-JOIN-composed F18 oracle; StreamingSpec drives real
    * MemoryStream batches through a foreachBatch tagger and pins row
    * parity plus the unseen-source default. */
  def streamSourceBlock(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Gov = graft.operators.Govern
    val verdicts = Gov.sourceQualityBlock(spark, dir)
      .select($"source", $"blocked").localCheckpoint()
    Gov.sourceBlockTag(
      Tables.fanout(graft.Tables.documents(spark, dir)
        .select($"doc_id", $"source"))
        .filter($"doc_id" % Gov.BenchMod =!= 0),
      verdicts)
  }

  /** E26 `stream_boilerplate` — per-source boilerplate stripping AT
    * INGEST: the (source, line) strike table (C30d's
    * `boilerplateStrikes` — a site's chrome changes slowly, so the
    * nightly job's output is the frozen artifact) freezes batch-side,
    * and each arriving (doc_id, source, text) micro-batch strips and
    * reassembles statelessly (`boilerplateApply`). A doc's cleaned
    * text depends on the frozen strikes and its own segments alone,
    * so N micro-batches ≡ the one-shot strip — gate hash-equal to
    * C30d's oracle; StreamingSpec drives real MemoryStream batches
    * splitting a source's pages across arrivals and pins row parity
    * (the per-source fraction was decided at freeze time, never from
    * the partial view a single batch has of its source). */
  /** E27 `stream_source_overlap` — cross-source duplication estimates
    * maintained FROM A STREAM: the per-source KMV sketch (F22) is
    * MERGEABLE — k-smallest(A ∪ B) == k-smallest(k-smallest(A) ∪ B) —
    * so each arriving micro-batch folds into the S·k-row sketch state
    * with one [[graft.operators.Govern.kmvTop]] merge (O(batch) work,
    * corpus never re-touched), and the pair estimates after N batches
    * are EXACTLY the one-shot estimates: the property that makes KMV
    * the sketch a streaming ingest can afford to keep per source.
    *
    * Driver-gate batch entry: the 70%-prefix sketch is the nightly
    * state, the 30% suffix arrives as `nBatches` deterministic
    * micro-batches, each folded by merge; the final pair table is
    * HASH-EQUAL to F22's full-corpus oracle — batch composition is
    * answer-invisible by the merge law, not by approximation.
    * StreamingSpec drives real MemoryStream arrivals through
    * foreachBatch into the same fold and pins that parity. */
  def streamSourceOverlap(spark: SparkSession, dir: String,
                          nBatches: Int = 3, k: Int = 128): DataFrame = {
    import spark.implicits._
    val G = graft.operators.Govern
    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"source", $"text")
    val cols = Seq($"source", $"text").map(c => c)
    var state = G.sourceSketch(
      Tables.fanout(docs.filter($"doc_id" % 10 < 7).select(cols: _*)), k)
      .localCheckpoint()
    (0 until nBatches).foreach { b =>
      val batch = docs.filter($"doc_id" % 10 >= 7 &&
        pmod($"doc_id", lit(nBatches)) === b).select(cols: _*)
      state = G.kmvTop(
        state.unionAll(G.sourceSketch(Tables.fanout(batch), k)), k)
        .localCheckpoint()
    }
    G.sketchPairs(state, k)
  }

  def streamBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val TA = graft.operators.TextAnalysis
    val corpus = TA.chromeCorpus(spark, dir)
    val strikes = TA.boilerplateStrikes(
      corpus, graft.GraftConfig.ambient.boilerplatePct).localCheckpoint()
    TA.boilerplateApply(Tables.fanout(corpus), strikes)
  }

  /** E30 `stream_pii_structured` — checksum-validated structured-PII
    * redaction at ingest: F23's per-row Luhn/mod-97 expressions
    * applied to each arriving batch. A doc's verdict depends on its
    * own text alone (stateless — E28's class), so N micro-batches ≡
    * one-shot redaction by construction; gate shares F23's body and
    * oracle, and the MemoryStream batch drive lives in
    * StreamingSpec's foreachBatch parity spec. */
  def streamPiiStructured(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Govern.piiStructured(spark, dir)

  /** E32 `stream_robots_filter` — crawl admission at the FRONTIER'S
    * ingest edge: C40's per-row longest-prefix verdict applied to
    * each arriving link batch (the rule set is frozen batch-side —
    * robots fetches are a nightly job, not per-URL). A URL's verdict
    * depends on the frozen rules and its own canonical form alone
    * (E28/E30's stateless class), so N micro-batches ≡ one-shot by
    * construction; the gate entry IS C40's body, and the real
    * MemoryStream batch drive lives in StreamingSpec's parity spec. */
  def streamRobotsFilter(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Url.robotsFilter(spark, dir)

  /** E28 `stream_html_extract` — markup → text extraction at ingest:
    * C35's per-row regex pipeline applied to each arriving page
    * batch. A page's blocks depend on its own markup alone (no frozen
    * state at all — the most stateless entry in the E block), so N
    * micro-batches ≡ one-shot extraction by construction; the gate
    * entry IS C35's body (the E25 sharing posture), and what E28 ADDS
    * — real MemoryStream page batches through `htmlExtractOf` —
    * lives in StreamingSpec's foreachBatch drive. */
  def streamHtmlExtract(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAnalysis.htmlExtract(spark, dir)

  /** E25 `stream_bloom_dedup` — Bloom-filter dedup ADMISSION at
    * ingest: the engine-exact Bloom sidecar (C1b — ≤ 32768 int64
    * words, broadcastable) freezes batch-side over the indexed
    * corpus, and each arriving micro-batch tags statelessly
    * (`NearDup.bloomTag`): an exact duplicate of an indexed doc
    * ALWAYS flags (no false negatives — the admission guarantee), a
    * novel doc passes except with ~1e-4 FP probability, and
    * flagged-clean batches can skip the exact signature index (C4c)
    * entirely. A doc's verdict depends on the frozen bits and its own
    * normalized hash alone, so N micro-batches ≡ one-shot tagging —
    * gate hash-equal to C1b's oracle (including the deterministic
    * false positives); StreamingSpec drives real MemoryStream batches
    * splitting the re-crawl across batches and pins row parity +
    * zero false negatives. */
  def streamBloomDedup(spark: SparkSession, dir: String): DataFrame =
    // the gate entry IS C1b's freeze + stateless tag (both entries
    // share bloomDedupServeSql); what E25 ADDS over C1b — real
    // MemoryStream micro-batches through the frozen filter — lives in
    // StreamingSpec's foreachBatch drive. One body, not a copy that
    // must track it (r15 review's catch).
    graft.operators.NearDup.bloomDedupServe(spark, dir)

  /** E23 `stream_curation_audit` — the per-doc curation audit (F19)
    * applied AT INGEST: every filter stage's state freezes batch-side
    * (`Govern.curationFreeze` — the dedup index, benchmark grams, NB
    * model, DSIR pair, source blocklist: each exactly the artifact its
    * own nightly job trains), and each arriving (doc_id, text, source)
    * micro-batch gets its full five-flag verdict row statelessly
    * (`Govern.curationTag`). A doc's flags depend on the frozen states
    * and its own content alone, so N micro-batches ≡ the one-shot
    * audit — including the cross-batch case: a doc whose duplicate
    * partner arrived in a DIFFERENT batch still flags, because the
    * dedup verdict probes the frozen corpus-wide index, not the batch.
    * Gate: the replayed corpus hash-equals F19's composed oracle;
    * StreamingSpec drives real MemoryStream batches (splitting a dup
    * pair across batches) and pins row parity. */
  def streamCurationAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Gov = graft.operators.Govern
    val st = Gov.curationFreeze(spark, dir)
    Gov.curationTag(
      Tables.fanout(graft.Tables.documents(spark, dir)
        .select($"doc_id", $"text", $"source"))
        .filter($"doc_id" % Gov.BenchMod =!= 0),
      st)
  }

  /** E24 `stream_ccnet_bucket` — CCNet quality bucketing (C21b/C21c)
    * applied AT INGEST: the unigram LM and the per-lang cut points
    * freeze batch-side (the nightly bucketing job), and each arriving
    * (doc_id, lang, text) micro-batch value-buckets statelessly
    * (`ccnetServe`) — unseen tokens take the Laplace floor, a lang the
    * nightly job never saw serves `tail`. A doc's bucket depends on
    * the frozen pair and its own tokens alone, so N micro-batches ≡
    * one-shot bucketing: the gate replays the corpus against the
    * full-corpus freeze and hash-equals the value-threshold oracle;
    * StreamingSpec drives real MemoryStream batches (one carrying
    * unseen-token and unseen-lang docs) and pins row parity. */
  def streamCcnetBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val TA = graft.operators.TextAnalysis
    val docsAll = Tables.fanout(graft.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text"))
    val (counts, scal) = TA.perplexityLmFor(spark, dir)
    TA.ccnetServe(docsAll, counts, scal,
      TA.ccnetThresholdsFromBuckets(TA.ccnetBucketsFor(spark, dir)))
  }

  /** E21 `stream_decontaminate` — benchmark contamination flagging
    * (F3) applied AT INGEST: the benchmark gram set freezes batch-side
    * (`benchGramSet`, the nightly "index the benchmarks" job — tiny by
    * nature, broadcast), and each arriving training-doc micro-batch
    * flags statelessly via `decontScore` (one broadcast semi-join +
    * one per-doc count). A doc's shared-gram count depends on the
    * frozen set and its own grams alone, so N micro-batches ≡ one
    * one-shot pass: the gate replays the corpus and hash-equals F3's
    * oracle; StreamingSpec drives real MemoryStream batches through a
    * foreachBatch flagger and pins row parity plus per-batch silence
    * on clean batches. */
  def streamDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Gov = graft.operators.Govern
    val bench = Gov.benchGramSet(spark, dir)
    Gov.decontScore(
      Gov.docGrams(Tables.fanout(graft.Tables.documents(spark, dir)
        .select($"doc_id", $"text")))
        .filter($"doc_id" % Gov.BenchMod =!= 0),
      bench)
  }

  /** SCD2-style validity intervals over the per-user signup state
    * stream (valid_from = state ts, valid_to = next state ts) — the
    * pre-built dimension [[asofEnrich]] probes. The window runs over
    * the STATE table (dimension-sized, per-user partitions), never the
    * event stream. */
  private[graft] def stateIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val state = Tables.events(spark, dir)
      .filter($"event_type" === "signup")
      // one state row per (user, ts): max keeps ties deterministic —
      // the same collapse B12's asof_join applies
      .groupBy($"user_id".as("s_user_id"), $"ts".as("valid_from"))
      .agg(max($"value").as("state_value"))
    state.withColumn("valid_to",
      lead($"valid_from", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"s_user_id").orderBy($"valid_from")))
  }

  /** E7 `stream_asof_enrich` — POINT-IN-TIME-correct stream
    * enrichment: each arriving event joins the dimension version valid
    * AT ITS EVENT TIME (valid_from ≤ ts < valid_to), never a later
    * one — the feature-pipeline hygiene that prevents time-travel
    * leakage at ingest. Where B12 computes as-of semantics with a
    * custom sort-merge plan (right for batch fact-fact), the streaming
    * form probes a PRE-BUILT interval table: a stream-static join is
    * STATELESS in Structured Streaming (no watermark, no state store;
    * the static side re-plans per micro-batch, picking up dimension
    * changes), and each event matches exactly one interval. Inner
    * join — events before any state have no as-of row, exactly B12's
    * semantics — and the batch entry gates on THE SAME DuckDB native
    * ASOF JOIN oracle as B12: two independent formulations, one
    * oracle.
    *
    * The broadcast hint is deliberate and bounded: the interval table
    * is entity-keyed (one row per state CHANGE per user — the same
    * size class as E5's customer-dimension broadcast), not
    * corpus-keyed. If the dimension outgrows executor memory, drop
    * the hint: the join degrades to a per-micro-batch shuffle join —
    * more expensive, still stateless and correct — or switch to B12's
    * sort-merge as-of plan in batch. */
  def asofEnrich(events: DataFrame, intervals: DataFrame): DataFrame =
    events.join(broadcast(intervals),
        events("user_id") === intervals("s_user_id") &&
        events("ts") >= intervals("valid_from") &&
        (intervals("valid_to").isNull || events("ts") < intervals("valid_to")))
      .select(events("event_id"), events("user_id"), events("ts"),
        intervals("valid_from").as("state_ts"), intervals("state_value"))

  /** Driver-gate batch entry for E7 (oracle: [[graft.operators.AsOf
    * .asofStateJoinSql]] — DuckDB's native ASOF JOIN). */
  def streamAsofEnrich(spark: SparkSession, dir: String): DataFrame =
    asofEnrich(
      Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts")),
      stateIntervals(spark, dir))

  /** One LSH band posting of a document's MinHash signature.
    * `ts` is the post's event time (ingest time of the document) —
    * it drives the bucket-aging watermark timeout and never appears in
    * the output pairs. */
  final case class BandPost(band_idx: Int, band_sig: Long, doc_id: Long,
                            sig: Seq[Long], ts: java.sql.Timestamp)
  /** A candidate near-dup pair surfaced by a shared band bucket. */
  final case class CandPair(id1: Long, id2: Long, est_jaccard: Double)

  /** E6 `stream_near_dedup` — STREAMING MinHash-LSH near-dup
    * detection: the ingest-time form of C2, where every arriving
    * document is checked against everything already seen before it
    * lands. Documents post one (band_idx, band_sig, doc_id, signature,
    * ts) row per LSH band; posts group by the FULL bucket key
    * (band_idx, band_sig) — the same key C2's batch join buckets on,
    * stated here structurally rather than relying on the band hash
    * folding the band index in — and a stateful function keeps the
    * bucket's seen signatures, emitting a candidate pair (with the
    * signature-agreement Jaccard estimate) for each new-vs-seen
    * collision.
    *
    * State is bounded two ways: (1) buckets cap at `bucketCap`
    * signatures — a full bucket's arrivals are DRAINED in O(1) each,
    * never buffered (degenerate boilerplate stops accumulating and
    * stops emitting, C2's dropped-bucket semantics asymptotically) —
    * and when a bucket is only partially full, arrivals buffer through
    * a size-bounded heap holding at most the remaining capacity, so a
    * degenerate burst never materializes the whole group in memory;
    * (2) buckets idle past `horizon` in EVENT TIME age out via
    * `GroupStateTimeout.EventTimeTimeout` — every invocation re-arms
    * the timeout at (max post ts + horizon), and once the stream's
    * watermark passes it the bucket's state is removed, so total state
    * is O(buckets active within the horizon), independent of stream
    * length. Streaming callers must therefore `withWatermark` the
    * posts; in batch mode timeouts never fire and the same function
    * body runs unchanged.
    *
    * Batch-mode groups arrive whole with fresh state; admission in
    * doc_id order makes the pair set deterministic. Pair-set parity
    * with C2 holds exactly when no bucket exceeds the cap (the spec
    * pins this at an uncapped run): at the cap the semantics
    * intentionally DIFFER — C2 drops an oversized bucket entirely,
    * while the stream (which cannot know a bucket's final size)
    * truncates, keeping the first `bucketCap` posts by doc_id per
    * group. Pairs colliding on several bands are deduped downstream
    * (`distinct` in batch; in a stream, a second keyed stage or an
    * idempotent sink). */
  /** Bucket state: seen count carried explicitly so a full bucket's
    * drop path is O(1), not an O(cap) list traversal per arriving post
    * (the hot-key case the cap exists for). */
  final case class BucketState(n: Int, seen: List[(Long, Seq[Long])])

  /** Default pair score: matching-slot fraction of two equal-length
    * signatures (C2's est_jaccard). Static so the state closure
    * serializes without capture. */
  private def matchFraction(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }.toDouble / a.length

  /** Pair score for D6 signatures: total hamming distance over the
    * banded 64-bit perceptual hash (Σ popcount(a XOR b)). */
  private[graft] def bandHamming(a: Seq[Long], b: Seq[Long]): Double =
    a.iterator.zip(b.iterator).map { case (x, y) =>
      java.lang.Long.bitCount(x ^ y) }.sum.toDouble

  def nearDedupTyped(posts: Dataset[BandPost], bucketCap: Int = 1000,
                     horizon: java.time.Duration = java.time.Duration.ofHours(24),
                     score: (Seq[Long], Seq[Long]) => Double = matchFraction): Dataset[CandPair] = {
    import posts.sparkSession.implicits._
    val horizonMs = horizon.toMillis
    // captured by the state function: the watermark clamp below may
    // only read getCurrentWatermarkMs when one exists (streaming
    // requires it for EventTimeTimeout; batch has none and would throw)
    val isStreaming = posts.isStreaming
    posts
      .groupByKey(p => (p.band_idx, p.band_sig))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, postsIter, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed last activity + horizon: age the bucket out
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(BucketState(0, Nil))
            val room = bucketCap - st0.n
            var maxTsMs = Long.MinValue
            // admit the `room` smallest doc_ids of this group — what a
            // sort-then-truncate over the full buffer would admit, but
            // via a heap bounded by the REMAINING CAPACITY (a full
            // bucket drains at O(1) per post with zero buffering)
            val heap = scala.collection.mutable.PriorityQueue
              .empty[BandPost](Ordering.by(_.doc_id))
            postsIter.foreach { p =>
              if (p.ts != null) maxTsMs = math.max(maxTsMs, p.ts.getTime)
              if (heap.size < room) heap.enqueue(p)
              else if (room > 0 && p.doc_id < heap.head.doc_id) {
                heap.dequeue(); heap.enqueue(p)
              }
            }
            var n = st0.n
            var seen = st0.seen
            val out = scala.collection.mutable.ListBuffer.empty[CandPair]
            val admitted: Seq[BandPost] = heap.dequeueAll
            admitted.reverseIterator.foreach { p => // ascending doc_id
              seen.foreach { case (id, sig) =>
                out += CandPair(math.min(id, p.doc_id), math.max(id, p.doc_id),
                  score(sig, p.sig))
              }
              seen = (p.doc_id, p.sig) :: seen
              n += 1
            }
            // don't re-serialize an unchanged full bucket every trigger
            if (n != st0.n) state.update(BucketState(n, seen))
            // re-arm the idle timeout on EVERY invocation (Spark clears
            // an un-reset timeout): hot buckets stay alive, idle ones
            // expire once the watermark passes. No-op in batch (no
            // watermark ever advances). Anchored at max(post ts,
            // watermark): the watermark clamp keeps a backfill that
            // jumps the watermark past (ts + horizon) in one batch from
            // arming a timestamp Spark rejects as already-expired
            // (IllegalArgumentException → dead query), and it is also
            // the arm point when every post's ts is null — skipping the
            // re-arm there would CLEAR the timeout and leak the bucket
            // forever.
            if (state.exists) {
              val wmMs = if (isStreaming) state.getCurrentWatermarkMs() else 0L
              state.setTimeoutTimestamp(math.max(maxTsMs, wmMs) + horizonMs)
            }
            out.iterator
          }
      }
  }

  /** Driver-gate batch entry for E6: the C2 corpus (documents ∪ planted
    * twins) through the streaming detector in batch mode. HASH-GATED on
    * [[streamNearDedupSql]] since the signature family went md5-derived
    * (the oracle states the detector's own truncation-cap semantics —
    * see [[nearDedupTyped]] for how they intentionally differ from C2's
    * drop-bucket cap); the spec additionally pins the pair set equal to
    * C2's bucket join at an uncapped bucket size. */
  def streamNearDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDedupTyped(bandPosts(spark, dir)).toDF().distinct()
  }

  /** E6's oracle: the md5-minhash band pipeline with rank-truncation
    * cap semantics (delegates to the shared C2 oracle builder so the
    * signature definitions can never drift). */
  def streamNearDedupSql(bucketCap: Int = 1000): String =
    graft.operators.NearDup.minhashTruncatedSql(bucketCap)

  /** The C2 corpus + signature/band pipeline
    * ([[graft.operators.NearDup.corpus]]/[[graft.operators.NearDup
    * .bandTable]] — one definition for batch and stream) emitted as
    * typed posts. Event time is synthesized deterministically from
    * doc_id (the batch corpus has no ingest timestamp); a production
    * stream supplies the real ingest time here. */
  private[graft] def bandPosts(spark: SparkSession, dir: String): Dataset[BandPost] = {
    import spark.implicits._
    graft.operators.NearDup.bandTable(graft.operators.NearDup.corpus(spark, dir))
      .select($"band_idx".cast("int").as("band_idx"), $"band_sig", $"doc_id", $"sig",
        timestamp_seconds(lit(1704067200L) + $"doc_id").as("ts"))
      .as[BandPost]
  }

  /** E9 `stream_mm_dedup` — STREAMING perceptual image dedup: every
    * arriving image's aHash band values post into the SAME stateful
    * band buckets as E6 (one detector, two signature families — the
    * `score` hook turns slot-match fraction into banded hamming), so
    * a media ingest stream flags perceptual duplicates against
    * everything seen inside the state horizon. Capped-state
    * truncation semantics, event-time aging, and the batch-mode gate
    * all inherit from [[nearDedupTyped]]; the oracle states the
    * rank-truncation cap over the D6 closed-form hashes. */
  def streamMmDedup(spark: SparkSession, dir: String, maxHamming: Int = 6,
                    bucketCap: Int = 1000): DataFrame = {
    import spark.implicits._
    nearDedupTyped(phashPosts(spark, dir), bucketCap, score = bandHamming)
      .toDF()
      .distinct()
      .filter($"est_jaccard" <= maxHamming)
      .select($"id1", $"id2", $"est_jaccard".cast("int").as("hamming"))
  }

  def streamMmDedupSql(maxHamming: Int = 6, bucketCap: Int = 1000): String =
    graft.operators.Multimodal.mmPhashTruncatedSql(maxHamming, bucketCap)

  /** The D6 corpus (images ∪ noisy twins) hashed by
    * [[graft.operators.Multimodal.phashFrame]] — one definition for
    * batch and stream — emitted as typed band posts. Event time is
    * synthesized deterministically from doc_id (as [[bandPosts]]); a
    * production stream supplies the real ingest time. */
  private[graft] def phashPosts(spark: SparkSession, dir: String): Dataset[BandPost] = {
    import spark.implicits._
    val corpus = graft.operators.Multimodal.bmpTable(spark, dir)
      .select($"doc_id", $"payload")
      .unionAll(graft.operators.Multimodal.bmpTwinTable(spark, dir))
    graft.operators.Multimodal.phashFrame(corpus)
      .select($"doc_id", $"bands", posexplode($"bands"))
      .select($"pos".cast("int").as("band_idx"),
        $"col".cast("long").as("band_sig"), $"doc_id",
        expr("transform(bands, b -> cast(b as bigint))").as("sig"),
        timestamp_seconds(lit(1704067200L) + $"doc_id").as("ts"))
      .as[BandPost]
  }

  /** E10 `stream_substring_dedup` — STREAMING exact-substring dedup:
    * every arriving document's content-defined window hashes (C24's
    * family) post into the SAME stateful buckets as E6/E9 — one
    * detector, THREE signature families — so an ingest stream flags
    * verbatim-span reuse against everything seen inside the state
    * horizon. Bucket key = the window hash's first 56 md5 bits; the
    * carried signature is both 56-bit halves, so the slot-match score
    * is 1.0 for a true window match and 0.5 for a (astronomically
    * rare, but oracle-mirrored) prefix-only collision. Capped-state
    * truncation, event-time aging, and the batch-mode gate inherit
    * from [[nearDedupTyped]]. */
  def streamSubstringDedup(spark: SparkSession, dir: String,
                           bucketCap: Int = 1000): DataFrame = {
    import spark.implicits._
    nearDedupTyped(substringPosts(spark, dir), bucketCap).toDF().distinct()
  }

  def streamSubstringDedupSql(bucketCap: Int = 1000): String =
    graft.operators.NearDup.substringTruncatedSql(bucketCap)

  /** The C24 corpus + window pipeline
    * ([[graft.operators.NearDup.substringCorpus]]/[[graft.operators
    * .NearDup.substringWindows]] — one definition for batch and
    * stream) as typed posts: one post per (doc, 56-bit window-hash
    * prefix), h2 min-deduped so bucket admission order (doc_id) is
    * total. Event time synthesized from doc_id as [[bandPosts]]. */
  private[graft] def substringPosts(spark: SparkSession, dir: String): Dataset[BandPost] = {
    import spark.implicits._
    graft.operators.NearDup.substringWindows(
        graft.operators.NearDup.substringCorpus(spark, dir), 64, 8)
      .select($"doc_id",
        expr("cast(conv(substring(h, 1, 14), 16, 10) as bigint)").as("h1"),
        expr("cast(conv(substring(h, 15, 14), 16, 10) as bigint)").as("h2"))
      .groupBy($"doc_id", $"h1").agg(min($"h2").as("h2"))
      .select(lit(0).as("band_idx"), $"h1".as("band_sig"), $"doc_id",
        array($"h1", $"h2").as("sig"),
        timestamp_seconds(lit(1704067200L) + $"doc_id").as("ts"))
      .as[BandPost]
  }

  /** One (token, doc) observation for the streaming BM25 index: tf of
    * `token` in `doc_id`, with the doc's length `dl` riding along
    * (C23's no-length-join posture carried into the stream). The
    * reserved empty token is the CORPUS-STATS channel — one post per
    * document maintains (N, Σdl) in O(1) state, the index "header" a
    * real engine keeps beside its postings. */
  /** Arriving embedding row for the E12 foreachBatch appender. */
  final case class EmbRow(vec_id: Long, embedding: Seq[Float], label: Int)

  final case class TermPost(token: String, doc_id: Long, dl: Long, tf: Long)
  final case class PostingItem(doc_id: Long, dl: Long, tf: Long)
  /** One refreshed index entry, emitted whenever a batch touches the
    * token; `version` increases per refresh so a snapshot is
    * "latest version per token". Over-df-cap terms and the stats
    * channel carry empty postings. */
  final case class PostingEntry(token: String, version: Long, df: Long,
                                sum_dl: Long, postings: Seq[PostingItem])
  final case class PostingsState(version: Long, df: Long, sumDl: Long,
                                 items: List[PostingItem])

  /** E11 `stream_bm25` core — INCREMENTAL inverted-index maintenance:
    * posts group by token; each micro-batch folds its arrivals into
    * the token's posting-list state and emits the refreshed entry
    * (UPDATE semantics — an upsert into the serving index table).
    * This is the stream side of C23's retrieval surface: the
    * reference ingests batches forever (arxiv_collector per-category
    * pages) and its promised recommendation feature would serve from
    * an index maintained per batch, not rebuilt per query.
    *
    * The per-doc tf input is STATELESS to produce (a document's
    * trigram counts need only that document — one row in, its
    * TermPosts out), so the only stateful layer is this index
    * maintenance. State per token is bounded by `dfCap` items: once a
    * term's df exceeds the cap it becomes a (version, df) TOMBSTONE —
    * boilerplate terms stop accumulating state AND stop serving,
    * exactly C23's df-cap drop semantics — so total state is
    * O(vocabulary × dfCap), the index itself, not the stream. No
    * event-time timeout: a retrieval index must not forget documents
    * (contrast E6's aging buckets); production compacts snapshots to
    * persisted index tables the way [[graft.operators.Similarity
    * .ivfWrite]] does for IVF lists.
    *
    * In batch mode each token's whole history arrives as one group
    * with fresh state, so the emitted entries ARE the C23 postings
    * build — [[streamBm25]] serves them and hash-gates against
    * `bm25_retrieve`'s own oracle (finalized-batch parity, the E6/E9
    * pattern); the StreamingSpec drives MemoryStream arrivals and
    * pins snapshot-serve ≡ batch BM25 over the delivered prefix after
    * EVERY batch. */
  def bm25Postings(posts: Dataset[TermPost], dfCap: Int = 100): Dataset[PostingEntry] = {
    import posts.sparkSession.implicits._
    posts.groupByKey(_.token)
      .flatMapGroupsWithState[PostingsState, PostingEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (token, it, state: GroupState[PostingsState]) =>
          val st0 = state.getOption.getOrElse(PostingsState(0L, 0L, 0L, Nil))
          // admission in doc_id order keeps batch-mode output (and any
          // replayed batch) deterministic
          val arrivals = it.toSeq.sortBy(_.doc_id)
          if (arrivals.isEmpty) Iterator.empty
          else {
            val df1 = st0.df + arrivals.size
            val sumDl1 = st0.sumDl + arrivals.iterator.map(_.dl).sum
            val items1 =
              if (token.isEmpty || df1 > dfCap) Nil // stats channel / tombstone
              else st0.items ::: arrivals.map(p => PostingItem(p.doc_id, p.dl, p.tf)).toList
            val st1 = PostingsState(st0.version + 1, df1, sumDl1, items1)
            state.update(st1)
            Iterator.single(PostingEntry(token, st1.version, df1, sumDl1, items1))
          }
      }
  }

  /** Serve BM25 top-k from an accumulated [[PostingEntry]] table (the
    * memory-sink / upserted index): reduce to the latest version per
    * token, read (N, am) off the stats-channel entry, reconstruct the
    * (doc_id, dl, token, tf) postings, and run C23's OWN impact
    * formula and scoring tail ([[graft.operators.TextAnalysis
    * .bm25ImpactExpr]]/[[graft.operators.TextAnalysis.bm25TopK]] —
    * one definition, zero drift). The query panel derives from the
    * served postings like C23's (every `qMod`-th doc); capped terms
    * are absent here rather than dropped by the join — same surviving
    * (query, token) keys, identical scores. */
  def bm25Serve(entries: DataFrame, k: Int = 10, dfCap: Int = 100,
                qMod: Int = 20): DataFrame = {
    import entries.sparkSession.implicits._
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy($"token").orderBy($"version".desc)
    val latest = entries.withColumn("rn", row_number().over(wv)).filter($"rn" === 1)
      .localCheckpoint()
    val stats = latest.filter($"token" === "")
      .select($"df".as("n_docs"), expr("(1000 * sum_dl) div df").as("am"))
    val tfd = latest.filter($"token" =!= "" && $"df" <= dfCap)
      .select($"token", $"df", explode($"postings").as("p"))
      .select($"token", $"df", $"p.doc_id".as("doc_id"),
        $"p.dl".as("dl"), $"p.tf".as("tf"))
    val post = tfd.crossJoin(broadcast(stats))
      .select($"doc_id", $"token",
        expr(graft.operators.TextAnalysis.bm25ImpactExpr).as("impact"))
    val q = tfd.filter($"doc_id" % qMod === 0).select($"doc_id".as("query_id"), $"token")
    graft.operators.TextAnalysis.bm25TopK(post, q, k)
  }

  /** The stateless post producer: C23's tf table fanned out as term
    * posts plus the one-per-doc stats-channel post. Shared by the
    * batch gate and the spec's MemoryStream driver so the term space
    * cannot drift. */
  private[graft] def termPosts(tf: DataFrame): Dataset[TermPost] = {
    import tf.sparkSession.implicits._
    tf.select($"token", $"doc_id", $"dl", $"tf")
      .unionAll(tf.groupBy($"doc_id").agg(first($"dl").as("dl"))
        .select(lit("").as("token"), $"doc_id", $"dl", lit(1L).as("tf")))
      .as[TermPost]
  }

  /** Driver-gate batch entry for E11: the full corpus through the
    * stateful index maintainer in batch mode, then served — must
    * hash-equal `bm25_retrieve` (same oracle). */
  def streamBm25(spark: SparkSession, dir: String, k: Int = 10,
                 dfCap: Int = 100, qMod: Int = 20): DataFrame = {
    // the (memoized, checkpointed) corpus tf table feeds the
    // term-post AND stats-post branches — shared with C23/C23b/C27
    val tf = graft.operators.TextAnalysis.tfTableFor(spark, dir)
    bm25Serve(bm25Postings(termPosts(tf), dfCap).toDF(), k, dfCap, qMod)
  }

  /** E12 `stream_ivf_append` — incremental IVF index maintenance from
    * an arriving embedding stream: each micro-batch is one
    * [[graft.operators.Similarity.ivfAppend]] into the persisted index
    * (frozen centroids, touched-cell-partitions-only writes — the
    * idempotent batch-append Structured Streaming's foreachBatch sink
    * contract is built around). The vector side's counterpart to E11:
    * BM25 postings fold into token state, IVF vectors fold into cell
    * partitions; both indexes stay serveable between batches and
    * neither ever rebuilds.
    *
    * Driver-gate batch entry: the 30% id-suffix arrives as `nBatches`
    * deterministic micro-batches (vec_id mod) appended sequentially
    * into the 70%-prefix-built index, then the full panel is served
    * two-stage — graded by check.py like C7d (recall@5 vs brute force,
    * floor 0.8; appended vectors are only findable if every batch
    * landed in the right cells). Append order cannot matter: assignment
    * is per-vector against frozen centroids, so N appends ≡ one append
    * of the union — the StreamingSpec drives REAL MemoryStream arrivals
    * through foreachBatch into the same appender and pins that parity
    * exactly, plus serve-between-batches growth. */
  def streamIvfAppend(spark: SparkSession, dir: String, nBatches: Int = 3,
                      nlist: Int = 16, nprobe: Int = 10, shortlist: Int = 32,
                      k: Int = 5, nQueries: Int = 50): DataFrame = {
    import spark.implicits._
    val all = Tables.embeddings(spark, dir)
    val maxRow = all.agg(max($"vec_id")).head()
    if (maxRow.isNullAt(0))
      return Seq.empty[(Long, Long, Int, Int, Double)]
        .toDF("query_id", "neighbor_id", "cell", "rank_nn", "cosine")
    graft.sources.Lake.withScratchIndex(spark, "graft_ivf_stream") { tmp =>
      val cut = graft.operators.Similarity.prefixIvfWrite(
        spark, dir, tmp, nlist, maxRow.getLong(0))
      (0 until nBatches).foreach { b =>
        graft.operators.Similarity.ivfAppend(spark, tmp,
          all.filter($"vec_id" > cut && pmod($"vec_id", lit(nBatches)) === b))
      }
      // the maintenance loop's last step: compact the per-append file
      // fragmentation before serving (RecallSpec pins serve parity and
      // that untouched cells keep their files byte-for-byte)
      graft.operators.Similarity.ivfCompact(spark, tmp)
      graft.operators.Similarity.annIvfServe(spark, tmp,
        nprobe = nprobe, k = k, nQueries = nQueries, shortlist = Some(shortlist))
    }
  }

  /** E17 `stream_semdedup` — the SEMANTIC-dedup strike at ingest time:
    * each arriving embedding micro-batch scores against the PERSISTED
    * IVF index via [[graft.operators.Similarity.semDedupServe]]
    * (routed cells only — O(batch · nprobe/nlist) index read per
    * batch) and emits the members that semantically duplicate an
    * indexed vector, each with a recomputable exact-cosine witness.
    * The embeddings' counterpart of E15 (signature strikes) / E16
    * (line strikes): with it, every dedup family has both batch AND
    * stream maintenance. The serve is read-only on the index, so
    * batch composition provably cannot change the union of strikes —
    * N micro-batches ≡ one one-shot serve of their union, which the
    * MemoryStream spec pins through a real foreachBatch sink.
    *
    * Driver-gate batch entry: the re-crawl twin corpus arrives as
    * `nBatches` deterministic micro-batches against the base-corpus
    * index; graded like C31b (zero false strikes, strike recall). */
  def streamSemDedup(spark: SparkSession, dir: String, nBatches: Int = 3,
                     eps: Double = 0.8, nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
    if (base.agg(max($"vec_id")).head().isNullAt(0))
      return Seq.empty[(Long, Long, Double, Int)]
        .toDF("drop_id", "witness_id", "cosine", "cell")
    graft.sources.Lake.withScratchIndex(spark, "graft_semdd_stream") { tmp =>
      graft.operators.Similarity.ivfWriteFrom(base, tmp)
      val twins = graft.operators.Similarity.twinCorpus(spark, dir)
        .filter($"vec_id" >= graft.operators.NearDup.BigOffset)
        .select($"vec_id", $"embedding").localCheckpoint()
      (0 until nBatches).map { b =>
        graft.operators.Similarity.semDedupServe(spark, tmp,
          twins.filter(pmod($"vec_id", lit(nBatches)) === b), eps, nprobe)
          .localCheckpoint()
      }.reduce(_ unionAll _)
    }
  }

  /** E18 `stream_catalog_serve` — stream-side CATALOG consumption: the
    * foreachBatch serve loop re-resolves its index path per micro-batch
    * through the durable catalog, so a fleet epoch cutover lands
    * MID-STREAM and the next batch serves the new store without the
    * query restarting (the manifest lookup is metadata-scale; a pinned
    * raw path would strand the stream on a superseded — eventually
    * vacuumed — store). Batches before the cutover strike against
    * epoch-1 (the 70% reference prefix), batches after it against
    * epoch-2 (the full reference); the superseded store is VACUUMED
    * between them, so serving the later batches proves the re-resolve
    * actually happened. HASH-EQUAL to a two-context oracle: each half
    * recomputed from scratch against its own epoch's reference — df
    * caps and hot sets flip with the epoch, which is exactly what the
    * doubled CTE chain checks. The MemoryStream spec drives the same
    * re-resolving sink with the cutover between real micro-batches. */
  def streamCatalogServe(spark: SparkSession, dir: String,
                         threshold: Double = 0.5,
                         dfCap: Int = 100): DataFrame = {
    import spark.implicits._
    val NearDup = graft.operators.NearDup
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    if (NearDup.shinglePostings(docs).isEmpty)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("new_id", "ref_id", "n_inter", "jaccard")
    val cut = docs.agg(max($"doc_id")).head().getLong(0) * 7 / 10
    val neu = docs.select(($"doc_id" + NearDup.BigOffset).as("doc_id"), $"text")
    val key = s"corpus:$dir"
    graft.sources.Lake.withScratchIndex(spark, "graft_stream_cat") { cat =>
      graft.sources.Catalog.resolveOrBuild(spark, cat, "dedup_sig", key,
        stamp = "epoch-1") { d =>
        NearDup.dedupIndexWrite(Tables.fanout(docs.filter($"doc_id" <= cut)),
          d, dfCap = dfCap)
      }
      def serveBatch(b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        // the per-batch re-resolve — the whole point of the entry
        val (path, _) =
          graft.sources.Catalog.lookup(spark, cat, "dedup_sig", key).get
        NearDup.dedupServe(spark, path, Tables.fanout(b), threshold, dfCap)
          .localCheckpoint()
      }
      val before = serveBatch(neu.filter($"doc_id" % 2 === 0))
      // the cutover lands mid-stream; the old store is reclaimed, so
      // a sink that cached its path would crash — re-resolving doesn't
      graft.sources.Catalog.resolveOrBuild(spark, cat, "dedup_sig", key,
        stamp = "epoch-2") { d =>
        NearDup.dedupIndexWrite(Tables.fanout(docs), d, dfCap = dfCap)
      }
      graft.sources.Catalog.vacuum(spark, cat)
      before.unionAll(serveBatch(neu.filter($"doc_id" % 2 === 1)))
    }
  }

  /** E15 `stream_dedup_index` — incremental reference-signature-index
    * maintenance from an arriving doc stream: each micro-batch is one
    * [[graft.operators.NearDup.dedupIndexAppend]] into the persisted
    * index (commit-log batches, touched-bucket-only file appends —
    * the idempotent foreachBatch sink contract), so the nightly
    * re-crawl can be deduped against a reference that GROWS
    * continuously without ever re-shingling it. The dedup surface's
    * counterpart to E11 (BM25 postings) and E12 (IVF cells): all
    * three index families now have batch build + append + delete +
    * STREAM maintenance.
    *
    * Driver-gate batch entry: the 30% id-suffix arrives as `nBatches`
    * deterministic micro-batches appended sequentially into the
    * 70%-prefix-built index, then the full re-crawl snapshot serves
    * against it — HASH-EQUAL to `cross_dedup`'s oracle over the full
    * reference (append order cannot matter: postings are append-only
    * and serve recomputes df/sizes from the committed union;
    * StreamingSpec drives REAL MemoryStream arrivals through
    * foreachBatch into the same appender and pins that parity). */
  def streamDedupIndex(spark: SparkSession, dir: String, nBatches: Int = 3,
                       threshold: Double = 0.5, dfCap: Int = 100): DataFrame = {
    import spark.implicits._
    val ref = Tables.documents(spark, dir).select($"doc_id", $"text")
    val neu = ref.select(($"doc_id" + graft.operators.NearDup.BigOffset).as("doc_id"),
      $"text")
    // a corpus with no shingle-bearing docs writes no postings
    // partitions and a schemaless dir is unreadable — serve empty
    if (ref.filter(size(split(trim($"text"), "\\s+")) >= 3).isEmpty)
      return Seq.empty[(Long, Long, Long, Double)]
        .toDF("new_id", "ref_id", "n_inter", "jaccard")
    val cut = ref.agg(max($"doc_id")).head().getLong(0) * 7 / 10
    graft.sources.Lake.withScratchIndex(spark, "graft_dedup_stream") { tmp =>
      graft.operators.NearDup.dedupIndexWrite(
        Tables.fanout(ref.filter($"doc_id" <= cut)), tmp, dfCap = dfCap)
      (0 until nBatches).foreach { b =>
        graft.operators.NearDup.dedupIndexAppend(
          Tables.fanout(ref.filter($"doc_id" > cut &&
            pmod($"doc_id", lit(nBatches)) === b)), tmp)
      }
      graft.operators.NearDup.dedupServe(spark, tmp, Tables.fanout(neu),
        threshold, dfCap)
    }
  }

  /** E16 `stream_line_index` — incremental line-frequency-index
    * maintenance from an arriving crawl stream: each micro-batch is
    * one [[graft.operators.TextAnalysis.lineIndexAppend]] into the
    * persisted C30b index (commit-log batches, touched-bucket-only
    * appends), so the boilerplate strike for the next batch consults
    * a reference corpus that grows continuously with zero
    * re-scanning — the line family joins BM25 (E11), IVF (E12) and
    * the dedup signatures (E15) in having batch build + append +
    * delete + STREAM maintenance.
    *
    * Driver-gate batch entry: the 30% suffix of the reference arrives
    * as `nBatches` deterministic micro-batches folded into the
    * 70%-prefix-built index, then the disjoint new batch strikes
    * against it — HASH-EQUAL to `line_dedup`'s from-scratch union
    * answer restricted to the batch (order irrelevant: postings are
    * append-only, df recomputed from the committed union at serve;
    * StreamingSpec drives REAL MemoryStream arrivals through
    * foreachBatch into the same appender and pins that parity). */
  def streamLineIndex(spark: SparkSession, dir: String,
                      nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val ref = docs.filter($"doc_id" % 3 =!= 0)
    val neu = docs.filter($"doc_id" % 3 === 0)
    if (ref.isEmpty || neu.isEmpty)
      return Seq.empty[(Long, Long, Long, String)]
        .toDF("doc_id", "n_kept", "n_dropped", "clean_text")
    val cut = ref.agg(max($"doc_id")).head().getLong(0) * 7 / 10
    graft.sources.Lake.withScratchIndex(spark, "graft_line_stream") { tmp =>
      graft.operators.TextAnalysis.lineIndexWrite(
        Tables.fanout(ref.filter($"doc_id" <= cut)), tmp)
      (0 until nBatches).foreach { b =>
        graft.operators.TextAnalysis.lineIndexAppend(
          Tables.fanout(ref.filter($"doc_id" > cut &&
            pmod($"doc_id", lit(nBatches)) === b)), tmp)
      }
      graft.operators.TextAnalysis.lineDedupServe(spark, tmp, Tables.fanout(neu))
    }
  }

  /** E29 `stream_para_index` — E16 one granularity up: the
    * accumulated PARAGRAPH-df index maintained from a stream of crawl
    * batches (each micro-batch folds in with one O(batch)
    * `paraIndexAppend` — touched buckets gain files, the commit log
    * gains one row, nothing rewrites), then a new crawl batch strikes
    * against the accumulated state. N appends ≡ one big append for df
    * purposes (df counts distinct docs; batch composition is
    * invisible), so the serve HASH-EQUALS the from-scratch paragraph
    * dedup on (reference ∪ batch) restricted to the batch. */
  def streamParaIndex(spark: SparkSession, dir: String,
                      nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val ref = docs.filter($"doc_id" % 3 =!= 0)
    val neu = docs.filter($"doc_id" % 3 === 0)
    if (ref.isEmpty || neu.isEmpty)
      return Seq.empty[(Long, Long, Long, String)]
        .toDF("doc_id", "n_kept", "n_dropped", "clean_text")
    val cut = ref.agg(max($"doc_id")).head().getLong(0) * 7 / 10
    val TA = graft.operators.TextAnalysis
    graft.sources.Lake.withScratchIndex(spark, "graft_para_stream") { tmp =>
      TA.paraIndexWrite(Tables.fanout(ref.filter($"doc_id" <= cut)), tmp)
      (0 until nBatches).foreach { b =>
        TA.paraIndexAppend(Tables.fanout(ref.filter($"doc_id" > cut &&
          pmod($"doc_id", lit(nBatches)) === b)), tmp)
      }
      TA.paraDedupServe(spark, tmp, Tables.fanout(neu))
    }
  }

  /** E31 `stream_kn_append` — the C21i LM count store maintained from
    * a STREAM of crawl batches: each micro-batch folds its own bigram
    * counts in as one O(batch) commit-last delta (`knStoreAppend`), a
    * retraction batch lands as negated counts, and the merged LM
    * after N micro-batches is EXACTLY the one-shot LM — counts are
    * additive integers, so batch composition is invisible by
    * construction. Gate: initial write + nBatches id-sliced appends +
    * one retraction, then score the survivors from the store —
    * hash-equal to the from-scratch C21e oracle on the survivors
    * (C21i's own oracle). The StreamingSpec drives the same fold
    * through real MemoryStream micro-batches. */
  def streamKnAppend(spark: SparkSession, dir: String,
                     nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    val TA = graft.operators.TextAnalysis
    val docs = Tables.fanout(Tables.documents(spark, dir)
      .select($"doc_id", $"text")).localCheckpoint()
    if (docs.isEmpty)
      return Seq.empty[(Long, Long, Double, Double)]
        .toDF("doc_id", "n_bigrams", "bits_per_bigram", "kn_ppl")
    graft.sources.Lake.withScratchIndex(spark, "graft_kn_stream") { tmp =>
      TA.knStoreWrite(docs.filter($"doc_id" % 10 < 6), tmp)
      (0 until nBatches).foreach { b =>
        TA.knStoreAppend(docs.filter($"doc_id" % 10 >= 6 &&
          pmod($"doc_id", lit(nBatches)) === b), tmp)
      }
      TA.knStoreRetract(docs.filter($"doc_id" % 7 === 0), tmp)
      TA.knStoreScore(spark, tmp, docs.filter($"doc_id" % 7 =!= 0))
    }
  }

  /** E13 `stream_scd2_apply` — the reference's history table grows
    * row-by-row forever (create_table.sql:85-107, arxiv_etl.py:84-111);
    * this is that growth as a STREAM of change batches folded into a
    * maintained SCD2 interval table: each micro-batch runs A16's
    * one-plan MERGE core ([[graft.operators.Scd.scd2ApplyOf]] — close
    * affected keys' open intervals, continue version numbering, append)
    * against the table state the previous batch left, exactly the
    * foreachBatch MERGE loop a lakehouse runs continuously. The base is
    * checkpointed between folds (the persisted-table read each real
    * batch starts from), so every batch's work is one base pass-through
    * + a change-batch-sized shuffle — never a recompute.
    *
    * Driver-gate batch entry: events split into `nBatches` global
    * event-time windows (strict integer-micros boundaries, so each
    * batch is provably later than every earlier event of its keys —
    * scd2ApplyOf's contract), window 0 builds the base, the rest fold
    * in sequence. HASH-GATED on A15's from-scratch oracle: N folded
    * merges must reproduce the full-history interval table exactly,
    * through an independent engine. The StreamingSpec drives the same
    * fold through real MemoryStream micro-batches. */
  def streamScd2Apply(spark: SparkSession, dir: String, nBatches: Int = 3): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
    val bnd = ev.agg(min($"us").as("mn"), max($"us").as("mx"))
    // eager: every fold's batch filters this frame — materialized
    // once, or each fold would re-scan events and re-run the boundary
    // aggregate (in production each change batch is its own input;
    // the window tagging exists only to derive batches from one table)
    val tagged = ev.crossJoin(broadcast(bnd))
      .withColumn("win", least(lit(nBatches - 1),
        expr(s"((us - mn) * $nBatches) div (mx - mn + 1)")).cast("int"))
      .select($"user_id", $"event_id", $"event_type", $"ts", $"win")
      .localCheckpoint()
    def batch(b: Int): DataFrame = tagged.filter($"win" === b).drop("win")
    var base = graft.operators.Scd.intervalsOf(batch(0))
    (1 until nBatches).foreach { b =>
      base = graft.operators.Scd.scd2ApplyOf(base.localCheckpoint(), batch(b))
    }
    base
  }

  /** E14 `stream_upsert_sink` — A6's first-writer-wins merge as an
    * external DELIVERY path: the incoming snapshot arrives as
    * `nBatches` micro-batches, each folded into a parquet-backed
    * keyed store through [[graft.sources.UpsertSink.writeBatch]] —
    * idempotent replay (a batch id delivered twice is skipped whole),
    * ON-CONFLICT-DO-NOTHING key semantics, per-attempt write ids with
    * a commit-last log row, bounded exponential-backoff retry. This
    * is the reference's actual endpoint posture (pg_engine.py:104-125
    * idempotent inserts + retry loop) where A6 is only the merge
    * QUERY.
    *
    * Driver-gate batch entry: base lands as batch 0, the incoming
    * batches 1..n follow, then one batch REDELIVERS (the foreachBatch
    * replay case — must be a no-op). HASH-GATED on A6's own oracle:
    * the store's committed view must equal the one-shot upsert_merge
    * exactly. StreamingSpec drives the same sink through real
    * MemoryStream micro-batches with an injected transient failure
    * between the row write and the log commit. */
  def streamUpsertSink(spark: SparkSession, dir: String, nBatches: Int = 3,
                       maxAttempts: Int = 3, initialDelayMs: Long = 50): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val base = o.filter($"o_orderkey" % 3 =!= 0)
      .select($"o_orderkey", $"o_totalprice", lit("base").as("src"))
    val incoming = o.filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", ($"o_totalprice" * lit(1.1)).as("o_totalprice"),
        lit("incoming").as("src"))
    graft.sources.Lake.withScratchIndex(spark, "graft_upsert_sink") { tmp =>
      def land(df: DataFrame, id: Long): Unit =
        graft.sources.UpsertSink.writeBatch(df, tmp, id, Seq("o_orderkey"),
          maxAttempts, initialDelayMs)
      land(base, 0L)
      (0 until nBatches).foreach { b =>
        land(incoming.filter(pmod($"o_orderkey", lit(nBatches)) === b), b + 1L)
      }
      // foreachBatch replay: redelivering an applied batch id is a no-op
      land(incoming.filter(pmod($"o_orderkey", lit(nBatches)) === 1), 2L)
      graft.sources.UpsertSink.committedRows(spark, tmp)
        .select($"o_orderkey", $"o_totalprice", $"src")
    }
  }

  /** Driver-gate batch entry for E2 — hash-gated on B8's window
    * oracle via [[streamSessionizeSql]] (the two formulations compute
    * identical sessions). */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Ev]
    sessionizeTyped(evs).toDF()
  }

  /** The stateful sessionizer and B8's declarative window sessionizer
    * compute the same sessions, so the typed path gates on B8's OWN
    * oracle with the value aggregate projected away (derived, not
    * copied — a future change to B8's oracle semantics flows through
    * automatically) — the strongest possible check for a stateful
    * operator: hash-equality against an independent engine's window
    * formulation. */
  def streamSessionizeSql(gapMinutes: Int = 30): String =
    s"""SELECT user_id, session_idx, n_events, session_start, session_end
       |FROM (${graft.operators.Analytics.sessionizeSql(gapMinutes)})""".stripMargin
}
