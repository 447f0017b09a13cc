package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream.
  *
  * The transforms are plain DataFrame -> DataFrame functions, so the SAME
  * code serves batch (oracle-checked in EventOps) and streaming (exercised
  * via a file source + memory sink in StreamingSpec). That symmetry is the
  * point: rule primitives and aggregations compose into readStream ->
  * transform -> writeStream without modification.
  */
object EventStreams {

  /** Tumbling-window counts + revenue per event type. With a watermark the
    * state store evicts windows older than 10 minutes past the max seen ts —
    * bounded state at any scale.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // 2-decimal money: exact integer-cents sum on the long fast path
        (sum(floor(col("value") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-window mergeable HLL user sketches — the streaming half of
    * q140's sketch-algebra pattern: the stream maintains one ~4 KB
    * DataSketches HLL state per hour window (bounded however many users
    * flow through), and OFFLINE consumers answer distinct-user questions
    * over ANY window range by `hll_union_agg` over the stored sketches,
    * never re-reading events. Works identically in batch and streaming
    * (the spec pins batch == stream and merged-estimate accuracy).
    */
  def windowedUserSketches(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_agg(col("user_id")).as("user_sketch"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("user_sketch"),
        col("n_events"))

  /** Sliding-window event counts (1 h window, 15 min slide: each event lands
    * in 4 windows). Batch twin: q75_sliding_window.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("n_users_approx"))
      .select(col("window.start").as("ws"), col("n_events"), col("n_users_approx"))

  /** Ingest-time exact dedup: first occurrence of each `event_id` wins,
    * with state bounded by the watermark — the streaming half of the
    * corpus dedup story (batch exact dedup: q40). On a streaming frame
    * this is `dropDuplicatesWithinWatermark`: unlike plain
    * `dropDuplicates`, whose key state grows forever, the state store
    * evicts an id once the watermark passes its event time, so the
    * operator runs indefinitely at ingest scale on the (realistic)
    * assumption that a duplicate arrives within the lateness bound. On a
    * batch frame the watermark is a no-op and this is plain
    * `dropDuplicates` — the exact-equivalence oracle the spec compares
    * (same ids, one row per id).
    */
  def dedupedEvents(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream interval join: clicks attributed to a later purchase by
    * the same user within 10 minutes. Watermarks on BOTH sides bound the
    * join state (Spark evicts buffered rows once the other side's watermark
    * passes the range) — the 100 TB streaming-join shape. On batch inputs
    * the watermarks are no-ops and this is a plain range join (the pair-set
    * the spec compares against q73's aggregation).
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    // truncate to whole seconds so the pair set matches q73's epoch-second
    // arithmetic EXACTLY (raw-µs comparison differs on sub-second
    // boundaries); truncation keeps TimestampType, so watermarks still work
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        date_trunc("second", col("ts")).as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        date_trunc("second", col("ts")).as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"))
  }

  /** Stream-static enrichment: each micro-batch of events joins the
    * STATIC `customer` dimension (re-read at its current snapshot every
    * batch, broadcast by size) and aggregates per (hour, market
    * segment) — the canonical streaming-enrichment shape. The join
    * itself is stateless (only the static side is buffered, as a
    * broadcast); all streaming state lives in the downstream windowed
    * aggregate, bounded by the watermark. Works identically on batch
    * inputs (watermark no-op) — the oracle-checked twin is
    * q107_stream_static_join.
    */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
             else events
    in.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5).cast("long"))
          .cast("double") / 100.0).as("total_value"))
      .select(col("window.start").as("hour_start"),
        col("c_mktsegment").as("segment"), col("n"), col("total_value"))
  }

  final case class EventRow(user_id: Long, ts_sec: Long)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  // public: the state encoder's generated code must reach the accessors
  final case class SessionState(lastTs: Long, sessions: Long, events: Long)

  /** Stateful sessionization via mapGroupsWithState: a new session starts
    * when the gap exceeds `gapSec`. Works on batch Datasets too (state is
    * then per-group-single-shot), which is how the spec pins semantics.
    *
    * Late-data contract (shared by [[SessionProcessor]] and
    * [[sessionSpans]]): rows are sorted within each trigger, but a row
    * arriving in a LATER micro-batch with an older event time must not
    * move the session clock backwards — `lastTs` advances monotonically
    * (max), and a late row is absorbed into the current session (counted,
    * never session-opening). Exact late-row session attribution would
    * need the full per-key history; a monotone clock is the bounded-state
    * compromise, and it makes results independent of which trigger a
    * late row lands in.
    */
  def sessionize(events: Dataset[EventRow], gapSec: Long = 1800): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_sec)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { r =>
            val newSession = st.lastTs == Long.MinValue || r.ts_sec - st.lastTs > gapSec
            st = SessionState(math.max(st.lastTs, r.ts_sec),
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          SessionSummary(userId, st.sessions, st.events)
      }
  }

  /** Spark 4 `transformWithState` sessionizer: the same gap semantics as
    * [[sessionize]], expressed as a [[StatefulProcessor]] with typed
    * [[org.apache.spark.sql.streaming.ValueState]] — the modern
    * arbitrary-state API (per-state-variable storage, TTL support,
    * timers) that replaces mapGroupsWithState. Streaming runs require
    * the RocksDB state store provider; the spec pins its per-user
    * output against q51's batch result across two micro-batches.
    */
  class SessionProcessor(gapSec: Long = 1800)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, SessionSummary] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, TimerValues}
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var state: ss.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("sess",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[SessionSummary] = {
      val sorted = rows.toSeq.sortBy(_.ts_sec)
      var st = if (state.exists()) state.get()
               else SessionState(Long.MinValue, 0L, 0L)
      sorted.foreach { r =>
        val newSession =
          st.lastTs == Long.MinValue || r.ts_sec - st.lastTs > gapSec
        // monotone clock: a late row from a later trigger never moves
        // lastTs backwards (see sessionize's late-data contract)
        st = SessionState(math.max(st.lastTs, r.ts_sec),
          st.sessions + (if (newSession) 1 else 0), st.events + 1)
      }
      state.update(st)
      Iterator.single(SessionSummary(key, st.sessions, st.events))
    }
  }

  final case class SessionSpan(user_id: Long, start_sec: Long, end_sec: Long,
      n_events: Long)
  final case class SpanState(startTs: Long, lastTs: Long, events: Long)

  /** Timer-driven idle-session finalizer: the transformWithState TIMER
    * surface ([[SessionProcessor]] covers values-only state). Each input
    * row extends the user's open span and re-arms an EVENT-TIME timer
    * `idleMs` past the span's last event; when the watermark passes it
    * with no intervening activity, the span is EMITTED ONCE and the
    * state cleared — the "flush idle sessions without waiting for the
    * user's next event" shape that gap-based sessionizers (q51/q121)
    * cannot express, because their sessions only close when a LATER
    * event of the same key proves the gap. Event-time (not
    * processing-time) timers deliberately: expiry is driven by the
    * watermark, so results are deterministic and replayable, and an
    * idle QUERY doesn't spin micro-batches just to poll wall-clock
    * timers. State per key is one span + one armed timer — bounded at
    * any scale, and expired keys leave the store entirely (the timer
    * is the TTL).
    */
  class IdleSessionProcessor(idleMs: Long = 2000L)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventRow, SessionSpan] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders, streaming => ss}
    @transient private var span: ss.ValueState[SpanState] = _
    @transient private var armed: ss.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      span = getHandle.getValueState[SpanState]("span",
        Encoders.product[SpanState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timers: TimerValues): Iterator[SessionSpan] = {
      var st = if (span.exists()) span.get() else null
      rows.toSeq.sortBy(_.ts_sec).foreach { r =>
        st = if (st == null) SpanState(r.ts_sec, r.ts_sec, 1L)
          else SpanState(st.startTs, math.max(st.lastTs, r.ts_sec),
            st.events + 1L)
      }
      if (st != null) {
        span.update(st)
        // re-arm: drop the previous timer so exactly one is pending
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        val at = st.lastTs * 1000L + idleMs // event-time ms
        getHandle.registerTimer(at)
        armed.update(at)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionSpan] = {
      val out = if (span.exists()) {
        val st = span.get()
        Iterator.single(SessionSpan(key, st.startTs, st.lastTs, st.events))
      } else Iterator.empty
      span.clear()
      armed.clear()
      out
    }
  }

  /** flatMapGroupsWithState: emit one row per CLOSED session (a gap >
    * `gapSec` closes the open span). The open span stays in state — it can
    * only close when later data proves the gap — so each user's final
    * session is intentionally never emitted. Append-mode streamable; state
    * is one small record per user.
    */
  def sessionSpans(events: Dataset[EventRow], gapSec: Long = 1800): Dataset[SessionSpan] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SpanState, SessionSpan](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SpanState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_sec)
          val closed = Seq.newBuilder[SessionSpan]
          var st = state.getOption.orNull
          sorted.foreach { r =>
            if (st == null) st = SpanState(r.ts_sec, r.ts_sec, 1L)
            else if (r.ts_sec - st.lastTs > gapSec) {
              closed += SessionSpan(userId, st.startTs, st.lastTs, st.events)
              st = SpanState(r.ts_sec, r.ts_sec, 1L)
            } else st = SpanState(st.startTs, // monotone clock (late rows)
              math.max(st.lastTs, r.ts_sec), st.events + 1L)
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }
}
