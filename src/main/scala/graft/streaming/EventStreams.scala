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
        sum(col("value").cast("decimal(28,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class EventRow(user_id: Long, ts_sec: Long)
  final case class SessionSummary(user_id: Long, n_sessions: Long, n_events: Long)
  // public: the state encoder's generated code must reach the accessors
  final case class SessionState(lastTs: Long, sessions: Long, events: Long)

  /** Stateful sessionization via mapGroupsWithState: a new session starts
    * when the gap exceeds `gapSec`. Works on batch Datasets too (state is
    * then per-group-single-shot), which is how the spec pins semantics.
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
            st = SessionState(r.ts_sec,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          SessionSummary(userId, st.sessions, st.events)
      }
  }
}
