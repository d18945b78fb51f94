package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization operators (batch + streaming).
  *
  * Two implementations of gap-based sessions:
  *  - [[sessionWindowAgg]]: Spark's built-in `session_window` aggregation —
  *    the declarative form; works in batch and (with a watermark) streaming.
  *  - [[statefulSessions]]: custom per-key state via `flatMapGroupsWithState`
  *    (SURVEY §2.7 extension / builder spec: KeyValueGroupedDataset custom
  *    state) — emits a session as soon as a later event closes it, carrying
  *    open sessions across micro-batches in managed state.
  *
  * Both agree with the window-function batch sessionizer (EntryOps.sessionize),
  * INCLUDING each key's final session: the batch path flushes it at
  * end-of-input (the group function sees a key's full history exactly once),
  * and the streaming path closes it on event-time timeout when the watermark
  * passes `last_us + gap`. SessionizeSpec cross-checks the three.
  */
object Sessionize {

  final case class SessEvent(user_id: Long, event_id: Long, ts_us: Long)

  /** Managed per-key state. `n_events == 0` is the "no session open" sentinel
    * kept after a timeout flush so `session_num` stays monotone for the key's
    * whole lifetime (it then holds the NEXT session number). The sentinel is a
    * few dozen bytes per key — the price of batch-consistent numbering; a
    * deployment that doesn't need it can `state.remove()` instead.
    */
  final case class OpenSession(
      session_num: Long, start_us: Long, last_us: Long, n_events: Long)
  final case class ClosedSession(
      user_id: Long, session_num: Long, n_events: Long, start_us: Long,
      duration_sec: Long)

  /** Built-in session_window aggregation: one shuffle by key, windows merged by
    * the engine. `events` needs (user_id, ts timestamp) columns.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("win"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .withColumn("duration_sec",
        ((col("end_us") - col("start_us")) / lit(1000000L)).cast("long"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("duration_sec"))

  /** Custom-state sessionizer: closes a session when a subsequent event for the
    * same key arrives more than `gapUs` later, when the event-time watermark
    * passes `last_us + gapUs` (streaming; `GroupStateTimeout.EventTimeTimeout`
    * set from `lateness`), or at end-of-input (batch). Open sessions persist in
    * `GroupState` across micro-batches. Events later than `lateness` are
    * dropped by the watermark (streaming only).
    */
  def statefulSessions(
      events: Dataset[SessEvent],
      gapUs: Long = 30L * 60 * 1000000,
      lateness: String = "0 seconds"
  ): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val sessEnc = Encoders.product[SessEvent]
    implicit val longEnc = Encoders.scalaLong

    // captured by the update closure: batch mode flushes trailing sessions at
    // end-of-input; streaming mode leaves them to the event-time timeout
    val streaming = events.isStreaming

    def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, s.session_num, s.n_events, s.start_us,
        (s.last_us - s.start_us) / 1000000L)

    def update(userId: Long, batch: Iterator[SessEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (streaming && state.hasTimedOut) {
        // watermark passed last_us + gap: the open session is final — emit it
        // and keep only the numbering sentinel (no new timeout)
        val open = state.getOption.filter(_.n_events > 0)
        open.foreach(s =>
          state.update(OpenSession(s.session_num + 1, 0L, 0L, 0L)))
        open.map(close(userId, _)).iterator
      } else {
        val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
        var open = state.getOption.filter(_.n_events > 0)
        val nextNum = state.getOption match {
          case Some(s) if s.n_events == 0 => s.session_num // sentinel holds next
          case _ => 1L
        }
        val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
        sorted.foreach { e =>
          open match {
            case Some(s) if e.ts_us - s.last_us <= gapUs =>
              open = Some(s.copy(last_us = e.ts_us, n_events = s.n_events + 1))
            case Some(s) =>
              closed += close(userId, s)
              open = Some(OpenSession(s.session_num + 1, e.ts_us, e.ts_us, 1))
            case None =>
              open = Some(OpenSession(nextNum, e.ts_us, e.ts_us, 1))
          }
        }
        if (streaming) {
          open.foreach { s =>
            state.update(s)
            // never earlier than the current watermark (setTimeoutTimestamp
            // rejects that); a session already past the gap flushes on the
            // next micro-batch's timeout sweep
            state.setTimeoutTimestamp(
              math.max((s.last_us + gapUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
          }
        } else {
          // batch: the group function sees the key's entire input exactly once,
          // so end of iterator IS end-of-stream — flush the trailing session
          open.foreach(s => closed += close(userId, s))
        }
        closed.iterator
      }
    }

    val prepared =
      if (streaming)
        events
          .withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", lateness)
          .as[SessEvent]
      else events

    prepared
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(update)
  }
}
