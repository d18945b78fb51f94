package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessEvent

/** Cross-checks the three sessionizers (window-function batch, built-in
  * session_window, custom flatMapGroupsWithState) and exercises state carried
  * across micro-batches.
  */
class SessionizeSpec extends GraftSpec {
  import spark.implicits._

  test("session_window aggregation agrees with the window-function sessionizer") {
    val sfDir = "/root/testdata/sf0.001"
    val viaWindowFn = graft.EntryOps.sessionize(spark, sfDir)
      .select("user_id", "n_events", "start_us", "duration_sec")
      .as[(Long, Long, Long, Long)].collect().toSet
    val viaSessionWindow = Sessionize.sessionWindowAgg(
        Tables.events(spark, sfDir), "30 minutes")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaSessionWindow === viaWindowFn)
    assert(viaWindowFn.nonEmpty)
  }

  test("stateful sessionizer closes sessions on gap within a batch") {
    val events = Seq(
      SessEvent(1, 1, 0L),
      SessEvent(1, 2, 60L * 1000000),            // +1 min, same session
      SessEvent(1, 3, 45L * 60 * 1000000),       // +45 min gap -> closes s1
      SessEvent(2, 4, 0L)                        // other user, stays open
    ).toDS()
    val closed = Sessionize.statefulSessions(events).collect()
    assert(closed.toSeq === Seq(
      Sessionize.ClosedSession(1, 1, 2, 0L, 60L)))
  }

  test("stateful sessionizer carries open sessions across micro-batches") {
    val in = Files.createTempDirectory("sess-in")
    // batch 1: open a session for user 7; batch 2: an event past the gap
    // closes it — emitted in the SECOND micro-batch via persisted GroupState
    Files.writeString(in.resolve("b1.csv"), "7,1,0\n7,2,120000000\n")
    Files.writeString(in.resolve("b2.csv"), "7,3,9000000000\n")
    // the file source orders by modification time — make b1 strictly older
    Files.setLastModifiedTime(in.resolve("b1.csv"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val stream = spark.readStream
      .schema("user_id LONG, event_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", "1")
      .csv(in.toString)
      .as[SessEvent]
    val q = Sessionize.statefulSessions(stream)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("sess-ck").toString)
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sessions_out")
      .as[Sessionize.ClosedSession].collect().toSeq
    assert(rows === Seq(Sessionize.ClosedSession(7, 1, 2, 0L, 120L)))
  }
}
