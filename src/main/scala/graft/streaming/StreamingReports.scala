package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-native report variants (SURVEY §2.7 extension): the reference
  * evaluates its daily report cron-style over stored rows; these keep the same
  * aggregates continuously up to date as stateful streaming aggregations with
  * watermarked event-time windows, for deployments that want the report feed as
  * a live table rather than a nightly batch.
  */
object StreamingReports {

  /** Tumbling-window hits-by-request over a (possibly streaming) apache event
    * frame: the streaming form of Q1 (apache_access.py:59-69). Late data beyond
    * `lateness` is dropped by the watermark; state is bounded per (window,
    * reqline).
    */
  def windowedHits(events: DataFrame, window: String = "24 hours",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("timestamp", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("timestamp"), window)
        .as("win"), col("reqline"))
      .agg(count(lit(1)).as("qty"),
        sum(col("bytesin")).as("sum_bytesin"),
        sum(col("bytesout")).as("sum_bytesout"))
      .select(col("win.start").as("window_start"), col("reqline"),
        col("qty"), col("sum_bytesin"), col("sum_bytesout"))

  /** Streaming attempts-by-IP (Q2 shape, authfail.py:34-39). */
  def windowedAttempts(events: DataFrame, window: String = "24 hours",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("timestamp", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("timestamp"), window)
        .as("win"), col("src_addr"))
      .agg(count(lit(1)).as("qty"))
      .select(col("win.start").as("window_start"), col("src_addr"), col("qty"))
}
