package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Typed views over the parsed event frames (SURVEY §1.4: `Dataset[T]` with
  * case-class encoders for the ingest path; DataFrames for the relational
  * query surface). The records mirror the parser outputs (pre-surrogate-id).
  */
final case class ParsedApache(
    timestamp: Timestamp,
    host: String,
    port: Option[Int],
    src_addr: String,
    authuser: String,
    bytesin: Option[Long],
    bytesout: Option[Long],
    microsecs: Option[Long],
    status: Option[Int],
    reqline: String,
    method: String,
    path: String,
    protocol: String,
    referer: String,
    user_agent: String
)

final case class ParsedAuthfail(timestamp: Timestamp, username: String, src_addr: String)

object Typed {
  def apache(parsed: DataFrame): Dataset[ParsedApache] =
    parsed.as[ParsedApache](Encoders.product[ParsedApache])

  def authfail(parsed: DataFrame): Dataset[ParsedAuthfail] =
    parsed.as[ParsedAuthfail](Encoders.product[ParsedAuthfail])
}
