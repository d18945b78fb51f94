package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the k smallest distinct strings — the bottom-k
  * sketch behind winnowing-style document fingerprints (ops.TextAnalysis) and a
  * mergeable alternative to sort+slice: partial buffers combine
  * associatively, so Spark runs it as a two-phase (map-side partial) aggregate
  * with no per-group sort shuffle.
  *
  * Register per session via `BottomK.register(spark, k)` and call as
  * `bottom_k(col)` in SQL, or use `BottomK.udaf(k)` with the DataFrame API.
  */
final case class BottomK(k: Int) extends Aggregator[String, List[String], Seq[String]] {
  override def zero: List[String] = Nil

  override def reduce(buf: List[String], v: String): List[String] =
    if (v == null) buf else insert(buf, v)

  override def merge(a: List[String], b: List[String]): List[String] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[String], v: String): List[String] = {
    if (buf.contains(v)) buf
    else {
      val merged = (v :: buf).sorted
      if (merged.length > k) merged.take(k) else merged
    }
  }

  override def finish(buf: List[String]): Seq[String] = buf.sorted

  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object BottomK {
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(BottomK(k))

  def register(spark: org.apache.spark.sql.SparkSession, k: Int,
      name: String = "bottom_k"): Unit =
    spark.udf.register(name, udaf(k))
}
