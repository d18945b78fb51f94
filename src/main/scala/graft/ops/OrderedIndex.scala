package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed deterministic surrogate-id assignment: global rank in
  * `sortCols` order WITHOUT a single-partition window.
  *
  * `row_number().over(Window.orderBy(...))` funnels the entire dataset through
  * one task (Spark plans an Exchange SinglePartition) — fine for a 1,500-row
  * dimension, a scale-killer for a large merge batch. This helper instead:
  *
  *   1. range-partitions by the sort key (distributed sort, P-way parallel),
  *   2. sorts within partitions,
  *   3. assigns `offset + global position + 1` via `zipWithIndex`, whose
  *      per-partition offsets are the cumulative partition counts (one tiny
  *      count job over the SAME partitioned RDD — boundaries are computed once
  *      by the range partitioner, so the count and data passes agree).
  *
  * The assigned id equals `offset + row_number() OVER (ORDER BY sortCols)`
  * whenever `sortCols` is a unique key — same semantics, no 1-task bottleneck
  * (reference serial-id semantics: maillog.py:66-78).
  */
object OrderedIndex {

  def withOrderedId(
      df: DataFrame,
      sortCols: Seq[Column],
      idName: String,
      offset: Long = 0L
  ): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema.add(StructField(idName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (offset + i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
