package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / builder spec: "skewed keys → salting
  * or AQE skew-join").
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; aggregation
  * skew (one hot group key receiving most rows) still serializes on one
  * reducer. `saltedAgg` splits each key into `numSalts` sub-keys for the first
  * (parallel) partial aggregation and re-aggregates the partials — correct for
  * any commutative/associative aggregate expressed as (partial, final) pairs.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    *
    * @param saltSource a column whose hash spreads rows of the same key (any
    *                   high-cardinality column; falls back to input partition id)
    */
  def saltedSumCount(
      df: DataFrame,
      key: Column,
      value: Column,
      saltSource: Option[Column] = None,
      numSalts: Int = 16
  ): DataFrame = {
    val salt = pmod(
      saltSource.map(hash(_)).getOrElse(spark_partition_id()), lit(numSalts))
    df.groupBy(key.as("key"), salt.as("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("qty"))
  }
}
