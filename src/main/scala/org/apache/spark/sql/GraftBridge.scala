package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters so the engine can
  * expose native Catalyst expressions as `Column`s (Spark 4 moved `Column` to
  * sql-api; `classic.ExpressionUtils` is the supported internal shim).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`, but `ExpectsInputTypes.
    * inputTypes` is typed in terms of it — alias it out so the engine's
    * native expressions can declare their input types.
    */
  type AbsDataType = org.apache.spark.sql.types.AbstractDataType
}
