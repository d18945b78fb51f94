package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric arrays whose elements are FLOAT or
  * DOUBLE in any combination, accumulating in double with a FIXED
  * left-to-right fold — numerically identical to
  * `aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  * 0d, +)` and to the DuckDB oracle's `list_reduce` mirror, but a codegen'd
  * primitive loop instead of per-element interpreted lambda evaluation.
  *
  * [[DotProductF32]] covers the float×float hot path (s01-s05, d05/d06);
  * this is its mixed/double sibling for the quantizer machinery, where one
  * side is a float sub-vector/embedding and the other a refined DOUBLE
  * centroid/codebook entry (refinedAssignment scoring, PQ/IVF-PQ
  * assignment, ADC lookup tables, SemDeDup centroid cosine): the heaviest
  * HOF folds in the s06-s10/d16/d22/e05 plans. Element types are fixed at
  * plan time, so the generated code carries constant branch flags the JIT
  * folds away.
  *
  * Same equal-length contract as [[DotProductF32]] (every caller zips
  * same-dimension vectors by construction); `zip_with`'s null-padding
  * behavior on ragged arrays is deliberately NOT reproduced.
  */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_fd expects array<float|double> on both sides, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductFD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductFD.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFD =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_fd"
}

object DotProductFD {
  /** Static entry point shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column = GraftBridge.column(
    DotProductFD(GraftBridge.expression(a), GraftBridge.expression(b)))
}
