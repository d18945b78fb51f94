package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-code table sum: Σ_m table[m][codes[m]] folded in m-ascending
  * order — the building block of every ADC variant over the codes-as-array
  * layout ([[PqAdcScore]] fuses two of these for flat PQ; IVF-PQ composes
  * (qc + Σp) / sqrt(c2 + Σw) from two separate sums because the qc/c2
  * terms are per-(query, cell) scalars). Bitwise-identical to the former
  * row-form collect_list + array_sort + interpreted fold per
  * (query, candidate) group; per candidate it is M array reads + M adds
  * as a pure projection. Out-of-range codes (the -1 empty-codebook
  * sentinel) return NaN — loud in the ranking, never silently dropped.
  */
case class PqTableSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val tableOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && tableOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_table_sum expects (array<bigint>, array<array<double>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(c: Any, t: Any): Any =
    PqTableSum.sum(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) =>
      s"graft.functions.PqTableSum.sum($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqTableSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_table_sum"
}

object PqTableSum {
  /** Static entry point shared by interpreted eval and generated code. */
  def sum(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0d
    var i = 0
    while (i < m) {
      if (i >= table.numElements()) return Double.NaN
      val code = codes.getLong(i)
      val tm = table.getArray(i)
      if (code < 0 || code >= tm.numElements()) return Double.NaN
      acc += tm.getDouble(code.toInt)
      i += 1
    }
    acc
  }

  def apply(codes: Column, table: Column): Column =
    GraftBridge.column(PqTableSum(GraftBridge.expression(codes),
      GraftBridge.expression(table)))
}
