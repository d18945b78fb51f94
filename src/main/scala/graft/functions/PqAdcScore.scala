package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Flat-PQ asymmetric-distance score from the codes-as-array layout: given
  * a candidate's dense code array (`codes[m]` = position of its assigned
  * centroid in sub-space m's cid-sorted codebook) and one query's lookup
  * tables (`p[m][code]` = ⟨q_m, cent⟩, `n[m][code]` = ⟨cent, cent⟩, both in
  * the same cid-sorted candidate order), returns the reconstruction cosine
  *
  *   (Σ_m p[m][codes[m]]) / sqrt(Σ_m n[m][codes[m]])
  *
  * with both sums folded in m-ascending order — bitwise-identical to the
  * former row-form pipeline (codes exploded to (vec, m, code) rows, joined
  * to a (query, m, code) LUT, then collect_list + array_sort + interpreted
  * fold per (query, candidate) group), whose join fanned out N·M·Q rows
  * into a wide shuffle and whose per-group sort/fold dominated the s07/s09
  * query path. Here a candidate costs M array reads + M adds as a pure
  * projection: codes never explode, nothing shuffles until the per-query
  * top-k. This is the PQ paper's actual memory layout (N×M dense codes,
  * tables indexed by code).
  *
  * An out-of-range code (possible only for the -1 empty-codebook sentinel)
  * returns NaN — loud in the ranking rather than silently dropped.
  */
case class PqAdcScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def codesOk = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def lutOk(t: DataType) = t match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (codesOk && lutOk(second.dataType) && lutOk(third.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc_score expects (array<bigint>, array<array<double>>, " +
        s"array<array<double>>), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(c: Any, p: Any, n: Any): Any =
    PqAdcScore.score(c.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData],
      n.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, p, n) =>
      s"graft.functions.PqAdcScore.score($c, $p, $n)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdcScore =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "pq_adc_score"
}

object PqAdcScore {
  /** Static entry point shared by interpreted eval and generated code. */
  def score(codes: ArrayData, p: ArrayData, n: ArrayData): Double = {
    val m = codes.numElements()
    var sp = 0.0d
    var sn = 0.0d
    var i = 0
    while (i < m) {
      val code = codes.getLong(i)
      if (i >= p.numElements() || i >= n.numElements()) return Double.NaN
      val pm = p.getArray(i)
      val nm = n.getArray(i)
      if (code < 0 || code >= pm.numElements() || code >= nm.numElements())
        return Double.NaN
      sp += pm.getDouble(code.toInt)
      sn += nm.getDouble(code.toInt)
      i += 1
    }
    sp / math.sqrt(sn)
  }

  def apply(codes: Column, p: Column, n: Column): Column =
    GraftBridge.column(PqAdcScore(GraftBridge.expression(codes),
      GraftBridge.expression(p), GraftBridge.expression(n)))
}
