package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Map-side quantizer assignment: given a vector and a (small, broadcast)
  * candidate array `array<struct<cid: bigint, cent: array<float|double>>>`
  * SORTED by cid ascending, returns the cid of the maximum-score candidate:
  *
  *   score = ⟨v, cent⟩                    (halfNorm = false; max-inner-product)
  *   score = ⟨v, cent⟩ − ⟨cent, cent⟩/2   (halfNorm = true;  argmin-L2 monotone form)
  *
  * with every dot the same fixed left-to-right double fold as
  * [[DotProductFD]], and ties resolved to the SMALLEST cid (strict-greater
  * replacement over the cid-ascending array) — element-for-element the
  * semantics of the former
  * `groupBy(...).agg(max_by(cid, struct(score, -cid)))` formulation, which
  * Spark could only express as a crossJoin fan-out (N·K rows) followed by a
  * hash-aggregate SHUFFLE that carried the full vector payload
  * (`first(embedding)`) through the exchange. At corpus scale that shuffle
  * is N·K·vectorBytes; this expression makes assignment a pure projection:
  * candidates broadcast (K rows — the quantizer codebook), vectors never
  * leave their scan partition. The DuckDB oracles are unchanged — they
  * mirror the max_by formulation, and the two are bitwise-identical
  * (strict `>` on identically-computed doubles; NaN scores cannot arise
  * from finite inputs).
  *
  * Returns -1 for an empty candidate array (the old formulation dropped
  * the row instead — callers guarantee non-empty codebooks, and a loud
  * sentinel beats a silent join-away).
  *
  * With `returnIndex = true` the winner's POSITION in the candidate array
  * is returned instead of its cid — the dense 0..K−1 code the flat-PQ
  * layout stores so ADC can index a flattened lookup table directly
  * (position order equals cid order in a cid-sorted array, so tie-break
  * semantics are unchanged).
  */
case class ArgmaxDot(left: Expression, right: Expression, halfNorm: Boolean,
    returnIndex: Boolean = false)
    extends BinaryExpression {

  private def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def candElem(t: DataType): Option[StructType] = t match {
    case ArrayType(s: StructType, _) if s.length == 2 => Some(s)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val candOk = candElem(right.dataType).exists(s =>
      s.fields(0).dataType == LongType && vecOk(s.fields(1).dataType))
    if (vecOk(left.dataType) && candOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "argmax_dot expects (array<float|double>, array<struct<bigint, " +
        s"array<float|double>>>), got ${left.dataType.simpleString} and " +
        right.dataType.simpleString)
  }

  private def svFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centFloat: Boolean =
    candElem(right.dataType).get.fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any, cands: Any): Any =
    ArgmaxDot.argmax(v.asInstanceOf[ArrayData], cands.asInstanceOf[ArrayData],
      svFloat, centFloat, halfNorm, returnIndex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.ArgmaxDot.argmax($v, $c, $svFloat, $centFloat, " +
        s"$halfNorm, $returnIndex)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "argmax_dot"
}

object ArgmaxDot {
  /** Static entry point shared by interpreted eval and generated code. */
  def argmax(v: ArrayData, cands: ArrayData, svFloat: Boolean,
      centFloat: Boolean, halfNorm: Boolean,
      returnIndex: Boolean = false): Long = {
    var bestCid = -1L
    var best = 0.0d
    var any = false
    var k = 0
    val nc = cands.numElements()
    while (k < nc) {
      val c = cands.getStruct(k, 2)
      val cid = if (returnIndex) k.toLong else c.getLong(0)
      val cent = c.getArray(1)
      val n = math.min(v.numElements(), cent.numElements())
      var acc = 0.0d
      var i = 0
      while (i < n) {
        val x = if (svFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val y = if (centFloat) cent.getFloat(i).toDouble else cent.getDouble(i)
        acc += x * y
        i += 1
      }
      var score = acc
      if (halfNorm) {
        var cc = 0.0d
        val m = cent.numElements()
        var j = 0
        while (j < m) {
          val y = if (centFloat) cent.getFloat(j).toDouble else cent.getDouble(j)
          cc += y * y
          j += 1
        }
        score = acc - cc / 2
      }
      if (!any || score > best) { any = true; best = score; bestCid = cid }
      k += 1
    }
    bestCid
  }

  def apply(v: Column, cands: Column, halfNorm: Boolean): Column =
    apply(v, cands, halfNorm, returnIndex = false)

  def apply(v: Column, cands: Column, halfNorm: Boolean,
      returnIndex: Boolean): Column =
    GraftBridge.column(ArgmaxDot(GraftBridge.expression(v),
      GraftBridge.expression(cands), halfNorm, returnIndex))
}
