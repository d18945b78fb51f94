package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit Morton (Z-order) key: interleaves the low 32 bits of two longs so
  * that sorting by the key clusters rows that are close in BOTH dimensions.
  * The layout lever behind multi-column data skipping at 100 TB: a
  * single-column sort gives perfect min/max pruning on one predicate column
  * and none on the second; a Z-order sort gives useful pruning on both,
  * because each parquet file covers a small rectangle of the 2-D key space
  * instead of a full-width slice (the technique behind Delta/Iceberg
  * OPTIMIZE ZORDER, implemented here from the public bit-interleaving
  * construction).
  *
  * Codegen'd per-row expression — the classic parallel-prefix bit spread,
  * five mask-and-shift rounds per operand, no loops, no allocation.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes { // INT literals coerce
  override def dataType: DataType = LongType

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKey.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder_key"
}

object ZOrderKey {

  /** Spread the low 32 bits of `x` to the even bit positions (0, 2, 4, …). */
  def spread(x0: Long): Long = {
    var x = x0 & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: `a`'s bits on even positions, `b`'s on odd. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(ZOrderKey(GraftBridge.expression(a), GraftBridge.expression(b)))
}
