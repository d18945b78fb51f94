package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** Per-frame statistics TABLE for (possibly animated) GIF payloads: one
  * struct per image block — placement rectangle plus exact channel sums of
  * that frame's own pixels — decoded by the same from-spec LZW walker as
  * [[GifAnimFeatures]]. Exploding the result turns a media corpus into a
  * queryable FRAME table (the real-decode sibling of the m03 byte-slice
  * frame sampler): per-frame aggregation, frame-count filters, and
  * scene-change-style deltas all become plain relational ops downstream.
  *
  * Returns null (not an empty array) when the payload is not a GIF or any
  * frame is malformed — `explode` then drops the asset, and
  * `explode_outer` keeps it as a null row; both are honest refusals.
  *
  * Output element: `struct<frame_idx, left, top, width, height, n_pixels,
  * sum_r, sum_g, sum_b>`. The expression itself stays a narrow per-row map
  * in the scan stage; the row multiplication happens in the downstream
  * generator, locally, with no shuffle.
  */
case class GifFrameStats(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = GifFrameStats.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    GifFrameStats.decode(input.asInstanceOf[Array[Byte]])

  // NOT defineCodeGen: decode() returns null on refusal, and defineCodeGen's
  // generated consumer would dereference it — propagate it as SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifFrameStats.decode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): GifFrameStats =
    copy(child = newChild)

  override def prettyName: String = "gif_frame_stats"
}

object GifFrameStats {

  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("left", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  val schema: DataType = ArrayType(frameSchema, containsNull = false)

  /** Static entry point shared by interpreted eval and generated code:
    * ArrayData of frame structs, or null on refusal.
    */
  def decode(b: Array[Byte]): ArrayData = {
    val (isGif, _, _, frames) = GifAnimFeatures.walk(b)
    if (!isGif || frames == null) return null
    val rows = new Array[Any](frames.length)
    var i = 0
    while (i < frames.length) {
      val f = frames(i)
      rows(i) = new GenericInternalRow(Array[Any](
        i.toLong, f(0), f(1), f(2), f(3), f(2) * f(3), f(4), f(5), f(6)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def apply(c: Column): Column =
    GraftBridge.column(GifFrameStats(GraftBridge.expression(c)))
}
