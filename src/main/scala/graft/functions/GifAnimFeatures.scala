package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Frame-SEQUENCE decode of animated GIFs — the closest thing to a real
  * video decode achievable with zero codec libraries: a GIF animation is a
  * genuine multi-frame moving-picture container, and every frame's pixel
  * data is LZW-compressed exactly like the stills [[GifFeatures]] decodes.
  * This expression walks ALL image blocks (not just the first), decoding
  * each frame's raster through the same from-spec variable-width LZW
  * machinery, and reports frame count plus exact per-channel sums over
  * every painted pixel of every frame.
  *
  * Semantics: statistics are over the pixels each frame PAINTS (a frame may
  * legally cover a sub-rectangle of the logical screen — the standard
  * animation delta encoding; `n_pixels` totals exactly what was summed).
  * Disposal/composition state (what the screen looks like between frames)
  * is presentation semantics, not ingest statistics, and is deliberately
  * out of scope. Local per-frame palettes are honored; interlace is
  * accepted (row order cannot change a sum). Any malformed frame — missing
  * palette, out-of-range index, bad or truncated LZW, frame rectangle
  * outside the screen — refuses the whole payload (header fields survive,
  * stats null): never a misread.
  *
  * Output: `struct<format, width, height, n_frames, n_pixels, sum_r,
  * sum_g, sum_b>`. One codegen'd per-row call in the scan stage, like all
  * the media decoders.
  */
case class GifAnimFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = GifAnimFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    GifAnimFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GifAnimFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): GifAnimFeatures =
    copy(child = newChild)

  override def prettyName: String = "gif_anim_features"
}

object GifAnimFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](7)(null)

  import GifFeatures.{le16, lzwDecode}

  /** Shared frame walker: (isGif, w, h, frames) where `frames` is null on
    * any malformation; each frame = Array(left, top, iw, ih, sumR, sumG,
    * sumB). EOF without a trailer is tolerated (like most readers) iff at
    * least one frame decoded cleanly.
    */
  private[functions] def walk(b: Array[Byte]): (Boolean, Long, Long, Array[Array[Long]]) = {
    val n = b.length
    if (n < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return (false, 0L, 0L, null)
    val w = le16(b, 6).toLong
    val h = le16(b, 8).toLong
    val packed = b(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 7)
    val acc = scala.collection.mutable.ArrayBuffer[Array[Long]]()
    def refuse(): (Boolean, Long, Long, Array[Array[Long]]) = (true, w, h, null)
    def done(): (Boolean, Long, Long, Array[Array[Long]]) =
      if (acc.nonEmpty) (true, w, h, acc.toArray) else refuse()
    var i = 13
    val gctOff = i
    if (hasGct) {
      i += 3 * gctSize
      if (i > n) return refuse()
    }
    while (i < n) {
      (b(i) & 0xff) match {
        case 0x21 =>
          i += 2
          while (i < n && b(i) != 0) i += 1 + (b(i) & 0xff)
          i += 1
          if (i > n) return refuse()
        case 0x2c =>
          if (i + 10 > n) return refuse()
          val left = le16(b, i + 1).toLong; val top = le16(b, i + 3).toLong
          val iw = le16(b, i + 5).toLong; val ih = le16(b, i + 7).toLong
          val p2 = b(i + 9) & 0xff // interlace accepted: sums are order-free
          val hasLct = (p2 & 0x80) != 0
          val lctSize = 2 << (p2 & 7)
          i += 10
          val (palOff, palSize) =
            if (hasLct) { val o = i; i += 3 * lctSize; (o, lctSize) }
            else (gctOff, gctSize)
          if (i > n || (!hasGct && !hasLct)) return refuse()
          // the frame rectangle must sit inside the logical screen
          if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h)
            return refuse()
          if (i >= n) return refuse()
          val minCode = b(i) & 0xff; i += 1
          var total = 0
          var j = i
          while (j < n && b(j) != 0) {
            val len = b(j) & 0xff
            if (j + 1 + len > n) return refuse()
            total += len; j += 1 + len
          }
          if (j >= n) return refuse()
          val data = new Array[Byte](total)
          var p = i; var q = 0
          while (p < n && b(p) != 0) {
            val len = b(p) & 0xff
            System.arraycopy(b, p + 1, data, q, len)
            q += len; p += 1 + len
          }
          i = j + 1 // past the sub-block terminator — walk continues
          val nPix = iw * ih
          if (nPix > Int.MaxValue) return refuse()
          val indices = lzwDecode(data, minCode, nPix.toInt)
          if (indices == null) return refuse()
          var sr = 0L; var sg = 0L; var sb = 0L
          var k = 0
          while (k < indices.length) {
            val idx = indices(k) & 0xff
            if (idx >= palSize) return refuse()
            val o = palOff + 3 * idx
            sr += b(o) & 0xff; sg += b(o + 1) & 0xff; sb += b(o + 2) & 0xff
            k += 1
          }
          acc += Array(left, top, iw, ih, sr, sg, sb)
        case 0x3b => return done()
        case _ => return refuse()
      }
    }
    done()
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val (isGif, w, h, frames) = walk(b)
    if (!isGif) return row("unknown", nulls.clone())
    if (frames == null)
      return row("gif", Array[Any](w, h, null, null, null, null, null))
    var pixels = 0L; var sr = 0L; var sg = 0L; var sb = 0L
    frames.foreach { f =>
      pixels += f(2) * f(3); sr += f(4); sg += f(5); sb += f(6)
    }
    row("gif", Array[Any](w, h, frames.length.toLong, pixels, sr, sg, sb))
  }

  def apply(c: Column): Column =
    GraftBridge.column(GifAnimFeatures(GraftBridge.expression(c)))
}
