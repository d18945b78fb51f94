package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel-level decode of uncompressed Windows BMP — the last image
  * format [[MediaDims]] sniffs that had no pixel decoder (netpbm, PNG,
  * GIF and JPEG all decode for real): BITMAPFILEHEADER ("BM", the pixel
  * array offset at byte 10), 40-byte BITMAPINFOHEADER (LE width; SIGNED
  * height — negative means top-down row order, which cannot change a
  * channel SUM but must still size-check), `BI_RGB` only, bit depths 24
  * (BGR triples) and 8 (palette indices into the BGRA color table that
  * follows the info header, `biClrUsed` entries or 256 when zero). Rows
  * pad to 4-byte boundaries; sums traverse every pixel of the actual
  * payload bytes.
  *
  * Honest refusals (format "bmp", header dims kept where readable, null
  * stats): any compression ≠ BI_RGB (RLE4/RLE8/BITFIELDS…), bit depths
  * other than 8/24, planes ≠ 1, OS/2 or V4/V5 DIB headers (different
  * layouts — a misread factory if forced through the V3 offsets), palette
  * indices past the declared table, zero/overflow dimensions, or a pixel
  * array that overruns the payload. Non-"BM" bytes are "unknown".
  *
  * Output matches [[PpmFeatures]]' contract: `struct<format, width,
  * height, maxval, n_pixels, sum_r, sum_g, sum_b>` (maxval is 255 — BMP
  * channels are 8-bit in both accepted depths). One codegen'd per-row
  * call in the scan stage; payloads never shuffle.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque bodies and
  * never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal).
  */
case class BmpFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = BmpFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    BmpFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BmpFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): BmpFeatures =
    copy(child = newChild)

  override def prettyName: String = "bmp_features"
}

object BmpFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("maxval", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](7)(null)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    le16(b, i).toLong | (le16(b, i + 2).toLong << 16)

  private def le32s(b: Array[Byte], i: Int): Long = le32(b, i).toInt.toLong

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 2 || b(0) != 'B' || b(1) != 'M') return row("unknown", nulls.clone())
    if (n < 54) return row("bmp", nulls.clone())
    val pixOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize != 40) return row("bmp", nulls.clone()) // core/V4/V5: refuse
    val w = le32s(b, 18)
    val hRaw = le32s(b, 22)
    val h = if (hRaw < 0) -hRaw else hRaw // top-down order: sums unaffected
    // header "facts" are only facts when sane: a malformed negative/zero
    // dimension is reported as NULL, not echoed as a negative value (r9
    // ADVICE) — positive-but-absurd dims (the 2^20 bound) stay reported
    def partial(): InternalRow =
      row("bmp", Array[Any](if (w > 0) w else null, if (h > 0) h else null,
        null, null, null, null, null))
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (w <= 0 || h <= 0 || w > (1L << 20) || h > (1L << 20)) return partial()
    if (planes != 1 || compression != 0L) return partial()
    if (bpp != 24 && bpp != 8) return partial()
    var palOff = 0
    var palN = 0
    if (bpp == 8) {
      val clrUsed = le32(b, 46)
      palN = if (clrUsed == 0L) 256 else clrUsed.toInt
      if (palN < 0 || palN > 256) return partial()
      palOff = 54 // color table follows BITMAPINFOHEADER immediately
      if (palOff + 4L * palN > n || pixOff < palOff + 4L * palN) return partial()
    } else if (pixOff < 54) return partial()
    val bytesPerPx = bpp / 8
    val rowBytes = ((w * bytesPerPx + 3) / 4) * 4
    if (pixOff + rowBytes * h > n) return partial() // truncated pixel array
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var p = (pixOff + y * rowBytes).toInt
      var x = 0L
      while (x < w) {
        if (bpp == 24) { // BGR order on disk
          sb += b(p) & 0xff
          sg += b(p + 1) & 0xff
          sr += b(p + 2) & 0xff
          p += 3
        } else {
          val idx = b(p) & 0xff
          if (idx >= palN) return partial() // index past the color table
          val e = palOff + 4 * idx // BGRA palette entries
          sb += b(e) & 0xff
          sg += b(e + 1) & 0xff
          sr += b(e + 2) & 0xff
          p += 1
        }
        x += 1
      }
      y += 1
    }
    row("bmp", Array[Any](w, h, 255L, w * h, sr, sg, sb))
  }

  def apply(c: Column): Column =
    GraftBridge.column(BmpFeatures(GraftBridge.expression(c)))
}
