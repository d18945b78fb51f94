package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Container-format sniffing over a binary media payload's leading bytes:
  * `struct<format string, width long, height long>` — the first real ask of a
  * multimodal training-data pipeline (image dimensions without any codec).
  * Pure header-byte arithmetic, no decoding:
  *
  *  - PNG: 8-byte signature, then the IHDR chunk is mandated first, so
  *    width/height are the big-endian u32s at bytes 16-19 / 20-23;
  *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height are the
  *    little-endian u16s at bytes 6-7 / 8-9;
  *  - BMP: "BM", dispatched on the DIB header-size field (LE u32 at byte
  *    14): the BITMAPINFOHEADER family (40/52/56/64/108/124) stores
  *    width/height as little-endian SIGNED i32s at bytes 18-21 / 22-25
  *    (height < 0 = top-down row order — emitted raw, the caller owns the
  *    abs()); the OS/2 BITMAPCOREHEADER (12) stores them as LE u16s at
  *    bytes 18-19 / 20-21; any other header size yields "bmp" with null
  *    dims rather than silently misreading field offsets;
  *  - JPEG: FF D8 FF, then a marker-segment walk to the first SOF frame
  *    header (C0-C3/C5-C7/C9-CB/CD-CF), whose payload carries height then
  *    width as big-endian u16s; a stream that reaches SOS/EOI or runs out
  *    before any SOF yields format "jpeg" with null dims;
  *  - anything else: format "unknown", null dims.
  *
  * One codegen'd per-row call; on a columnar asset table this runs inside the
  * scan stage with only (payload) read — metadata extraction at 100 TB never
  * shuffles and never decodes. (No media libs exist in the build sandbox, and
  * none are needed: these are specified fixed-offset header fields.)
  */
case class MediaDims(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = MediaDims.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    MediaDims.parseHeader(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaDims.parseHeader($c)")

  override protected def withNewChildInternal(newChild: Expression): MediaDims =
    copy(child = newChild)

  override def prettyName: String = "media_dims"
}

object MediaDims {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true)))

  private def row(fmt: String, w: Any, h: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))

  /** Static entry point shared by interpreted eval and generated code. */
  def parseHeader(b: Array[Byte]): InternalRow = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Long = ((u(i) << 8) | u(i + 1)).toLong
    def be32(i: Int): Long =
      ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)) & 0xffffffffL
    def le16(i: Int): Long = (u(i) | (u(i + 1) << 8)).toLong
    def le32s(i: Int): Long = // signed (BMP top-down heights are negative)
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)).toLong

    if (n >= 24 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G' &&
        u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a)
      row("png", be32(16), be32(20))
    else if (n >= 10 && u(0) == 'G' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == '8' && (u(4) == '7' || u(4) == '9') && u(5) == 'a')
      row("gif", le16(6), le16(8))
    else if (n >= 26 && u(0) == 'B' && u(1) == 'M') {
      le32s(14) match {
        case 12L => row("bmp", le16(18), le16(20)) // OS/2 BITMAPCOREHEADER
        case 40L | 52L | 56L | 64L | 108L | 124L =>
          row("bmp", le32s(18), le32s(22)) // BITMAPINFOHEADER family
        case _ => row("bmp", null, null) // unknown DIB header: don't misread
      }
    }
    else if (n >= 4 && u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) {
      // marker-segment walk: FF [FF fill...] marker [len_hi len_lo payload]
      var i = 2
      while (i + 1 < n) {
        if (u(i) != 0xff) return row("jpeg", null, null) // desynced stream
        var j = i
        while (j < n && u(j) == 0xff) j += 1 // skip fill bytes
        if (j >= n) return row("jpeg", null, null)
        val m = u(j)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i = j + 1 // standalone
        else if (m == 0xd9 || m == 0xda) return row("jpeg", null, null) // EOI/SOS first
        else {
          if (j + 2 >= n) return row("jpeg", null, null)
          val segLen = ((u(j + 1) << 8) | u(j + 2))
          val isSof = (m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 7 >= n) return row("jpeg", null, null)
            return row("jpeg", be16(j + 6), be16(j + 4)) // payload: precision, height, width
          }
          if (segLen < 2) return row("jpeg", null, null)
          i = j + 1 + segLen
        }
      }
      row("jpeg", null, null)
    } else row("unknown", null, null)
  }

  def apply(c: Column): Column =
    GraftBridge.column(MediaDims(GraftBridge.expression(c)))
}
