package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel-level decode of a COMPRESSED image format with zero codec
  * libraries: PNG is zlib (RFC 1950/1951 — `java.util.zip.Inflater` ships in
  * the JDK) over per-scanline delta filters that are ~80 lines of
  * public-spec arithmetic (PNG spec §9, "Filtering"). This closes the last
  * multimodal stub: m04 reads container headers, m05 decodes uncompressed
  * netpbm rasters, and this expression decodes actual DEFLATE-compressed
  * pixel data — signature → chunk walk (CRC-verified for the chunks
  * consumed) → IHDR → inflate(IDAT) → unfilter(None/Sub/Up/Average/Paeth)
  * → exact per-channel integer sums.
  *
  * Scope (honest-refusal pattern, like [[PpmFeatures]]'s maxval ≥ 256 rule):
  * 8-bit, non-interlaced, grayscale (color type 0) or truecolor RGB (color
  * type 2). Anything else a conformant reader could meet — 16-bit, palette,
  * alpha channels, Adam7 interlace — yields format "png" with header dims
  * and null pixel stats, never a misread. Integrity is enforced where it
  * protects the STATS: chunk CRCs of IHDR/IDAT are verified (ancillary
  * chunks are skipped by length without CRC checks — their content is never
  * used), the zlib adler32 is verified by `Inflater`, and the inflated
  * raster must be exactly `height·(stride+1)` bytes.
  *
  * Output: `struct<format, width, height, color_type, n_pixels, sum_r,
  * sum_g, sum_b>` — integer channel sums (gray reports its one channel in
  * all three slots), exact and order-independent, so the DuckDB oracle can
  * reproduce them from the fixture formulas without a PNG codec. One
  * per-row call in the scan stage: pixel statistics at 100 TB never shuffle
  * anything but the per-asset struct.
  */
case class PngFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = PngFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    PngFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PngFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): PngFeatures =
    copy(child = newChild)

  override def prettyName: String = "png_features"
}

object PngFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("color_type", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](7)(null)

  /** Rasters above this bound are refused rather than decoded: the inflated
    * scanline buffer must fit one JVM array, and a single task materializing
    * gigabytes for one asset is an operational hazard, not a feature. 256
    * MiB covers every sane training image; the honest-refusal row keeps the
    * pipeline total-function.
    */
  private val MaxRasterBytes = 256L << 20

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 8 || (b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' ||
        b(3) != 'G' || b(4) != 0x0d || b(5) != 0x0a || b(6) != 0x1a || b(7) != 0x0a)
      return row("unknown", nulls.clone())

    def u(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      ((u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)) & 0xffffffffL

    // ---- chunk walk: IHDR must come first; concatenate IDAT payloads ----
    var w = -1L; var h = -1L
    var bitDepth = -1; var colorType = -1; var interlace = -1
    var compression = -1; var filterMethod = -1
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done) {
      if (i + 8 > n) return pngRefusal(sawIhdr, w, h, colorType) // truncated chunk header
      val len = be32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > n)
        return pngRefusal(sawIhdr, w, h, colorType) // length runs past the buffer
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val dataOff = i + 8
      val dataLen = len.toInt
      if (!sawIhdr) {
        // spec: IHDR is the first chunk, 13 bytes
        if (typ != "IHDR" || dataLen != 13 || !crcOk(b, i + 4, dataLen + 4, be32(dataOff + dataLen)))
          return row("png", nulls.clone())
        w = be32(dataOff)
        h = be32(dataOff + 4)
        bitDepth = u(dataOff + 8)
        colorType = u(dataOff + 9)
        compression = u(dataOff + 10)
        filterMethod = u(dataOff + 11)
        interlace = u(dataOff + 12)
        sawIhdr = true
      } else typ match {
        case "IDAT" =>
          if (!crcOk(b, i + 4, dataLen + 4, be32(dataOff + dataLen)))
            return pngRefusal(sawIhdr, w, h, colorType)
          idat.write(b, dataOff, dataLen)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip by length; its content is unused
      }
      i = dataOff + dataLen + 4
    }

    if (w <= 0 || h <= 0 || compression != 0 || filterMethod != 0)
      return pngRefusal(sawIhdr = true, w, h, colorType)
    // supported raster family; everything else refuses with dims intact
    if (bitDepth != 8 || interlace != 0 || (colorType != 0 && colorType != 2))
      return pngRefusal(sawIhdr = true, w, h, colorType)
    val bpp = if (colorType == 2) 3 else 1
    val stride = w * bpp // w ≤ 2^32: fits a long
    // overflow-safe size guard BEFORE the product: h·(stride+1) can exceed
    // a Long for adversarial 2^32-ish header dims, so compare by division
    if (stride + 1 > MaxRasterBytes / h)
      return pngRefusal(sawIhdr = true, w, h, colorType)
    val rawLen = h * (stride + 1) // ≤ MaxRasterBytes by the guard above

    // ---- inflate: full zlib stream (Inflater verifies the adler32) ----
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      var made = 1
      while (off < raw.length && made > 0 && !inf.finished()) {
        made = inf.inflate(raw, off, raw.length - off)
        off += made
      }
      // strict: exactly the expected raster, stream fully consumed
      if (off != raw.length || !inf.finished() || inf.inflate(new Array[Byte](1)) != 0)
        return pngRefusal(sawIhdr = true, w, h, colorType)
    } catch {
      case _: java.util.zip.DataFormatException =>
        return pngRefusal(sawIhdr = true, w, h, colorType)
    } finally inf.end()

    // ---- unfilter (PNG spec §9) + channel sums in one pass ----
    val st = stride.toInt
    val prev = new Array[Byte](st) // zero row above the first scanline
    val cur = new Array[Byte](st)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val base = (y * (st + 1)).toInt
      val ft = raw(base) & 0xff
      if (ft > 4) return pngRefusal(sawIhdr = true, w, h, colorType)
      var x = 0
      while (x < st) {
        val f = raw(base + 1 + x) & 0xff
        val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
        val up = prev(x) & 0xff
        val upLeft = if (x >= bpp) prev(x - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case _ => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            f + pred
        }
        cur(x) = (rec & 0xff).toByte
        if (bpp == 3) {
          (x % 3) match {
            case 0 => sr += rec & 0xff
            case 1 => sg += rec & 0xff
            case _ => sb += rec & 0xff
          }
        } else sr += rec & 0xff
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, st)
      y += 1
    }
    if (bpp == 1) { sg = sr; sb = sr } // gray: one channel in all three slots
    row("png", Array[Any](w, h, colorType.toLong, w * h, sr, sg, sb))
  }

  /** Valid-signature-but-undecodable rows keep whatever header facts were
    * established (dims/color type once IHDR parsed) and null the stats.
    */
  private def pngRefusal(sawIhdr: Boolean, w: Long, h: Long, ct: Int): InternalRow =
    if (!sawIhdr || w <= 0 || h <= 0) row("png", nulls.clone())
    else row("png", Array[Any](w, h, ct.toLong, w * h, null, null, null))

  private def crcOk(b: Array[Byte], off: Int, len: Int, expected: Long): Boolean = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue == expected
  }

  def apply(c: Column): Column =
    GraftBridge.column(PngFeatures(GraftBridge.expression(c)))
}
