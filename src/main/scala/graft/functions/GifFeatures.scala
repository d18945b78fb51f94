package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel-level decode of GIF images — the second genuinely COMPRESSED
  * format decoded with zero codec libraries (PNG's DEFLATE came from the
  * JDK's zlib; GIF's LZW has no JDK binding, so the variable-width LZW
  * decompressor here is implemented from the public GIF87a/89a spec):
  * header + logical-screen parse, extension-block walk, image descriptor,
  * sub-block reassembly, LSB-first variable-width code stream with CLEAR /
  * END handling, dictionary growth (KwKwK case included) up to the 12-bit
  * cap, palette mapping, and exact per-channel integer sums over the
  * decoded pixels.
  *
  * Honest-refusal rules (format + readable header fields survive, stats are
  * null — never a misread): a frame that is not the full logical screen, a
  * missing palette (neither global nor local), palette indices out of
  * range, codes beyond the dictionary, truncated or ragged streams, pixel
  * over/underflow, no image block. Only the FIRST image of an animation is
  * decoded (n_pixels states what was summed). INTERLACED images are
  * decoded, not refused: Adam-style interlace only permutes scanline
  * order, and per-channel sums are row-order-invariant — no de-interlacing
  * pass is needed for correct statistics (the JDK's own encoder writes
  * interlaced by default, so the ImageIO parity spec covers this path).
  *
  * Output: `struct<format, width, height, palette_size, n_pixels, sum_r,
  * sum_g, sum_b>` — integer sums, order-independent, mirrorable in the
  * DuckDB oracle. One codegen'd per-row call in the scan stage: pixel
  * statistics at 100 TB never shuffle anything but the per-asset struct.
  */
case class GifFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = GifFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    GifFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GifFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): GifFeatures =
    copy(child = newChild)

  override def prettyName: String = "gif_features"
}

object GifFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("palette_size", LongType, nullable = true),
    StructField("n_pixels", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](7)(null)

  private[functions] def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
        (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return row("unknown", nulls.clone())
    val w = le16(b, 6).toLong
    val h = le16(b, 8).toLong
    val packed = b(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 7)
    def partial(pal: Any): InternalRow =
      row("gif", Array[Any](w, h, pal, null, null, null, null))
    var i = 13
    val gctOff = i
    if (hasGct) {
      i += 3 * gctSize
      if (i > n) return row("gif", nulls.clone())
    }
    // block walk: extensions (0x21) are skipped, first image (0x2C) decoded
    while (i < n) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: introducer + label, then sub-blocks to 0
          i += 2
          while (i < n && b(i) != 0) i += 1 + (b(i) & 0xff)
          i += 1
          if (i > n) return partial(if (hasGct) gctSize.toLong else null)
        case 0x2c =>
          if (i + 10 > n) return partial(if (hasGct) gctSize.toLong else null)
          val left = le16(b, i + 1); val top = le16(b, i + 3)
          val iw = le16(b, i + 5).toLong; val ih = le16(b, i + 7).toLong
          val p2 = b(i + 9) & 0xff
          // interlace (0x40) is accepted: row order does not change sums
          val hasLct = (p2 & 0x80) != 0
          val lctSize = 2 << (p2 & 7)
          i += 10
          val (palOff, palSize) =
            if (hasLct) { val o = i; i += 3 * lctSize; (o, lctSize) }
            else (gctOff, gctSize)
          val palAny: Any = palSize.toLong
          if (i > n || (!hasGct && !hasLct)) return partial(null)
          // refuse what would be misread: a frame smaller than the screen
          // sums only part of the image while reporting screen dimensions
          if (left != 0 || top != 0 || iw != w || ih != h ||
              iw <= 0 || ih <= 0)
            return partial(palAny)
          if (i >= n) return partial(palAny)
          val minCode = b(i) & 0xff; i += 1
          // reassemble the LZW stream from its length-prefixed sub-blocks
          var total = 0
          var j = i
          while (j < n && b(j) != 0) {
            val len = b(j) & 0xff
            if (j + 1 + len > n) return partial(palAny)
            total += len; j += 1 + len
          }
          if (j >= n) return partial(palAny) // missing terminator
          val data = new Array[Byte](total)
          var p = i; var q = 0
          while (p < n && b(p) != 0) {
            val len = b(p) & 0xff
            System.arraycopy(b, p + 1, data, q, len)
            q += len; p += 1 + len
          }
          val nPix = iw * ih // ≤ 65535² — fits a Long; per-frame Int is safe
          if (nPix > Int.MaxValue) return partial(palAny)
          val indices = lzwDecode(data, minCode, nPix.toInt)
          if (indices == null) return partial(palAny)
          var sr = 0L; var sg = 0L; var sb = 0L
          var k = 0
          while (k < indices.length) {
            val idx = indices(k) & 0xff
            if (idx >= palSize) return partial(palAny)
            val o = palOff + 3 * idx
            sr += b(o) & 0xff; sg += b(o + 1) & 0xff; sb += b(o + 2) & 0xff
            k += 1
          }
          return row("gif", Array[Any](w, h, palSize.toLong, nPix, sr, sg, sb))
        case 0x3b => return partial(if (hasGct) gctSize.toLong else null)
        case _ => return partial(if (hasGct) gctSize.toLong else null)
      }
    }
    partial(if (hasGct) gctSize.toLong else null)
  }

  /** Raster allocation ceiling: one byte per palette index, same 256 MB
    * discipline as [[PngFeatures]]' MaxRasterBytes — header-claimed dimensions
    * beyond this are refused before any allocation, so a crafted ~40-byte GIF
    * claiming 46000x46000 cannot OOM an executor.
    */
  private[functions] val MaxPixels: Int = 256 << 20

  /** Variable-width LSB-first GIF-flavor LZW: returns exactly `nPix` decoded
    * palette indices or null on any malformation (truncation, code beyond
    * dictionary, output over/underflow, absurd root size, or a claimed raster
    * no stream of this length could emit).
    */
  private[functions] def lzwDecode(data: Array[Byte], minCode: Int, nPix: Int): Array[Byte] = {
    if (minCode < 2 || minCode > 11) return null
    if (nPix < 0 || nPix > MaxPixels) return null
    // A stream of L bytes holds at most L*8/(minCode+1) codes and each code
    // emits at most 4096 pixels; a claim beyond that ceiling cannot decode.
    if (nPix.toLong > data.length.toLong * 8 / (minCode + 1) * 4096) return null
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val first = new Array[Byte](4096) // memoized first byte of each string
    var c = 0
    while (c < clear) { suffix(c) = c.toByte; first(c) = c.toByte; c += 1 }
    var dictSize = endCode + 1
    var codeSize = minCode + 1
    val out = new Array[Byte](nPix)
    var outPos = 0
    var bitPos = 0
    val nBits = data.length * 8
    val stack = new Array[Byte](4097)
    var prev = -1
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0; var k = 0
      while (k < codeSize) {
        val bit = (data((bitPos + k) >> 3) >> ((bitPos + k) & 7)) & 1
        v |= bit << k
        k += 1
      }
      bitPos += codeSize
      v
    }
    while (true) {
      val code = readCode()
      if (code < 0) return null // truncated before END
      if (code == clear) {
        dictSize = endCode + 1; codeSize = minCode + 1; prev = -1
      } else if (code == endCode) {
        return if (outPos == nPix) out else null // exact pixel count or bust
      } else {
        // KwKwK: code == dictSize is legal only right after a non-reset code
        if (code > dictSize || (code == dictSize && prev < 0)) return null
        var sp = 0
        var cur = if (code == dictSize) prev else code
        val extra: Byte = if (code == dictSize) first(prev) else 0
        while (cur >= clear) { // walk the chain down to the root literal
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return null // corrupt chain
        }
        stack(sp) = suffix(cur); sp += 1
        val emitLen = sp + (if (code == dictSize) 1 else 0)
        if (outPos + emitLen > nPix) return null // overflow: corrupt stream
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (code == dictSize) { out(outPos) = extra; outPos += 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first(if (code == dictSize) prev else code)
          first(dictSize) = first(prev)
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    null // unreachable
  }

  def apply(c: Column): Column =
    GraftBridge.column(GifFeatures(GraftBridge.expression(c)))
}
