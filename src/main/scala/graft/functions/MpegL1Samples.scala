package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL sample-level decode of MPEG-1 Audio LAYER I (ISO/IEC 11172-3) — the
  * first compressed-audio codec family behind the documented `fakeDecode`
  * stand-in to get a real from-spec decoder, following the same pattern as
  * the from-spec JPEG ([[JpegFeatures]]) and PNG decoders: frame walk
  * (shared header math with [[MpegFeatures]]) → per-frame bit allocation →
  * scalefactors → 12-granule subband sample codes → REQUANTIZATION per
  * §2.4.3.3, all from actual entropy bits with zero codec libraries.
  *
  * What is computed: the requantized SUBBAND samples `s' = sf · s''` with
  *   s'' = (2^nb / (2^nb − 1)) · (s''' · 2^(1−nb) − 1 + 2^(1−nb))
  *       = 2 · (s''' + 1 − 2^(nb−1)) / (2^nb − 1)          (§2.4.3.3-1)
  *   sf  = 2 · 2^(−index/3)                                 (Table 3-B.1)
  * summed over every granule, subband, and channel as the order-independent
  * integer Σ floor(s' · 2^24) (`sum_q24`). The fixture keeps scalefactor
  * indices at multiples of 3, so every scaling step is an EXACT power of
  * two and the single inexact operation is one correctly-rounded IEEE
  * division — which is why a SQL oracle reproduces the sum bit-exactly
  * without an MP3 codec. The final PCM polyphase stage is intentionally
  * out of scope: its matrixing is closed-form (N(i,k) = cos((16+i)(2k+1)
  * π/64), §2.4.3.4) but the 512-coefficient synthesis window of Table
  * 3-B.3 is pure tabulated data with no generating formula, and inventing
  * those coefficients would be a silent misread factory; the subband
  * domain IS the decoded signal content (the filterbank is its invertible
  * resynthesis), and it is what corpus-level audio statistics need.
  *
  * Honest refusal, never a misread: Layer II (its bit-allocation classes
  * are the tabulated Tables 3-B.2a-d — same refusal rationale as the
  * window) and Layer III (hybrid MDCT + Huffman, a different codec
  * entirely) refuse with the header facts; so do free format, a forbidden
  * allocation code (15), a forbidden scalefactor index (63), the unused
  * all-ones sample code, a desync, truncation mid-frame, or stream
  * parameters changing between frames. A leading ID3v2 tag is skipped by
  * its syncsafe size and one trailing ID3v1 'TAG' block is tolerated,
  * matching [[MpegFeatures]]. CRC-protected frames skip the 16-bit CRC
  * word without verifying it (the spec leaves verification optional).
  *
  * Output: `struct<format, layer, sample_rate, channels, n_frames,
  * n_samples, sum_q24>` with `n_samples` = per-channel subband samples
  * (384 per frame). One codegen'd per-row call in the scan stage —
  * payloads never shuffle, same 100 TB shape as every decoder here.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque bodies and
  * never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal).
  */
case class MpegL1Samples(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = MpegL1Samples.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    MpegL1Samples.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MpegL1Samples.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): MpegL1Samples =
    copy(child = newChild)

  override def prettyName: String = "mpeg_l1_samples"
}

object MpegL1Samples {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("layer", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("sum_q24", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](6)(null)

  /** Scalefactors, Table 3-B.1: 2·2^(−i/3). Multiples of 3 are exact
    * powers of two (scalb — no libm), the rest go through pow once at
    * class-load. Index 63 is forbidden.
    */
  private val ScaleFactor: Array[Double] = Array.tabulate(63) { i =>
    if (i % 3 == 0) Math.scalb(1.0, 1 - i / 3)
    else 2.0 * Math.pow(2.0, -i / 3.0)
  }

  /** Plain MSB-first bit reader over one frame's slots (MPEG audio has no
    * byte stuffing). Returns -1 past `end`.
    */
  private final class Bits(b: Array[Byte], var pos: Int, end: Int) {
    private var cnt = 0
    private var acc = 0
    def get(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (cnt == 0) {
          if (pos >= end) return -1
          acc = b(pos) & 0xff
          pos += 1
          cnt = 8
        }
        cnt -= 1
        v = (v << 1) | ((acc >>> cnt) & 1)
        i += 1
      }
      v
    }
  }

  /** Decode one Layer I frame's subband samples into `sumQ24`; returns the
    * accumulated Σ floor(s'·2^24) or Long.MinValue on any refusal.
    */
  private def decodeFrame(b: Array[Byte], start: Int, end: Int,
      nch: Int, bound: Int, crc: Boolean, sumIn: Long): Long = {
    val bits = new Bits(b, start + (if (crc) 6 else 4), end)
    val alloc = Array.ofDim[Int](2, 32)
    var sb = 0
    while (sb < 32) {
      val shared = sb >= bound
      var ch = 0
      while (ch < (if (shared) 1 else nch)) {
        val a = bits.get(4)
        if (a < 0 || a == 15) return Long.MinValue // forbidden code
        alloc(ch)(sb) = a
        if (shared && nch == 2) alloc(1)(sb) = a
        ch += 1
      }
      sb += 1
    }
    val sf = Array.ofDim[Double](2, 32)
    sb = 0
    while (sb < 32) {
      var ch = 0
      while (ch < nch) {
        if (alloc(ch)(sb) != 0) {
          val idx = bits.get(6)
          if (idx < 0 || idx > 62) return Long.MinValue // 63 forbidden
          sf(ch)(sb) = ScaleFactor(idx)
        }
        ch += 1
      }
      sb += 1
    }
    var sum = sumIn
    var g = 0
    while (g < 12) {
      sb = 0
      while (sb < 32) {
        val shared = sb >= bound
        val nb0 = alloc(0)(sb)
        if (shared) {
          if (nb0 != 0) {
            val nb = nb0 + 1
            val code = bits.get(nb)
            if (code < 0 || code == (1 << nb) - 1) return Long.MinValue
            val q = (2.0 * (code + 1 - (1 << (nb - 1)))) / ((1 << nb) - 1)
            var ch = 0
            while (ch < nch) { // one code, per-channel scalefactors
              sum += Math.floor(q * sf(ch)(sb) * 16777216.0).toLong
              ch += 1
            }
          }
        } else {
          var ch = 0
          while (ch < nch) {
            val a = alloc(ch)(sb)
            if (a != 0) {
              val nb = a + 1
              val code = bits.get(nb)
              if (code < 0 || code == (1 << nb) - 1) return Long.MinValue
              val q = (2.0 * (code + 1 - (1 << (nb - 1)))) / ((1 << nb) - 1)
              sum += Math.floor(q * sf(ch)(sb) * 16777216.0).toLong
            }
            ch += 1
          }
        }
        sb += 1
      }
      g += 1
    }
    sum
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    var start = 0
    if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
        (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0) {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      if (10L + size <= n) start = 10 + size
    }
    var i = start
    var first: MpegFeatures.Header = null
    while (first == null && i + 4 <= n) {
      first = MpegFeatures.parseHeader(b, i)
      if (first == null) i += 1
    }
    if (first == null) return row("unknown", nulls.clone())
    def partial(): InternalRow =
      row("mpeg", Array[Any](first.layer.toLong, first.rate.toLong,
        (if (first.mono) 1L else 2L), null, null, null))
    // sample decode is Layer I of MPEG-1 only; II/III and the lower
    // versions' variants refuse with the header facts
    if (first.layer != 1 || first.verBits != 3) return partial()
    var frames = 0L
    var sum = 0L
    var cur = first
    while (true) {
      if (cur.brIdx == 0) return partial() // free format
      if (cur.verBits != first.verBits || cur.layer != first.layer ||
          cur.rate != first.rate || cur.mono != first.mono)
        return partial()
      val len = MpegFeatures.frameBytes(cur, MpegFeatures.bitrateKbps(cur))
      if (len < 4 || i + len > n) return partial() // truncated
      val b3 = b(i + 3) & 0xff
      val mode = (b3 >> 6) & 3
      val nch = if (mode == 3) 1 else 2
      val bound = if (mode == 1) (((b3 >> 4) & 3) + 1) * 4 else 32
      val crc = (b(i + 1) & 1) == 0
      sum = decodeFrame(b, i, i + len, nch, bound, crc, sum)
      if (sum == Long.MinValue) return partial()
      frames += 1
      i += len
      if (i == n || (n - i == 128 && b(i) == 'T' && b(i + 1) == 'A' &&
          b(i + 2) == 'G')) {
        return row("mpeg", Array[Any](1L, first.rate.toLong,
          (if (first.mono) 1L else 2L), frames, frames * 384L, sum))
      }
      cur = MpegFeatures.parseHeader(b, i)
      if (cur == null) return partial() // desync
    }
    partial() // unreachable
  }

  def apply(c: Column): Column =
    GraftBridge.column(MpegL1Samples(GraftBridge.expression(c)))
}
