package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL sample-level decode of RIFF/WAVE PCM audio — the one audio family
  * fully decodable with zero codec libraries (PCM samples are stored raw;
  * the container is a public-spec chunk walk). Together with the PNG and
  * netpbm pixel decoders this closes the audio half of the multimodal
  * decode story: header fields AND per-channel sample statistics are
  * computed from the actual payload bytes.
  *
  * Container rules implemented (RIFF spec, canonical WAVE layout):
  *  - `RIFF <size> WAVE`, then a sequence of `<id><le32 size><body>` chunks,
  *    each padded to an even byte boundary;
  *  - `fmt ` (≥ 16 body bytes): le16 audio format (1 = integer PCM),
  *    le16 channels, le32 sample rate, le32 byte rate, le16 block align,
  *    le16 bits per sample — non-audio chunks (LIST, INFO, …) are skipped;
  *  - `data`: interleaved frames of `block align` bytes; 8-bit samples are
  *    UNSIGNED with a 128 offset, 16-bit samples are SIGNED little-endian.
  *
  * Anything else — compressed/float formats (format tag ≠ 1), 24/32-bit
  * widths, > 2 channels, a block align that contradicts channels×width, a
  * truncated or ragged data chunk, data before fmt — yields format "wav"
  * with the header fields that WERE readable and null statistics (or
  * "unknown" for a non-RIFF payload): never a misread.
  *
  * Output: `struct<format, channels, sample_rate, bits, n_frames, sum_ch0,
  * sum_ch1, peak_abs>` with integer sums of the DECODED amplitudes (8-bit
  * values are re-centered to −128..127, 16-bit are two's-complement) —
  * exact, order-independent, and mirrorable in the DuckDB oracle. Mono
  * reports its one channel in both sum slots (the gray-pixel convention of
  * `ppm_features`). One codegen'd per-row call in the scan stage: audio
  * statistics at 100 TB never shuffle anything but the per-asset struct.
  */
case class WavFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = WavFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    WavFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): WavFeatures =
    copy(child = newChild)

  override def prettyName: String = "wav_features"
}

object WavFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("bits", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("sum_ch0", LongType, nullable = true),
    StructField("sum_ch1", LongType, nullable = true),
    StructField("peak_abs", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](7)(null)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong) | (le16(b, i + 2).toLong << 16)

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return row("unknown", nulls.clone())

    var i = 12
    var haveFmt = false
    var audioFormat = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var rate = -1L
    // header fields once fmt parses, stats null — the partial-refusal row
    def partial(): InternalRow =
      if (!haveFmt) row("wav", nulls.clone())
      else row("wav", Array[Any](channels.toLong, rate, bits.toLong,
        null, null, null, null))

    while (i + 8 <= n) {
      val size = le32(b, i + 4)
      val body = i + 8
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      if (isFmt) {
        if (size < 16 || body + 16 > n) return row("wav", nulls.clone())
        audioFormat = le16(b, body)
        channels = le16(b, body + 2)
        rate = le32(b, body + 4)
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
        haveFmt = true
      } else if (isData) {
        if (!haveFmt) return row("wav", nulls.clone()) // data before fmt
        val bytesPer = bits / 8
        if (audioFormat != 1 || (bits != 8 && bits != 16) ||
            channels < 1 || channels > 2 ||
            blockAlign != channels * bytesPer ||
            size % blockAlign != 0 || size > n.toLong - body)
          return partial()
        // size ≤ n - body ≤ Int.MaxValue here, so the toInt is exact
        val total = (size / bytesPer).toInt // interleaved sample count
        var s0 = 0L; var s1 = 0L; var peak = 0L
        var j = 0; var p = body
        while (j < total) {
          val v =
            if (bits == 8) (b(p) & 0xff) - 128 // unsigned, 128 offset
            else { val u = le16(b, p); if (u < 32768) u else u - 65536 }
          if (j % channels == 0) s0 += v else s1 += v
          val a = if (v < 0) -v.toLong else v.toLong
          if (a > peak) peak = a
          p += bytesPer; j += 1
        }
        if (channels == 1) s1 = s0 // mono: one channel in both slots
        return row("wav", Array[Any](channels.toLong, rate, bits.toLong,
          size / blockAlign, s0, s1, peak))
      }
      if (size > n.toLong - body) return partial() // ragged non-data chunk
      i = body + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    partial() // no data chunk found
  }

  def apply(c: Column): Column =
    GraftBridge.column(WavFeatures(GraftBridge.expression(c)))
}
