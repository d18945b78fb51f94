package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MPEG audio (MP3 and friends) frame-header walk — REAL container metadata
  * from the public ISO/IEC 11172-3 / 13818-3 header layout, no codec library
  * and no sample decode: sync-scan to the first frame header (skipping a
  * leading ID3v2 tag by its syncsafe size), then hop frame to frame by the
  * spec's computed frame length, counting frames and samples. The container
  * math alone yields version, layer, sample rate, channel count, frame
  * count, total samples, duration, and average bitrate — the metadata a
  * 100 TB audio-ingest pipeline needs before it ever transcodes anything.
  *
  * Header layout (32 bits, big-endian): 11 sync bits (all 1), 2 version
  * bits (00 = MPEG-2.5, 10 = MPEG-2, 11 = MPEG-1, 01 reserved), 2 layer
  * bits (01 = III, 10 = II, 11 = I, 00 reserved), 1 protection bit, 4
  * bitrate-index bits (0000 = free format, 1111 forbidden), 2 sample-rate
  * -index bits (11 reserved), 1 padding bit, 1 private bit, 2 channel-mode
  * bits (11 = mono), 2 mode-extension bits, copyright, original, 2 emphasis
  * bits (10 reserved). Frame sizes from the spec: Layer I =
  * (12000·bitrate/rate + pad)·4 bytes; Layers II/III = 144000·bitrate/rate
  * + pad — except Layer III under versions 2/2.5 (576-sample granule) =
  * 72000·bitrate/rate + pad. Samples per frame: Layer I 384, Layer II 1152,
  * Layer III 1152 (MPEG-1) or 576 (MPEG-2/2.5).
  *
  * Honest refusal, never a misread: free format (bitrate index 0 — frame
  * length is not computable without decoding), a mid-stream desync (the
  * computed next frame does not carry a consistent valid header), a
  * truncated final frame, or a walk that does not end exactly at the end of
  * the payload (one trailing 128-byte ID3v1 'TAG' block is allowed) all
  * yield format "mpeg" with the first frame's header fields and null
  * counts; a payload with no recognizable frame header at all is
  * "unknown". VBR streams (bitrate varying frame to frame) walk fine;
  * version/layer/sample-rate/channel-mode must stay constant, as real
  * decoders require.
  *
  * One codegen'd per-row call in the scan stage: like [[MediaDims]] and
  * [[WavFeatures]], nothing but the small output struct ever leaves the
  * scan, so the plan shape is unchanged at any scale.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque message bodies
  * and never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal).
  */
case class MpegFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = MpegFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    MpegFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MpegFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): MpegFeatures =
    copy(child = newChild)

  override def prettyName: String = "mpeg_features"
}

object MpegFeatures {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("version", StringType, nullable = true),
    StructField("layer", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("total_samples", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("avg_bitrate_kbps", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private val nulls: Array[Any] = Array.fill[Any](8)(null)

  // bitrate tables in kbps, indexed 1..14 (0 = free format, 15 = forbidden)
  private val brV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val brV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val brV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val brV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val brV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  // sample rates by version (1 / 2 / 2.5) and 2-bit index 0..2 (3 reserved)
  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  /** Parsed fixed fields of one frame header, or null if `i` does not hold
    * a syntactically valid header (sync + non-reserved fields). `brIdx` may
    * be 0 (free format) — callers decide how to treat it.
    */
  private[functions] final class Header(
      val verBits: Int, // 0 = 2.5, 2 = 2, 3 = 1
      val layer: Int, // 1, 2, 3
      val brIdx: Int,
      val rate: Int,
      val pad: Int,
      val mono: Boolean)

  private[functions] def parseHeader(b: Array[Byte], i: Int): Header = {
    if (i + 4 > b.length) return null
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return null
    val verBits = (b(i + 1) >> 3) & 3
    if (verBits == 1) return null // reserved version
    val layerBits = (b(i + 1) >> 1) & 3
    if (layerBits == 0) return null // reserved layer
    val layer = 4 - layerBits // 01 -> III, 10 -> II, 11 -> I
    val brIdx = (b(i + 2) >> 4) & 0xf
    if (brIdx == 15) return null // forbidden
    val srIdx = (b(i + 2) >> 2) & 3
    if (srIdx == 3) return null // reserved
    if ((b(i + 3) & 3) == 2) return null // reserved emphasis
    val rate = (verBits match {
      case 3 => srV1
      case 2 => srV2
      case _ => srV25
    })(srIdx)
    val pad = (b(i + 2) >> 1) & 1
    val mono = ((b(i + 3) >> 6) & 3) == 3
    new Header(verBits, layer, brIdx, rate, pad, mono)
  }

  private[functions] def bitrateKbps(h: Header): Int = {
    val table =
      if (h.verBits == 3) h.layer match {
        case 1 => brV1L1; case 2 => brV1L2; case _ => brV1L3
      } else if (h.layer == 1) brV2L1
      else brV2L23
    table(h.brIdx)
  }

  private[functions] def frameBytes(h: Header, br: Int): Int =
    if (h.layer == 1) (12000 * br / h.rate + h.pad) * 4
    else if (h.layer == 3 && h.verBits != 3) 72000 * br / h.rate + h.pad
    else 144000 * br / h.rate + h.pad

  private[functions] def samplesPerFrame(h: Header): Int =
    if (h.layer == 1) 384
    else if (h.layer == 3 && h.verBits != 3) 576
    else 1152

  private[functions] def versionName(verBits: Int): String =
    if (verBits == 3) "1" else if (verBits == 2) "2" else "2.5"

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    // leading ID3v2 tag: "ID3" + version(2) + flags(1) + 4-byte syncsafe
    // size; skip it by the declared size (a tag body may legally contain
    // bytes that LOOK like frame headers — hunting through it would lock
    // onto garbage and desync)
    var start = 0
    if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(6) & 0x80) == 0 && (b(7) & 0x80) == 0 &&
        (b(8) & 0x80) == 0 && (b(9) & 0x80) == 0) {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      if (10L + size <= n) start = 10 + size
    }
    // sync-scan: first offset whose fixed header fields all parse
    var i = start
    var first: Header = null
    while (first == null && i + 4 <= n) {
      first = parseHeader(b, i)
      if (first == null) i += 1
    }
    if (first == null) return row("unknown", nulls.clone())
    def partial(): InternalRow =
      row("mpeg", Array[Any](UTF8String.fromString(versionName(first.verBits)),
        first.layer.toLong, first.rate.toLong,
        (if (first.mono) 1L else 2L), null, null, null, null))
    var frames = 0L
    var samples = 0L
    var brSum = 0L
    var cur = first
    while (true) {
      if (cur.brIdx == 0) return partial() // free format: length unknowable
      if (cur.verBits != first.verBits || cur.layer != first.layer ||
          cur.rate != first.rate || cur.mono != first.mono)
        return partial() // stream parameters must stay constant
      val br = bitrateKbps(cur)
      val len = frameBytes(cur, br)
      if (len < 4 || i + len > n) return partial() // truncated final frame
      frames += 1; samples += samplesPerFrame(cur); brSum += br
      i += len
      if (i == n || (n - i == 128 && b(i) == 'T' && b(i + 1) == 'A' &&
          b(i + 2) == 'G')) {
        return row("mpeg",
          Array[Any](UTF8String.fromString(versionName(first.verBits)),
            first.layer.toLong, first.rate.toLong,
            (if (first.mono) 1L else 2L), frames, samples,
            samples * 1000L / first.rate, brSum / frames))
      }
      cur = parseHeader(b, i)
      if (cur == null) return partial() // desync mid-stream
    }
    partial() // unreachable
  }

  def apply(c: Column): Column =
    GraftBridge.column(MpegFeatures(GraftBridge.expression(c)))
}
