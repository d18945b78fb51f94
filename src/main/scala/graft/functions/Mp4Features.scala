package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MP4 / ISO-BMFF (ISO/IEC 14496-12) box walk — REAL video-container
  * metadata with no codec library and no sample decode: walk the top-level
  * box sequence (`ftyp`, `moov`, `mdat`, …) by each box's declared size,
  * descend `moov` for the movie header (`mvhd`: timescale + duration) and
  * the per-track handler types (`trak`/`mdia`/`hdlr`: `vide`/`soun`/other).
  * The container math alone yields brand, duration, and the track
  * inventory — the triage a 100 TB video-ingest pipeline runs before any
  * transcode fleet is sized, and the video sibling of [[MpegFeatures]]'s
  * audio frame walk.
  *
  * The design point at scale: `mdat` (the media payload, virtually the
  * whole file) is SKIPPED by its declared size — 32-bit, 64-bit
  * (`size == 1` + largesize), or to-EOF (`size == 0`, legal only for the
  * final top-level box). Metadata cost is independent of media size.
  *
  * Honest refusal, never a misread: a first box that is not a well-formed
  * `ftyp` yields format "unknown" with all fields null; after a valid
  * `ftyp`, any box whose declared size overruns its container (including a
  * truncated file), a nested to-EOF size, a missing `moov`, or a missing /
  * undersized `mvhd` yields format "mp4" with the brand intact and all
  * counts null (the [[MpegFeatures]] first-frame-fields discipline). A
  * `timescale` of zero reports every field except the uncomputable
  * `duration_ms`. A `trak` whose `hdlr` is absent still counts in
  * `track_count`, just as neither video nor audio.
  *
  * One codegen'd per-row call in the scan stage: like [[MediaDims]],
  * nothing but the small output struct ever leaves the scan.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque message bodies
  * and never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal).
  */
case class Mp4Features(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = Mp4Features.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    Mp4Features.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4Features.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Mp4Features =
    copy(child = newChild)

  override def prettyName: String = "mp4_features"
}

object Mp4Features {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("timescale", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("track_count", LongType, nullable = true),
    StructField("video_tracks", LongType, nullable = true),
    StructField("audio_tracks", LongType, nullable = true)))

  private def row(fmt: String, vals: Array[Any]): InternalRow =
    new GenericInternalRow(UTF8String.fromString(fmt) +: vals)

  private[functions] def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private[functions] def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private[functions] def fourcc(b: Array[Byte], i: Int): Int =
    (((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff))

  private[functions] val FTYP = 0x66747970
  private[functions] val MOOV = 0x6d6f6f76
  private[functions] val MVHD = 0x6d766864
  private[functions] val TRAK = 0x7472616b
  private[functions] val MDIA = 0x6d646961
  private[functions] val HDLR = 0x68646c72
  private[functions] val VIDE = 0x76696465
  private[functions] val SOUN = 0x736f756e

  /** One parsed box: [payload, end) is the content span, end is where the
    * next sibling starts. Null on any malformed header (overrun, size
    * smaller than its own header, nested to-EOF size, negative largesize).
    */
  private[functions] final class Box(val typ: Int, val payload: Int, val end: Int)

  private[functions] def parseBox(b: Array[Byte], i: Int, limit: Int,
      topLevel: Boolean): Box = {
    if (i + 8 > limit) return null
    val size32 = u32(b, i)
    val typ = fourcc(b, i + 4)
    if (size32 == 0) {
      // to-EOF: only the file's final top-level box may omit its size
      if (!topLevel) return null
      new Box(typ, i + 8, limit)
    } else if (size32 == 1) {
      if (i + 16 > limit) return null
      val size = u64(b, i + 8)
      if (size < 16 || size > limit - i) return null
      new Box(typ, i + 16, i + size.toInt)
    } else {
      if (size32 < 8 || size32 > limit - i) return null
      new Box(typ, i + 8, i + size32.toInt)
    }
  }

  /** First well-formed child of `typ` within [from, limit), walking every
    * sibling header on the way; Box(null-typ) never matches. Returns null
    * when absent OR when a malformed sibling header blocks the walk —
    * callers refuse either way.
    */
  private[functions] def findChild(b: Array[Byte], from: Int, limit: Int,
      typ: Int): Box = {
    var i = from
    while (i < limit) {
      val box = parseBox(b, i, limit, topLevel = false)
      if (box == null) return null
      if (box.typ == typ) return box
      i = box.end
    }
    null
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    val unknown = row("unknown", Array.fill[Any](6)(null))
    // the first box must be a well-formed ftyp carrying major_brand +
    // minor_version; anything else is not an ISO-BMFF file we can claim
    val ftyp = parseBox(b, 0, n, topLevel = true)
    if (ftyp == null || ftyp.typ != FTYP || ftyp.end - ftyp.payload < 8)
      return unknown
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(
      b, ftyp.payload, ftyp.payload + 4))
    def refused: InternalRow =
      row("mp4", Array[Any](brand, null, null, null, null, null))
    // walk the WHOLE top-level sequence (skipping mdat and friends by
    // declared size), not just up to moov: a box after moov whose declared
    // size overruns EOF is a truncated file, and reporting its metadata as
    // sound would be a misread
    var moov: Box = null
    var i = ftyp.end
    while (i < n) {
      val box = parseBox(b, i, n, topLevel = true)
      if (box == null) return refused
      if (box.typ == MOOV && moov == null) moov = box
      i = box.end
    }
    if (moov == null) return refused
    val mvhd = findChild(b, moov.payload, moov.end, MVHD)
    if (mvhd == null) return refused
    val mp = mvhd.payload
    val version = if (mvhd.end - mp >= 1) b(mp) & 0xff else -1
    // fullbox: version/flags(4), then creation/modification at the
    // version's width, then timescale u32 and duration at the width again
    val (timescale, duration) =
      if (version == 0 && mvhd.end - mp >= 24)
        (u32(b, mp + 12), u32(b, mp + 16))
      else if (version == 1 && mvhd.end - mp >= 36)
        (u32(b, mp + 20), u64(b, mp + 24))
      else return refused
    // track inventory: every trak counts; handler type classifies
    var tracks = 0L; var video = 0L; var audio = 0L
    var t = moov.payload
    while (t < moov.end) {
      val box = parseBox(b, t, moov.end, topLevel = false)
      if (box == null) return refused
      if (box.typ == TRAK) {
        tracks += 1
        val mdia = findChild(b, box.payload, box.end, MDIA)
        val hdlr =
          if (mdia == null) null
          else findChild(b, mdia.payload, mdia.end, HDLR)
        if (hdlr != null && hdlr.end - hdlr.payload >= 12) {
          val handler = fourcc(b, hdlr.payload + 8)
          if (handler == VIDE) video += 1
          else if (handler == SOUN) audio += 1
        }
      }
      t = box.end
    }
    // v1 mvhd duration is an unsigned 64-bit field read into a signed Long:
    // a high-bit value arrives negative, and anything past Long.MaxValue/1000
    // would overflow the *1000 — both are refused to null (never a misread)
    val durationMs: Any =
      if (timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000L)
        duration * 1000L / timescale
      else null
    row("mp4", Array[Any](brand, timescale, durationMs, tracks, video, audio))
  }

  def apply(c: Column): Column =
    GraftBridge.column(Mp4Features(GraftBridge.expression(c)))
}
