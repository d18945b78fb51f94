package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** FRAGMENTED ISO-BMFF sample inventory (ISO/IEC 14496-12 §8.8) — the
  * moof/traf/trun counterpart of [[Mp4SampleTables]]'s stbl walk, covering
  * the stream class that operator honestly refuses: DASH/CMAF-style files
  * whose sample tables live in movie fragments, not in `moov`. Zero codec
  * work, zero media bytes read:
  *
  *  - `moov/trak/tkhd` (§8.3.2): track_ID — the join key between the
  *    movie-level track declarations and each fragment's `tfhd`;
  *  - `moov/trak/mdia/mdhd` (§8.4.2): media timescale;
  *  - `moov/mvex/trex` (§8.8.3): per-track DEFAULT sample duration/size —
  *    the outermost tier of the §8.8.8 default chain;
  *  - `moof/mfhd` (§8.8.5): fragment sequence_number (must strictly
  *    increase across fragments — the spec's own ordering invariant);
  *  - `moof/traf/tfhd` (§8.8.7): per-fragment track header — optional
  *    base_data_offset / default_sample_duration / default_sample_size
  *    (the middle tier), `default-base-is-moof` (0x020000);
  *  - `moof/traf/trun` (§8.8.8): the sample runs — per-sample duration /
  *    size when their flag bits are set, the default chain otherwise.
  *
  * Per sample, duration and size resolve trun-field → tfhd default →
  * trex default; a sample REACHING THE END of that chain is a file the
  * walk cannot inventory and refuses — a guessed size would be exactly
  * the "plausible number" this family's honest-refusal contract exists to
  * prevent. The other refusal classes, each a real contradiction rather
  * than a style objection: a `trun` carrying both `first-sample-flags`
  * (0x4) and per-sample `sample-flags` (0x400) — §8.8.8 forbids the
  * combination; an `mfhd` sequence_number that fails to strictly increase;
  * a `tfhd` track_ID no `moov/trak/tkhd` declares; sample data whose
  * resolved span (base_data_offset / default-base-is-moof base, plus the
  * run's data_offset and summed sample bytes) falls outside the file;
  * truncated or overrun boxes anywhere on the walk; a missing `moov`; and
  * a file with NO `moof` at all (an unfragmented file — [[Mp4SampleTables]]
  * is its operator; the two walks partition the format's stream classes
  * between them). When neither base-offset flag is set the spec anchors a
  * run's data after the previous run's (§8.8.7); the walk tracks that
  * cursor within each traf, but for the FIRST traf byte-anchor of a
  * multi-traf fragment without flags the spec's anchor is the previous
  * traf's data end, which is not derivable without decoding that traf's
  * placement — such runs are inventoried but not bounds-checked
  * (documented, not guessed).
  *
  * Per track (moov declaration order): (track_id, handler, timescale,
  * fragment_count, sample_count, duration_ms, total_bytes,
  * avg_sample_bytes) — floor integer arithmetic, cross-engine exact; a
  * declared track absent from every fragment reports zero counts (an init
  * segment awaiting its fragments, not an error), and fragment_count
  * counts FRAGMENTS a track appears in, at most once per moof even when
  * a fragment carries several trafs for the track. All accumulation is
  * overflow-exact: a file whose totals (or the duration_ms `ticks × 1000`
  * render) would exceed Long range refuses rather than wrap — the tenth
  * refusal class. One codegen'd per-row call in the scan stage.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque bodies and
  * never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal) — fragmented streams are
  * the dominant shape of crawled video, and a 100 TB ingest sizes its
  * transcode fleet from exactly this inventory.
  */
case class Mp4FragmentTables(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = Mp4FragmentTables.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    Mp4FragmentTables.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mp4FragmentTables.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): Mp4FragmentTables =
    copy(child = newChild)

  override def prettyName: String = "mp4_fragment_tables"
}

object Mp4FragmentTables {
  import Mp4Features.{parseBox, findChild, FTYP, MOOV, TRAK, MDIA, HDLR}

  val trackSchema: StructType = StructType(Seq(
    StructField("track_id", LongType, nullable = false),
    StructField("handler", StringType, nullable = true),
    StructField("timescale", LongType, nullable = false),
    StructField("fragment_count", LongType, nullable = false),
    StructField("sample_count", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("avg_sample_bytes", LongType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("tracks", ArrayType(trackSchema, containsNull = false),
      nullable = true)))

  /** Per-track cap on sample_count / duration ticks / total_bytes, shared
    * by BOTH walkers (flat and fragmented): 2⁵³. Chosen so (a) the
    * duration render `ticks × 1000` stays under 2⁶³, and (b) per-asset
    * CROSS-track sums (`LogStream.mediaDecorations`'s `aggregate()`
    * lambdas, plain long addition) cannot wrap for any inventory of up to
    * 1024 capped tracks — with the SQL-side saturation guard covering the
    * beyond-1024 corner. A crawled file claiming more than 2⁵³ of
    * anything per track (9 · 10¹⁵ samples/bytes, ~285 millennia at
    * 1 kHz) is an implausible inventory and refuses like the other
    * overflow classes, never a plausible number.
    */
  private[functions] val TrackCap = 1L << 53

  private val MOOF = 0x6d6f6f66
  private val MVEX = 0x6d766578
  private val TREX = 0x74726578
  private val TKHD = 0x746b6864
  private val MDHD = 0x6d646864
  private val MFHD = 0x6d666864
  private val TRAF = 0x74726166
  private val TFHD = 0x74666864
  private val TRUN = 0x7472756e

  private def u32(b: Array[Byte], i: Int): Long = Mp4Features.u32(b, i)
  private def u64(b: Array[Byte], i: Int): Long = Mp4Features.u64(b, i)
  /** Signed 32-bit read — trun's data_offset is an int32 (§8.8.8). */
  private def s32(b: Array[Byte], i: Int): Long = u32(b, i).toInt.toLong

  private def row(fmt: String, brand: Any, tracks: Any): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), brand, tracks))

  /** Per-track mutable accumulator during the fragment walk. `lastMoof`
    * is the index of the last moof that counted toward fragment_count —
    * a spec-legal fragment may carry several trafs for the same track
    * (§8.8.4 puts no uniqueness constraint on traf/tfhd track_IDs), and
    * fragment_count counts FRAGMENTS, not trafs (r16 ADVICE item 4).
    */
  private final class Acc(val handler: Any, val timescale: Long) {
    var fragments = 0L
    var samples = 0L
    var ticks = 0L
    var bytes = 0L
    var lastMoof = -1
  }

  /** Static entry point shared by interpreted eval and generated code.
    * All sample/tick/byte accumulation is overflow-EXACT
    * (`Math.addExact`/`multiplyExact` — r16 ADVICE item 1): per-trun
    * counts reach 2²⁴ samples of u32 durations/sizes, so an adversarial
    * crawled file can push the per-track totals (and `ticks × 1000` in
    * the duration_ms render) past Long range; silent wraparound would be
    * exactly the "plausible number" the honest-refusal contract forbids,
    * so arithmetic overflow anywhere in the walk refuses the file.
    */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    val ftyp = parseBox(b, 0, n, topLevel = true)
    if (ftyp == null || ftyp.typ != FTYP || ftyp.end - ftyp.payload < 8)
      return row("unknown", null, null)
    val brand = UTF8String.fromBytes(java.util.Arrays.copyOfRange(
      b, ftyp.payload, ftyp.payload + 4))
    try walk(b, n, brand, ftyp.end)
    catch { case _: ArithmeticException => row("mp4", brand, null) }
  }

  private def walk(b: Array[Byte], n: Int, brand: UTF8String,
      afterFtyp: Int): InternalRow = {
    def refused: InternalRow = row("mp4", brand, null)

    // one pass over the top-level sequence: collect moov and every moof in
    // file order (with each moof's first byte — the default-base-is-moof
    // anchor, §8.8.7); a malformed header anywhere refuses
    var moov: Mp4Features.Box = null
    val moofs = scala.collection.mutable.ArrayBuffer.empty[(Mp4Features.Box, Long)]
    var i = afterFtyp
    while (i < n) {
      val box = parseBox(b, i, n, topLevel = true)
      if (box == null) return refused
      if (box.typ == MOOV && moov == null) moov = box
      if (box.typ == MOOF) moofs += ((box, i.toLong))
      i = box.end
    }
    if (moov == null) return refused
    // an unfragmented file's inventory lives in stbl — Mp4SampleTables'
    // domain, not a fragment walk's
    if (moofs.isEmpty) return refused

    // ---- moov: track declarations (tkhd id, mdhd timescale, hdlr) ----
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    val accs = scala.collection.mutable.LongMap.empty[Acc]
    var t = moov.payload
    while (t < moov.end) {
      val box = parseBox(b, t, moov.end, topLevel = false)
      if (box == null) return refused
      if (box.typ == TRAK) {
        val tkhd = findChild(b, box.payload, box.end, TKHD)
        if (tkhd == null || tkhd.end - tkhd.payload < 4) return refused
        val tv = b(tkhd.payload) & 0xff
        val trackId =
          if (tv == 0 && tkhd.end - tkhd.payload >= 16) u32(b, tkhd.payload + 12)
          else if (tv == 1 && tkhd.end - tkhd.payload >= 24) u32(b, tkhd.payload + 20)
          else return refused
        if (trackId <= 0 || accs.contains(trackId)) return refused
        val mdia = findChild(b, box.payload, box.end, MDIA)
        if (mdia == null) return refused
        val mdhd = findChild(b, mdia.payload, mdia.end, MDHD)
        if (mdhd == null || mdhd.end - mdhd.payload < 4) return refused
        val mv = b(mdhd.payload) & 0xff
        val timescale =
          if (mv == 0 && mdhd.end - mdhd.payload >= 24) u32(b, mdhd.payload + 12)
          else if (mv == 1 && mdhd.end - mdhd.payload >= 36) u32(b, mdhd.payload + 20)
          else return refused
        if (timescale <= 0) return refused
        val hdlr = findChild(b, mdia.payload, mdia.end, HDLR)
        val handler: Any =
          if (hdlr != null && hdlr.end - hdlr.payload >= 12)
            UTF8String.fromBytes(java.util.Arrays.copyOfRange(
              b, hdlr.payload + 8, hdlr.payload + 12))
          else null
        order += trackId
        accs(trackId) = new Acc(handler, timescale)
      }
      t = box.end
    }
    if (order.isEmpty) return refused

    // ---- moov/mvex/trex: outermost defaults of the §8.8.8 chain ----
    // (duration, size) per track_ID; -1 marks "no default at this tier"
    val trexDur = scala.collection.mutable.LongMap.empty[Long]
    val trexSize = scala.collection.mutable.LongMap.empty[Long]
    val mvex = findChild(b, moov.payload, moov.end, MVEX)
    if (mvex != null) {
      var x = mvex.payload
      while (x < mvex.end) {
        val box = parseBox(b, x, mvex.end, topLevel = false)
        if (box == null) return refused
        if (box.typ == TREX) {
          if (box.end - box.payload < 24) return refused
          val id = u32(b, box.payload + 4)
          trexDur(id) = u32(b, box.payload + 12)
          trexSize(id) = u32(b, box.payload + 16)
        }
        x = box.end
      }
    }

    // ---- the fragment walk ----
    var prevSeq = 0L
    var mi = 0
    while (mi < moofs.length) {
      val (moof, moofStart) = moofs(mi)
      val mfhd = findChild(b, moof.payload, moof.end, MFHD)
      if (mfhd == null || mfhd.end - mfhd.payload < 8) return refused
      val seq = u32(b, mfhd.payload + 4)
      if (seq <= prevSeq) return refused // §8.8.5: strictly increasing
      prevSeq = seq

      var p = moof.payload
      while (p < moof.end) {
        val traf = parseBox(b, p, moof.end, topLevel = false)
        if (traf == null) return refused
        if (traf.typ == TRAF) {
          val tfhd = findChild(b, traf.payload, traf.end, TFHD)
          if (tfhd == null || tfhd.end - tfhd.payload < 8) return refused
          val tfFlags = u32(b, tfhd.payload) & 0xffffffL
          val trackId = u32(b, tfhd.payload + 4)
          val acc = accs.getOrElse(trackId, null)
          if (acc == null) return refused // undeclared track
          // optional tfhd fields, spec order (§8.8.7)
          var q = tfhd.payload + 8
          var base = -1L // resolved data anchor; -1 = not derivable
          if ((tfFlags & 0x1) != 0) {
            if (tfhd.end - q < 8) return refused
            base = u64(b, q); q += 8
            if (base < 0 || base > n) return refused
          } else if ((tfFlags & 0x020000) != 0) {
            // default-base-is-moof: the moof box's first byte
            base = moofStart
          }
          if ((tfFlags & 0x2) != 0) q += 4 // sample_description_index
          var tfDur = -1L
          if ((tfFlags & 0x8) != 0) {
            if (tfhd.end - q < 4) return refused
            tfDur = u32(b, q); q += 4
          }
          var tfSize = -1L
          if ((tfFlags & 0x10) != 0) {
            if (tfhd.end - q < 4) return refused
            tfSize = u32(b, q); q += 4
          }
          if (q > tfhd.end) return refused
          val defDur = if (tfDur >= 0) tfDur else trexDur.getOrElse(trackId, -1L)
          val defSize = if (tfSize >= 0) tfSize else trexSize.getOrElse(trackId, -1L)

          if (acc.lastMoof != mi) { acc.fragments += 1; acc.lastMoof = mi }
          // data cursor within this traf: a run with an explicit
          // data_offset re-anchors it; a run without one follows the
          // previous run's data (§8.8.7). `anchored` = the anchor is
          // derivable (explicit base or default-base-is-moof) — only
          // anchored runs are bounds-checked (see class scaladoc).
          val anchored = base >= 0
          var cursor = if (anchored) base else 0L
          var r = traf.payload
          while (r < traf.end) {
            val trun = parseBox(b, r, traf.end, topLevel = false)
            if (trun == null) return refused
            if (trun.typ == TRUN) {
              if (trun.end - trun.payload < 8) return refused
              val flags = u32(b, trun.payload) & 0xffffffL
              // §8.8.8: first-sample-flags shall not be used with
              // per-sample sample-flags — a contradictory inventory
              if ((flags & 0x4) != 0 && (flags & 0x400) != 0) return refused
              val sc = u32(b, trun.payload + 4)
              if (sc > (1L << 24)) return refused
              var s = trun.payload + 8
              var hasOffset = false
              var dataOff = 0L
              if ((flags & 0x1) != 0) {
                if (trun.end - s < 4) return refused
                dataOff = s32(b, s); s += 4; hasOffset = true
              }
              if ((flags & 0x4) != 0) {
                if (trun.end - s < 4) return refused
                s += 4 // first_sample_flags
              }
              val perDur = (flags & 0x100) != 0
              val perSize = (flags & 0x200) != 0
              val width = (if (perDur) 4 else 0) + (if (perSize) 4 else 0) +
                (if ((flags & 0x400) != 0) 4 else 0) +
                (if ((flags & 0x800) != 0) 4 else 0)
              if (trun.end - s < width.toLong * sc) return refused
              if (!perDur && defDur < 0) return refused // default chain exhausted
              if (!perSize && defSize < 0) return refused
              var runBytes = 0L
              var runTicks = 0L
              if (!perDur && !perSize) {
                // closed form — no per-sample field to read; the loop
                // below would burn sc iterations to add constants (r16
                // ADVICE item 2: a crafted file carries 2²⁴-sample runs
                // whose width covers only skipped fields)
                runTicks = Math.multiplyExact(sc, defDur)
                runBytes = Math.multiplyExact(sc, defSize)
              } else {
                var j = 0L
                var e = s
                while (j < sc) {
                  if (perDur) { runTicks = Math.addExact(runTicks, u32(b, e)); e += 4 }
                  else runTicks = Math.addExact(runTicks, defDur)
                  if (perSize) { runBytes = Math.addExact(runBytes, u32(b, e)); e += 4 }
                  else runBytes = Math.addExact(runBytes, defSize)
                  e += width - (if (perDur) 4 else 0) - (if (perSize) 4 else 0)
                  j += 1
                }
              }
              // bounds: a run whose anchor is derivable must keep its
              // data span inside the file
              if (anchored) {
                if (hasOffset) cursor = base + dataOff
                if (cursor < 0 || Math.addExact(cursor, runBytes) > n) return refused
                cursor += runBytes
              }
              acc.samples = Math.addExact(acc.samples, sc)
              acc.ticks = Math.addExact(acc.ticks, runTicks)
              acc.bytes = Math.addExact(acc.bytes, runBytes)
              // Per-track magnitude cap (r17 ADVICE): addExact bounds each
              // total below 2⁶³, but an UNANCHORED default-only run (no
              // bounds check applies) legitimately accumulates ~2⁶² per
              // track, and two such tracks wrap the per-asset sums in
              // LogStream.mediaDecorations. 2⁵³ keeps ticks×1000 < 2⁶³
              // and makes any sum of ≤ 1024 capped tracks wrap-free.
              if (acc.samples > TrackCap || acc.ticks > TrackCap ||
                  acc.bytes > TrackCap) return refused
            }
            r = trun.end
          }
        }
        p = traf.end
      }
      mi += 1
    }

    val tracks = order.map { id =>
      val a = accs(id)
      new GenericInternalRow(Array[Any](
        id, a.handler, a.timescale, a.fragments, a.samples,
        Math.multiplyExact(a.ticks, 1000L) / a.timescale, a.bytes,
        if (a.samples == 0) 0L else a.bytes / a.samples)): InternalRow
    }
    row("mp4", brand, new GenericArrayData(tracks.toArray[Any]))
  }

  def apply(c: Column): Column =
    GraftBridge.column(Mp4FragmentTables(GraftBridge.expression(c)))
}
