package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** MPEG transport-stream inventory (ISO/IEC 13818-1) — the third video
  * packaging family after the flat ([[Mp4SampleTables]]) and fragmented
  * ([[Mp4FragmentTables]]) ISO-BMFF walks: broadcast/HLS delivery ships
  * 188-byte TS cells, and a re-muxer renumbers PIDs, re-orders the
  * interleave, re-derives continuity counters and re-packetizes PES into
  * different cells while the per-elementary-stream content inventory is
  * untouched. Zero codec work, zero media bytes decoded:
  *
  *  - packet layer (§2.4.3.2): fixed 188-byte cells, sync_byte 0x47,
  *    13-bit PID, payload_unit_start_indicator, adaptation_field_control
  *    (value 00 is reserved — a file carrying it refuses), 4-bit
  *    continuity counter (packaging state — ignored);
  *  - adaptation field (§2.4.3.4): length-prefixed, skipped whole; its
  *    stuffing is how a muxer pads a cell, so its size is packaging;
  *  - PSI (§2.4.4): PAT on PID 0 names the PMT PID (program_number 0
  *    rows are network PIDs and are skipped); the PMT maps stream_type →
  *    elementary PID. Sections are read from the pointer_field on a
  *    PUSI cell; their CRC_32 bytes are skipped, not validated — this is
  *    an inventory, not an integrity checker (documented choice, same
  *    class as the MP4 walks not checksumming mdat);
  *  - PES (§2.4.3.6-7): on a declared elementary PID, a PUSI cell must
  *    open with the 00 00 01 start code; the optional header ('10'
  *    marker, flags, PES_header_data_length, PTS when PTS_DTS_flags has
  *    the 0x80 bit) is parsed for the 33-bit PTS and otherwise skipped;
  *    every remaining payload byte on that PID — including PUSI=0
  *    continuation cells — is elementary-stream content.
  *
  * Per declared stream (PMT order): (pid, stream_type, pes_count,
  * payload_bytes, duration_ms, avg_pes_bytes) — duration is
  * (max PTS − min PTS) rendered at the §2.4.3.7 90 kHz system clock by
  * floor division (`ticks × 1000 / 90000`), cross-engine exact; a
  * stream with fewer than two timestamps reports 0 (a duration needs two
  * points, and 0 is the honest inventory of "no interval", not a guess).
  * `pid` is a PACKAGING column — descriptor derivations must exclude it,
  * exactly as the ISO-BMFF walks exclude trak_idx/track_id and
  * chunk/fragment counts.
  *
  * Refusal classes, each a real contradiction: a length not a multiple
  * of 188; a lost sync byte on any cell boundary; reserved
  * adaptation_field_control 00; an adaptation field overrunning its
  * cell; no PAT, a PAT naming no program, or no PMT cell on the named
  * PID; a PSI section overrunning its cell; a declared elementary PID
  * whose PUSI cell lacks the PES start code or whose header overruns the
  * cell; duplicate elementary PIDs in the PMT; and any accumulated total
  * past the shared 2⁵³ magnitude cap ([[Mp4FragmentTables.TrackCap]] —
  * same rationale: per-asset cross-stream sums must stay wrap-free).
  * Cells on PIDs that are neither PSI nor declared elementary streams
  * (SI tables, the 0x1FFF null PID) are signaling/stuffing, skipped by
  * the spec's own table_id routing — an inventory of the PROGRAM is not
  * a claim about them.
  *
  * Single-cell PAT/PMT only (the multi-cell section reassembly of §2.4.4
  * would need cross-packet state for tables that in practice fit one
  * cell); a section longer than its cell refuses rather than truncates.
  *
  * Reference behavior surface: jwodder/logsdb stores opaque bodies and
  * never decodes media; this operator belongs to the training-data
  * pipeline family (SURVEY.md §2, multimodal) — TS is the packaging a
  * crawl sees from broadcast capture and HLS, and re-mux dedup over it
  * needs exactly this layout-free inventory.
  */
case class MpegTsTables(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = MpegTsTables.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    MpegTsTables.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MpegTsTables.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): MpegTsTables =
    copy(child = newChild)

  override def prettyName: String = "mpegts_tables"
}

object MpegTsTables {
  val streamSchema: StructType = StructType(Seq(
    StructField("pid", LongType, nullable = false),
    StructField("stream_type", LongType, nullable = false),
    StructField("pes_count", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("avg_pes_bytes", LongType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("streams", ArrayType(streamSchema, containsNull = false),
      nullable = true)))

  private val Cell = 188
  private val Cap = Mp4FragmentTables.TrackCap

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private val refusedRow: InternalRow = new GenericInternalRow(Array[Any](null))

  /** Per-stream accumulator: PMT declaration order preserved by the
    * caller's insertion-ordered list.
    */
  private final class Acc(val pid: Int, val streamType: Int) {
    var pes = 0L
    var bytes = 0L
    var minPts = -1L
    var maxPts = -1L
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Two passes over the fixed cell grid: PSI first (PAT → PMT → the
    * declared stream set — cells are order-independent at this layer, a
    * muxer may emit PES before the tables repeat), then the elementary
    * cells.
    */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n == 0 || n % Cell != 0) return refusedRow
    val cells = n / Cell
    // cell-header sanity + sync lock, once
    var c = 0
    while (c < cells) {
      val o = c * Cell
      if ((b(o) & 0xff) != 0x47) return refusedRow
      if (((b(o + 3) >> 4) & 0x3) == 0) return refusedRow // AFC 00 reserved
      c += 1
    }
    // payload start offset within a cell, or -1 when the adaptation
    // field is malformed / leaves no payload
    def payloadStart(o: Int): Int = {
      val afc = (b(o + 3) >> 4) & 0x3
      if (afc == 2) return -2 // adaptation only: no payload, legal
      if (afc == 1) return o + 4
      val len = b(o + 4) & 0xff
      if (len > 183) return -1
      val s = o + 5 + len
      if (s > o + Cell) return -1 else s
    }
    // ---- PAT (PID 0): first PUSI cell names the PMT PID ----
    var pmtPid = -1
    c = 0
    while (c < cells && pmtPid < 0) {
      val o = c * Cell
      val pid = u16(b, o + 1) & 0x1fff
      val pusi = (b(o + 1) & 0x40) != 0
      if (pid == 0 && pusi) {
        val ps = payloadStart(o)
        if (ps < 0) return refusedRow
        val ptr = b(ps) & 0xff
        val s = ps + 1 + ptr
        if (s + 8 > o + Cell) return refusedRow
        if ((b(s) & 0xff) != 0x00) return refusedRow // table_id
        val secLen = u16(b, s + 1) & 0xfff
        val secEnd = s + 3 + secLen
        if (secEnd > o + Cell) return refusedRow // single-cell sections only
        // entries between the 5-byte post-length header and the 4 CRC bytes
        var e = s + 8
        while (e + 4 <= secEnd - 4 && pmtPid < 0) {
          val prog = u16(b, e)
          if (prog != 0) pmtPid = u16(b, e + 2) & 0x1fff
          e += 4
        }
        if (pmtPid < 0) return refusedRow // a PAT naming no program
      }
      c += 1
    }
    if (pmtPid < 0) return refusedRow
    // ---- PMT: stream_type -> elementary PID, declaration order ----
    val order = scala.collection.mutable.ArrayBuffer.empty[Acc]
    val byPid = scala.collection.mutable.LongMap.empty[Acc]
    var havePmt = false
    c = 0
    while (c < cells && !havePmt) {
      val o = c * Cell
      val pid = u16(b, o + 1) & 0x1fff
      val pusi = (b(o + 1) & 0x40) != 0
      if (pid == pmtPid && pusi) {
        val ps = payloadStart(o)
        if (ps < 0) return refusedRow
        val ptr = b(ps) & 0xff
        val s = ps + 1 + ptr
        if (s + 12 > o + Cell) return refusedRow
        if ((b(s) & 0xff) != 0x02) return refusedRow // table_id
        val secLen = u16(b, s + 1) & 0xfff
        val secEnd = s + 3 + secLen
        if (secEnd > o + Cell) return refusedRow
        val progInfoLen = u16(b, s + 10) & 0xfff
        var e = s + 12 + progInfoLen
        while (e + 5 <= secEnd - 4) {
          val st = b(e) & 0xff
          val epid = u16(b, e + 1) & 0x1fff
          val esInfoLen = u16(b, e + 3) & 0xfff
          if (byPid.contains(epid)) return refusedRow // duplicate ES PID
          val acc = new Acc(epid, st)
          order += acc
          byPid(epid) = acc
          e += 5 + esInfoLen
        }
        if (e != secEnd - 4) return refusedRow // loop must land on the CRC
        havePmt = true
      }
      c += 1
    }
    if (!havePmt || order.isEmpty) return refusedRow
    // ---- elementary cells: PES headers + content byte accounting ----
    c = 0
    while (c < cells) {
      val o = c * Cell
      val pid = u16(b, o + 1) & 0x1fff
      val acc = byPid.getOrElse(pid, null)
      if (acc != null) {
        val ps = payloadStart(o)
        if (ps == -1) return refusedRow
        if (ps >= 0) {
          val pusi = (b(o + 1) & 0x40) != 0
          var s = ps
          if (pusi) {
            // §2.4.3.6: a unit-start elementary cell opens with the
            // 00 00 01 start code
            if (s + 9 > o + Cell) return refusedRow
            if ((b(s) & 0xff) != 0 || (b(s + 1) & 0xff) != 0 ||
                (b(s + 2) & 0xff) != 1) return refusedRow
            if (((b(s + 6) >> 6) & 0x3) != 2) return refusedRow // '10' marker
            val ptsDts = (b(s + 7) >> 6) & 0x3
            val hdrLen = b(s + 8) & 0xff
            val hdrEnd = s + 9 + hdrLen
            if (hdrEnd > o + Cell) return refusedRow
            if ((ptsDts & 0x2) != 0) {
              if (hdrLen < 5) return refusedRow
              val p = s + 9
              // 33-bit PTS: 4 marker-framed fields (§2.4.3.7)
              val pts = (((b(p) >> 1) & 0x7).toLong << 30) |
                ((u16(b, p + 1) >> 1).toLong << 15) |
                (u16(b, p + 3) >> 1).toLong
              if (acc.minPts < 0 || pts < acc.minPts) acc.minPts = pts
              if (pts > acc.maxPts) acc.maxPts = pts
            }
            acc.pes = Math.addExact(acc.pes, 1L)
            s = hdrEnd
          }
          acc.bytes = Math.addExact(acc.bytes, (o + Cell - s).toLong)
          if (acc.pes > Cap || acc.bytes > Cap) return refusedRow
        }
      }
      c += 1
    }
    val streams = order.map { a =>
      val durMs =
        if (a.minPts < 0 || a.maxPts <= a.minPts) 0L
        else Math.multiplyExact(a.maxPts - a.minPts, 1000L) / 90000L
      new GenericInternalRow(Array[Any](
        a.pid.toLong, a.streamType.toLong, a.pes, a.bytes, durMs,
        if (a.pes == 0) 0L else a.bytes / a.pes)): InternalRow
    }
    new GenericInternalRow(
      Array[Any](new GenericArrayData(streams.toArray[Any])))
  }

  def apply(c: Column): Column =
    GraftBridge.column(MpegTsTables(GraftBridge.expression(c)))
}
