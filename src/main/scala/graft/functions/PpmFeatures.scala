package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL pixel-level decode of binary netpbm images — the one raster family
  * fully decodable with zero codec libraries, which is exactly why production
  * pipelines keep a netpbm path for fixtures and debugging. Closes the
  * pixel-feature gap left by the (still-stubbed, clearly-labeled) JPEG/PNG
  * pixel path: header fields AND per-channel pixel statistics here are
  * computed from the actual image bytes.
  *
  *  - P6 (binary PPM): header `P6 <w> <h> <maxval>` as whitespace-separated
  *    ASCII tokens with `#`-to-EOL comments allowed between them, one
  *    whitespace byte, then `w*h*3` raw RGB samples (for maxval < 256);
  *  - P5 (binary PGM): same header, `w*h` gray samples; the gray sum is
  *    reported in all three channel slots (r = g = b for gray);
  *  - 2-byte-per-sample images (maxval ≥ 256), truncated pixel data, or any
  *    other magic yield format "ppm"/"pgm" with null stats (or "unknown") —
  *    never a misread.
  *
  * Output: `struct<format, width, height, maxval, n_pixels, sum_r, sum_g,
  * sum_b>` with integer channel sums — exact, order-independent, and
  * mirrorable in the DuckDB oracle (doubles would neither be portable nor
  * associative). One codegen'd per-row call in the scan stage: pixel
  * statistics at 100 TB never shuffle anything but the per-asset struct.
  */
case class PpmFeatures(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = PpmFeatures.schema

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    PpmFeatures.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PpmFeatures.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): PpmFeatures =
    copy(child = newChild)

  override def prettyName: String = "ppm_features"
}

object PpmFeatures {

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

  /** Static entry point shared by interpreted eval and generated code. */
  def decode(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      return row("unknown", nulls.clone())
    val fmt = if (b(1) == '6') "ppm" else "pgm"
    val channels = if (b(1) == '6') 3 else 1

    // header tokenizer: whitespace-separated decimal ints, '#' comments run
    // to end of line; returns -1 on malformed/overflowing/absent token
    var i = 2
    def nextInt(): Long = {
      var inComment = false
      while (i < n && (inComment || b(i) == ' ' || b(i) == '\t' ||
          b(i) == '\n' || b(i) == '\r' || b(i) == '#')) {
        if (b(i) == '#') inComment = true
        else if (b(i) == '\n') inComment = false
        i += 1
      }
      if (i >= n || b(i) < '0' || b(i) > '9') return -1L
      var v = 0L
      while (i < n && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0')
        if (v > Int.MaxValue) return -1L
        i += 1
      }
      v
    }

    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0) return row(fmt, nulls.clone())
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= n || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'))
      return row(fmt, nulls.clone())
    i += 1
    if (maxval > 255) // 2-byte samples: refuse rather than misread
      return row(fmt, Array[Any](w, h, maxval, w * h, null, null, null))
    // truncated-raster guard in overflow-safe form: w and h are each capped
    // at Int.MaxValue by nextInt, so w*h fits a Long (≤ 2^62), but a further
    // *channels could wrap negative and slip past a `n - i < need` check —
    // compare against the available bytes by division instead
    val wh = w * h
    if (wh > (n.toLong - i) / channels)
      return row(fmt, Array[Any](w, h, maxval, wh, null, null, null))
    val need = wh * channels

    // need ≤ n - i ≤ Int.MaxValue here, so the toInt is exact
    var sr = 0L; var sg = 0L; var sb = 0L
    if (channels == 3) {
      var p = i
      val end = i + need.toInt
      while (p < end) {
        sr += b(p) & 0xff
        sg += b(p + 1) & 0xff
        sb += b(p + 2) & 0xff
        p += 3
      }
    } else {
      var p = i
      val end = i + need.toInt
      while (p < end) { sr += b(p) & 0xff; p += 1 }
      sg = sr; sb = sr // gray: one channel reported in all three slots
    }
    row(fmt, Array[Any](w, h, maxval, wh, sr, sg, sb))
  }

  def apply(c: Column): Column =
    GraftBridge.column(PpmFeatures(GraftBridge.expression(c)))
}
