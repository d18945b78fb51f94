package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL image hash (difference hash, "dHash") over REAL decoded
  * netpbm pixels — the image-side analog of SimHash: two images whose
  * contents are visually near-identical produce bitstrings within a small
  * Hamming distance, so image DEDUP becomes the same banded equi-join the
  * text near-dup family runs ([[SimHash64]] / d08), with the hash computed
  * from the actual raster bytes by the scan stage.
  *
  * Algorithm (the public dHash construction): decode the raster, sample a
  * 9×8 grayscale grid by nearest neighbor (column x → pixel column
  * ⌊x·w/9⌋, row y → ⌊y·h/8⌋; gray = (r+g+b) div 3 for P6, the sample
  * itself for P5), and emit bit y·8+x = 1 iff the right neighbor is
  * brighter than the left. Gradient signs survive brightness shifts and
  * mild noise — the property that makes dHash the standard cheap
  * near-dup filter in image pipelines.
  *
  * Output is the 64-char '0'/'1' bitstring (most-significant grid cell
  * first), NOT a long: band keys are `substring` slices and Hamming is a
  * character comparison, the exact oracle idiom the SimHash family
  * already proves — and no sign-bit pitfalls cross engines. Refusals
  * (non-netpbm magic, 2-byte samples, malformed header, truncated
  * raster) are SQL NULL, never a misread hash.
  */
case class PpmDHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    PpmDHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PpmDHash.hash($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): PpmDHash =
    copy(child = newChild)

  override def prettyName: String = "ppm_dhash"
}

object PpmDHash {

  /** Header parse for a COMPLETE 1-byte-sample netpbm raster: returns
    * (channels, w, h, raster offset) or null on any malformation — the
    * same tokenizer rules as [[PpmFeatures.decode]] (whitespace-separated
    * ints, `#` comments to end of line, exactly one whitespace byte before
    * the raster), but as a single accept/refuse gate: a hash has no
    * partial-fields row to fall back to.
    */
  private def parseRaster(b: Array[Byte]): Array[Int] = {
    val n = b.length
    if (n < 2 || b(0) != 'P' || (b(1) != '5' && b(1) != '6')) return null
    val channels = if (b(1) == '6') 3 else 1
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
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return null
    if (i >= n || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r'))
      return null
    i += 1
    if (w * h > (n.toLong - i) / channels) return null // truncated raster
    Array(channels, w.toInt, h.toInt, i)
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Returns the 64-char bitstring, or null on refusal.
    */
  def hash(b: Array[Byte]): UTF8String = {
    val p = parseRaster(b)
    if (p == null) return null
    val channels = p(0); val w = p(1); val h = p(2); val off = p(3)
    def gray(px: Int, py: Int): Int = {
      val j = py * w + px
      if (channels == 3) {
        val q = off + 3 * j
        ((b(q) & 0xff) + (b(q + 1) & 0xff) + (b(q + 2) & 0xff)) / 3
      } else b(off + j) & 0xff
    }
    val out = new Array[Byte](64)
    var y = 0
    while (y < 8) {
      val py = y * h / 8
      var x = 0
      while (x < 8) {
        val left = gray(x * w / 9, py)
        val right = gray((x + 1) * w / 9, py)
        out(y * 8 + x) = if (right > left) '1' else '0'
        x += 1
      }
      y += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(PpmDHash(GraftBridge.expression(c)))
}
