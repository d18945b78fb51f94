package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL hash over ENTROPY-CODED JPEG payloads — [[PpmDHash]]'s exact
  * dHash construction (9×8 nearest-neighbor grayscale grid, horizontal
  * gradient signs, 64-char bitstring) with the raster produced by the
  * from-spec baseline JPEG decoder ([[JpegFeatures]]) instead of a netpbm
  * parse. This is the composition that makes COMPRESSED image assets
  * first-class citizens of the perceptual dedup family: the hash feeds the
  * same 4×16 banded equi-join + Hamming verify the netpbm/WAV paths run
  * (d13/d14/d15), unchanged.
  *
  * Gray is (r+g+b)/3 of the decoded pixel — identical to [[PpmDHash]]'s
  * P6 rule, so a JPEG and a netpbm encoding of the SAME image hash to the
  * same neighborhood (gradient signs survive the codec's ±1 rounding except
  * on exactly-equal neighbors). Refusals (progressive/arithmetic/12-bit,
  * truncation, non-JPEG bytes) are SQL NULL, never a misread hash.
  *
  * One per-row call in the scan stage; the decode never leaves it. The
  * hash samples only 72 grid points, but the full baseline decode is
  * unavoidable — JPEG's entropy coding has no random access to pixels.
  */
case class JpegDHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    JpegDHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegDHash.hash($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegDHash =
    copy(child = newChild)

  override def prettyName: String = "jpeg_dhash"
}

object JpegDHash {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns the 64-char bitstring, or null on refusal.
    */
  def hash(b: Array[Byte]): UTF8String = {
    val d = JpegFeatures.decodePixels(b)
    if (d == null) return null
    val w = d.width
    val h = d.height
    def gray(px: Int, py: Int): Int = {
      val q = (py * w + px) * 3
      ((d.rgb(q) & 0xff) + (d.rgb(q + 1) & 0xff) + (d.rgb(q + 2) & 0xff)) / 3
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
    GraftBridge.column(JpegDHash(GraftBridge.expression(c)))
}
