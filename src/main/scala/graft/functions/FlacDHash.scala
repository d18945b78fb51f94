package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL audio hash over FLAC-decoded PCM — [[WavDHash]]'s exact
  * construction (65 equal time windows over the per-channel frame stream,
  * per-window energy = Σ |amplitude| across channels, bit i = energy(i+1)
  * > energy(i)) applied to the samples reconstructed by the from-spec
  * [[FlacFeatures]] decoder. Because FLAC is LOSSLESS, a WAV and a FLAC
  * encoding of the same recording decode to identical samples and
  * therefore hash IDENTICALLY — cross-codec audio near-dup costs nothing
  * beyond running both decoders, the audio analog of [[JpegDHash]] vs
  * [[PpmDHash]] (where only near-equality holds, JPEG being lossy).
  *
  * Windowing needs the total frame count up front; STREAMINFO declares it,
  * and [[FlacFeatures]] refuses any stream whose decoded count disagrees,
  * so the windows here are provably over the real sample count. Streams
  * with an unknown total (0) or under 65 frames refuse — a window may not
  * be empty, [[WavDHash]]'s rule. The trailing `frames mod 65` remainder
  * is excluded by construction, so encodings that differ only in a
  * sub-window tail still hash identically. All of [[FlacFeatures]]'
  * refusals apply unchanged; refusal is SQL NULL, never a misread.
  */
case class FlacDHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    FlacDHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FlacDHash.hash($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): FlacDHash =
    copy(child = newChild)

  override def prettyName: String = "flac_dhash"
}

object FlacDHash {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns the 64-char bitstring, or null on any [[FlacFeatures]]
    * refusal (plus unknown/short totals, which windowing cannot serve).
    */
  def hash(b: Array[Byte]): UTF8String = {
    val st = new FlacFeatures.St
    val win = new Array[Long](65)
    if (FlacFeatures.run(b, st, win) != 0) return null
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) {
      out(k) = if (win(k + 1) > win(k)) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(FlacDHash(GraftBridge.expression(c)))
}
