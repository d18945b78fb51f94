package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PERCEPTUAL audio hash over REAL decoded PCM samples — the audio member
  * of the difference-hash family ([[PpmDHash]] for images): the decoded
  * amplitude stream is split into 65 equal time windows, per-window energy
  * is the integer sum of absolute amplitudes across channels, and bit i
  * says whether window i+1 carries more energy than window i. Two
  * recordings of the same content produce bitstrings within a small
  * Hamming distance — uniform gain changes cancel entirely (every
  * comparison scales both sides), which is the perceptual property that
  * makes energy-gradient signs the standard cheap audio near-dup filter
  * (full chromaprints add a spectral transform; the container gives us no
  * FFT, and the time-domain envelope is already discriminative).
  *
  * Output is the 64-char '0'/'1' bitstring, same contract as
  * [[PpmDHash]]: banded near-dup joins and Hamming verification reuse the
  * SimHash oracle idioms verbatim. Refusals — non-PCM, widths other than
  * 8/16 bits, more than 2 channels, truncated data, or fewer than 65
  * frames (no window can be empty) — are SQL NULL, never a misread. The
  * trailing `frames mod 65` remainder is excluded by construction, so
  * containers that differ only in a sub-window tail hash identically.
  */
case class WavDHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(BinaryType)

  override protected def nullSafeEval(input: Any): Any =
    WavDHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavDHash.hash($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): WavDHash =
    copy(child = newChild)

  override def prettyName: String = "wav_dhash"
}

object WavDHash {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong) | (le16(b, i + 2).toLong << 16)

  /** Static entry point shared by interpreted eval and generated code.
    * Returns the 64-char bitstring, or null on refusal. Container rules
    * are [[WavFeatures]]' (canonical RIFF walk, PCM only, word-aligned
    * chunks) as a single accept/refuse gate.
    */
  def hash(b: Array[Byte]): UTF8String = {
    val n = b.length
    if (n < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return null
    var i = 12
    var haveFmt = false
    var audioFormat = -1; var channels = -1; var bits = -1; var blockAlign = -1
    while (i + 8 <= n) {
      val size = le32(b, i + 4)
      val body = i + 8
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      if (isFmt) {
        if (size < 16 || body + 16 > n) return null
        audioFormat = le16(b, body)
        channels = le16(b, body + 2)
        blockAlign = le16(b, body + 12)
        bits = le16(b, body + 14)
        haveFmt = true
      } else if (isData) {
        if (!haveFmt) return null
        val bytesPer = bits / 8
        if (audioFormat != 1 || (bits != 8 && bits != 16) ||
            channels < 1 || channels > 2 ||
            blockAlign != channels * bytesPer ||
            size % blockAlign != 0 || size > n.toLong - body) return null
        val frames = (size / blockAlign).toInt
        if (frames < 65) return null // a window may not be empty
        val wsize = frames / 65 // trailing remainder excluded by design
        val energy = new Array[Long](65)
        var w = 0
        while (w < 65) {
          var e = 0L
          var f = w * wsize
          val end = f + wsize
          while (f < end) {
            var c = 0
            while (c < channels) {
              val p = body + f * blockAlign + c * bytesPer
              val v =
                if (bits == 8) (b(p) & 0xff) - 128
                else { val u = le16(b, p); if (u < 32768) u else u - 65536 }
              e += (if (v < 0) -v else v)
              c += 1
            }
            f += 1
          }
          energy(w) = e
          w += 1
        }
        val out = new Array[Byte](64)
        var k = 0
        while (k < 64) {
          out(k) = if (energy(k + 1) > energy(k)) '1' else '0'
          k += 1
        }
        return UTF8String.fromBytes(out)
      }
      if (size > n.toLong - body) return null // ragged non-data chunk
      i = body + size.toInt + (size.toInt & 1)
    }
    null // no data chunk
  }

  def apply(c: Column): Column =
    GraftBridge.column(WavDHash(GraftBridge.expression(c)))
}
