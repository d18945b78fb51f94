package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a document's word multiset — the corpus-scale
  * fingerprint width ([[SimHash16]]'s 16 bits band into 5-6-bit blocking
  * keys, i.e. at most 64 buckets per band — effectively all-pairs divided by
  * a small constant on a large corpus; 64 bits band into 4×16-bit keys =
  * 65536 buckets per band, which is what production near-dup pipelines run).
  *
  * Bit b (0..63) of the fingerprint is the sign of the per-bit ±1 sum over
  * words, where a word's bit b comes from hex digit b/4 of lowercase
  * md5(word) (nibble bit 3-b%4) — the same digit convention as SimHash16, so
  * the oracle mirrors it with string arithmetic. The result long carries
  * fingerprint bit b at binary position 63-b: reading the long MSB-first
  * equals the oracle's 64-char bitstring left-to-right, making the k-th
  * 16-bit band `(sh >>> (48 - 16k)) & 0xFFFF` ≡ bitstring chars
  * [16k+1 .. 16k+16] — consistent blocking keys across engines without the
  * oracle ever constructing the signed long.
  */
case class SimHash64(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    if (text == null) return 0L
    val words = text.toString.trim.split("\\s+")
    val sums = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var wi = 0
    while (wi < words.length) {
      val digest = md.digest(words(wi).getBytes(UTF_8))
      md.reset()
      var b = 0
      while (b < 64) {
        val hexDigit = b / 4 // hex digits 0..15 = first 8 digest bytes
        val byte = digest(hexDigit / 2)
        val nibble = if (hexDigit % 2 == 0) (byte >> 4) & 0xf else byte & 0xf
        val bit = (nibble >> (3 - (b % 4))) & 1
        sums(b) += 2 * bit - 1
        b += 1
      }
      wi += 1
    }
    var sh = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) >= 0) sh |= 1L << (63 - i)
      i += 1
    }
    sh
  }

  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}
