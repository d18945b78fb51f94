package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash band signatures over a document's shingle array: for each of
  * `numHashes` salted hash functions take the minimum lowercase-hex
  * `md5("<h>:" + shingle)` over the array, then emit one md5 signature per
  * band of `bandSize` consecutive minima (joined with '|').
  *
  * One codegen'd per-row computation in the scan stage — the signature matrix
  * needs no shingle explode and no |grams|-row aggregation (those remain only
  * in the exact-Jaccard verification of candidates). Arithmetic matches the
  * SQL/oracle formulation string-for-string: fixed-width hex mins compare
  * identically as strings and numbers.
  */
case class MinHashBandSigs(child: Expression, numHashes: Int, bandSize: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(ArrayType(StringType))

  require(numHashes % bandSize == 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandSigs.compute(input.asInstanceOf[ArrayData], numHashes, bandSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandSigs.compute($c, $numHashes, $bandSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_band_sigs"
}

object MinHashBandSigs {
  private val Hex = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(UTF_8))
    md.reset()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte-array compare — equals lexicographic order of the lowercase
    * hex rendering, so minima agree with the SQL string-min formulation.
    */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Inner loop hashes salt+gram bytes directly and tracks minima as raw
    * digests (unsigned compare ≡ hex-string compare); hex strings are built
    * only for the final per-band signatures.
    */
  /** Per-hash minimum digests (1-indexed; null slot 0), or null when the
    * shingle array is empty — the shared inner loop of both expressions.
    */
  private def minDigests(md: MessageDigest, grams: ArrayData,
      numHashes: Int): Array[Array[Byte]] = {
    val salts = Array.tabulate(numHashes + 1)(h => s"$h:".getBytes(UTF_8))
    val mins = new Array[Array[Byte]](numHashes + 1)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      if (g != null) {
        val gBytes = g.getBytes
        var h = 1
        while (h <= numHashes) {
          md.update(salts(h))
          md.update(gBytes)
          val digest = md.digest()
          if (mins(h) == null || lessThan(digest, mins(h))) mins(h) = digest
          h += 1
        }
      }
      i += 1
    }
    if (mins(1) == null) null else mins
  }

  def compute(grams: ArrayData, numHashes: Int, bandSize: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = minDigests(md, grams, numHashes)
    // no shingles ⇒ no signatures (matches the SQL formulation, where such
    // docs are simply absent from the signature aggregation)
    if (mins == null) return new GenericArrayData(new Array[AnyRef](0))
    val numBands = numHashes / bandSize
    val sigs = new Array[AnyRef](numBands)
    var b = 0
    while (b < numBands) {
      val joined = (1 to bandSize)
        .map(p => toHex(mins(b * bandSize + p))).mkString("|")
      sigs(b) = UTF8String.fromString(md5Hex(md, joined))
      b += 1
    }
    new GenericArrayData(sigs)
  }

  /** The raw k-vector of per-hash hex minima (empty for shingle-less docs) —
    * the signature payload a streaming near-dup keeps in state to ESTIMATE
    * Jaccard (matching positions / k) without a shingle join.
    */
  def computeMins(grams: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = minDigests(md, grams, numHashes)
    if (mins == null) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](numHashes)
    var h = 1
    while (h <= numHashes) {
      out(h - 1) = UTF8String.fromString(toHex(mins(h)))
      h += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, numHashes: Int, bandSize: Int): Column =
    GraftBridge.column(
      MinHashBandSigs(GraftBridge.expression(c), numHashes, bandSize))
}

/** Native per-hash MinHash minima — [[MinHashBandSigs]] without the banding:
  * returns the k lowercase-hex minima `min(md5("<h>:" + shingle))` as an
  * array. Same arithmetic as the band signatures (a band signature is the md5
  * of '|'-joined consecutive minima), so band keys derived from this vector
  * match [[MinHashBandSigs]] exactly.
  */
case class MinHashMins(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandSigs.computeMins(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBandSigs.computeMins($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashMins =
    copy(child = newChild)

  override def prettyName: String = "minhash_mins"
}

object MinHashMins {
  def apply(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashMins(GraftBridge.expression(c), numHashes))
}
