package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native random-hyperplane LSH bucket over an `array<float>` embedding:
  * bit i of the bucket is the sign of ⟨v, h_i⟩ for `planes` fixed
  * pseudo-random hyperplanes whose components are exact integer-derived
  * doubles ((((i·37 + j·101 + i·j·53) mod 1009) mod 17 − 8) / 8; i the
  * offset-shifted plane index, j the 1-based dimension).
  *
  * The j-slope of plane i's residue sequence, (101 + 53·i) mod 1009, is
  * distinct for every plane index below 1009 (53 is invertible mod the
  * prime 1009), so every plane of every table is a genuinely distinct
  * hyperplane. A single-modulus family — ((i·37 + j·101) mod 17), the
  * pre-r14 form — is periodic with period 17 in i REGARDLESS of the
  * constants: every term is a polynomial in (i mod 17), so at most 17
  * distinct hyperplanes exist and multi-table banding silently reuses
  * them (at planes=17 all table offsets t·17 ≡ 0 mod 17, making the
  * tables bit-identical — 4× the join cost for zero recall gain). The
  * intermediate mod by the prime 1009 breaks that period while keeping
  * the components exact dyadic rationals (denominator 2³).
  *
  * Replaces a generated SQL string of planes × dims CASE/CAST terms (an
  * expression tree that grows O(planes·dims) and dominated s03's runtime)
  * with one codegen'd primitive loop. The projection accumulates in double
  * with the same FIXED left-to-right fold as the SQL form (SQL `+` is
  * left-associative) and the same float→double widening, so buckets are
  * bit-identical to the DuckDB oracle mirror (EntryOps.duckHyperplaneBucket).
  */
case class HyperplaneBucket(child: Expression, planes: Int, dims: Int,
    offset: Int)
    extends UnaryExpression with ExpectsInputTypes {
  // A negative offset pushes the truncated % residues into [-16, 16], so
  // components leave the documented exact-dyadic [-1, 1] family and the
  // distinct-plane argument no longer applies — the geometry would degrade
  // silently (DuckDB's % happens to agree, so parity would HIDE it). The
  // offset is a table index (t·planes), never meaningfully negative; fail
  // at analysis time instead (reachable from SQL via the optional 4th arg).
  require(offset >= 0,
    s"hyperplane_bucket offset must be >= 0 (got $offset): negative plane " +
      "indices leave the exact-dyadic coefficient family")
  override def dataType: DataType = IntegerType

  // array<double> input would silently read wrong buckets (getFloat over
  // 8-byte slots) — fail at analysis time instead
  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(ArrayType(FloatType))

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], planes, dims, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBucket.compute($c, $planes, $dims, $offset)")

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucket = copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

object HyperplaneBucket {
  /** Coefficient-FAMILY version of the deterministic hyperplanes this class
    * draws — persisted as `hp_family` on every embedding-index row
    * ([[graft.ops.Dedup.buildEmbedIndex]] /
    * [[graft.ops.Dedup.buildEmbedIndexBanded]]) so a reader can detect an
    * index whose bucket keys were computed under DIFFERENT planes: buckets
    * from different families never collide, so a family-mismatched join
    * silently reports every arrival `new` (zero dedup recall, duplicates
    * admitted) — the one failure the planes/dims guards cannot see, because
    * the GEOMETRY matches while the planes themselves don't. Family 1 was
    * the pre-r14 single-modulus form ((i·37 + j·101) mod 17 — periodic in
    * i with period 17); family 2 is the current mod-1009 cross-term form.
    * Increment this whenever the coefficient formula changes, in lockstep
    * with the DuckDB oracle mirror (EntryOps.duckHyperplaneBucket).
    */
  val Family: Int = 2

  /** Static entry point shared by interpreted eval and generated code.
    * A vector shorter than `dims` or containing a null element yields bucket
    * 0 — the SQL formulation's behavior (element_at beyond the end / a null
    * element NULL-propagates through the projection sum, every sign CASE
    * yields 0), so buckets stay bit-identical to the oracle on ragged input.
    */
  def compute(e: ArrayData, planes: Int, dims: Int): Int =
    compute(e, planes, dims, 0)

  /** `offset` shifts which hyperplanes are used (plane index i + offset in
    * the coefficient formula) while bit positions stay 0..planes-1 — the
    * multi-TABLE LSH primitive: table t of a banded index keys on
    * compute(e, p, dims, t·p), i.e. bit-slice t of one wide bucket,
    * without the wide bucket ever exceeding Int range.
    */
  def compute(e: ArrayData, planes: Int, dims: Int, offset: Int): Int = {
    if (e.numElements() < dims) return 0
    var j = 0
    while (j < dims) {
      if (e.isNullAt(j)) return 0
      j += 1
    }
    val planeCoefs = coefs(planes, dims, offset)
    var bucket = 0
    var i = 0
    while (i < planes) {
      val c = planeCoefs(i)
      var acc = 0.0d
      var k = 0
      while (k < dims) {
        acc += e.getFloat(k).toDouble * c(k)
        k += 1
      }
      if (acc > 0.0d) bucket |= 1 << i
      i += 1
    }
    bucket
  }

  /** Memoized coefficient matrix for a geometry: the integer derivation
    * runs once per (planes, dims, offset) per JVM — the hot per-row loop
    * is then a pure dot product. A handful of geometries exist per job,
    * so the map stays tiny; computeIfAbsent keeps racing executor threads
    * consistent.
    */
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def coefs(planes: Int, dims: Int, offset: Int): Array[Array[Double]] =
    coefCache.computeIfAbsent((planes, dims, offset), { key =>
      val (p, d, off) = key
      Array.tabulate(p) { i =>
        // long arithmetic (the oracle's BIGINT) so huge offsets can't
        // overflow; each component an exact dyadic rational in [-1, 1]
        val x = (i + off).toLong
        Array.tabulate(d) { k0 =>
          val k = k0 + 1
          (((x * 37 + k * 101 + x * k * 53) % 1009 % 17).toInt - 8)
            .toDouble / 8.0d
        }
      }
    })

  def apply(c: Column, planes: Int, dims: Int = 64, offset: Int = 0): Column =
    GraftBridge.column(
      HyperplaneBucket(GraftBridge.expression(c), planes, dims, offset))
}
