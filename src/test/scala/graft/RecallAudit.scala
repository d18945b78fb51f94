package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.HyperplaneBucket
import graft.ops.Similarity

/** Recall audit for the hyperplane-LSH family (dev main, test scope like
  * [[ScratchProbe]]; run `sbt 'Test/runMain graft.RecallAudit'`).
  *
  * Two measurements, both against the REAL deterministic coefficient
  * planes (never iid theory — the r13 advice: a structured family can
  * share planes across tables, and 1 − (1 − r)^T silently overstates
  * banded recall when it does):
  *
  *  1. PAIR COLLISION RATES on synthetic controlled-cosine pairs
  *     (4 000 per cosine level, seeded PRNG): single-table rate at each
  *     plane count, banded any-of-T rate at T = 4 tables, and the iid
  *     1 − (1 − r)^T prediction from the measured single-table rates of
  *     the four table offsets — the gap between the last two is the
  *     plane-sharing signature.
  *  2. ANN recall@3 of the registered approximate routes vs exact brute
  *     force on the sf0.001 fixture (the OpsSpec floor fixture,
  *     queries vec_id % 40 == 0) — the numbers the OpsSpec floors pin.
  */
object RecallAudit {

  private def bucket(v: Array[Float], planes: Int, offset: Int): Int =
    HyperplaneBucket.compute(new GenericArrayData(v), planes, 64, offset)

  /** Deterministic pair at an exact target cosine: partner = base·cosθ +
    * orth·sinθ with orth the Gram-Schmidt residual of an independent
    * draw.
    */
  private def pairAt(rng: java.util.Random, cos: Double)
      : (Array[Float], Array[Float]) = {
    val a = Array.fill(64)(rng.nextGaussian())
    val b0 = Array.fill(64)(rng.nextGaussian())
    val na = math.sqrt(a.map(x => x * x).sum)
    val au = a.map(_ / na)
    val proj = au.zip(b0).map { case (x, y) => x * y }.sum
    val orth = b0.zip(au).map { case (y, x) => y - proj * x }
    val no = math.sqrt(orth.map(x => x * x).sum)
    val sin = math.sqrt(1 - cos * cos)
    val b = au.zip(orth).map { case (x, o) => cos * x + sin * o / no }
    (au.map(_.toFloat), b.map(_.toFloat))
  }

  def main(args: Array[String]): Unit = {
    val nPairs = 4000
    val tables = 4
    println("== pair collision rates (new coefficient family, 4000 pairs) ==")
    println("cosine planes single banded4 iid_pred per_table_rates")
    for (cos <- Seq(0.90, 0.95, 0.99); p <- Seq(4, 5, 8, 12, 16, 17)) {
      val rng = new java.util.Random(0xC0FFEE + p)
      val perTable = Array.fill(tables)(0)
      var banded = 0
      var i = 0
      while (i < nPairs) {
        val (a, b) = pairAt(rng, cos)
        var any = false
        var t = 0
        while (t < tables) {
          if (bucket(a, p, t * p) == bucket(b, p, t * p)) {
            perTable(t) += 1; any = true
          }
          t += 1
        }
        if (any) banded += 1
        i += 1
      }
      val rates = perTable.map(_.toDouble / nPairs)
      // iid prediction from the mean per-table rate — what 4 genuinely
      // independent tables of this quality would deliver
      val rbar = rates.sum / tables
      val iid = 1 - math.pow(1 - rbar, tables)
      println(f"$cos%.2f   p=$p%-3d ${rates(0)}%.3f  ${banded.toDouble / nPairs}%.3f   $iid%.3f    ${rates.map(r => f"$r%.3f").mkString(" ")}")
    }

    println("\n== ANN recall@3 vs exact, sf0.001 fixture (OpsSpec floors) ==")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 40 === 0
    val k = 3
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.topkBruteForce(emb, pred, k))
    for ((name, df) <- Seq(
      ("s02_ivf", Similarity.topkIvf(emb, pred, k)),
      ("s03_lsh", Similarity.topkLsh(emb, pred, k)),
      ("s04_lsh_bands", Similarity.topkLshBands(emb, pred, k)),
      ("s05_ivf_multiprobe", Similarity.topkIvfMultiProbe(emb, pred, k)),
      ("s06_ivf_centroids", Similarity.topkIvfCentroids(emb, pred, k)),
      ("s07_pq", Similarity.topkPq(emb, pred, k)),
      ("s08_ivfpq", Similarity.topkIvfPq(emb, pred, k)))) {
      val r = (pairs(df) & exact).size.toDouble / exact.size
      println(f"$name%-20s recall@3 $r%.3f")
    }
    spark.stop()
  }
}
