package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-merge FLATNESS probe for the scaled BPE trainer (r15 verdict item 2:
  * "probe two merge counts" — this runs three, so the artifact carries two
  * independent marginal-cost estimates). The thing to prove is that
  * [[graft.ops.Bpe.trainMergesScaled]]'s cost is `fixed + k · marginal`
  * with a marginal that does NOT grow in k — the t19 per-merge-job form's
  * failure mode at production k is a per-iteration cost that grows with
  * the merge index (lineage-deepening chained replaces). Method: time the
  * full t21 training (fixture dict + trainer) at k ∈ {64, 160, 256},
  * median of 3, and report the two marginal per-merge costs
  * `(t160−t64)/96` and `(t256−t160)/96` — flat means they agree (and are
  * milliseconds); a k-growing per-merge cost would make the second
  * strictly larger. Output: one JSON line, also written to
  * SPARK_GRAFT_BPE_OUT (default bench/bpe_flatness_r17.json).
  *
  * r17 adds the APPLICATION half (r16 verdict item 1): tokenize the full
  * dict under the k-merge model through the native
  * [[graft.functions.BpeApply]] route and report the same marginals
  * (`app_*` fields). The fold form's failure mode is plan/codegen growth
  * linear in k; the native route holds the model as one plan object, so
  * a flat app marginal is the evidence that application — the half a
  * 100 TB tokenize actually runs per row — scales to production k.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_BPE_OUT", "bench/bpe_flatness_r17.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dict() = Tables.documents(spark, sfDir)
      .select(explode(expr(
        """transform(sequence(0, 3), j ->
             substring(md5(concat('bpe:', CAST(doc_id AS STRING), ':',
                                  CAST(j AS STRING))), 1, 8))""")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

    def time(k: Int): Double = {
      val t0 = System.nanoTime()
      val m = graft.ops.Bpe.trainMergesScaled(dict(), numMerges = k)
      require(m.length == k, s"expected $k merges, trained ${m.length}")
      (System.nanoTime() - t0) / 1e9
    }
    time(8) // warmup: parquet readers + codegen for the dict plan

    val ks = Seq(64, 160, 256)
    val med = ks.map { k =>
      val rs = Seq(time(k), time(k), time(k))
      k -> rs.sorted.apply(1)
    }.toMap
    val m1 = (med(160) - med(64)) / 96.0
    val m2 = (med(256) - med(160)) / 96.0

    // APPLICATION flatness: tokenize the dict under the k-merge model via
    // the native route; the timed region is application only (models are
    // pre-trained outside it). The checksum aggregate forces full
    // evaluation of every token array.
    val models = ks.map(k =>
      k -> graft.ops.Bpe.trainMergesScaled(dict(), numMerges = k)).toMap
    def timeApp(k: Int): Double = {
      val t0 = System.nanoTime()
      val n = dict()
        .select(graft.ops.Bpe.tokens(col("w"), models(k)).as("toks"))
        .agg(sum(size(col("toks")))).collect()(0).getLong(0)
      require(n > 0L, s"empty tokenization at k=$k")
      (System.nanoTime() - t0) / 1e9
    }
    timeApp(64) // warmup the application plan shape
    val appMed = ks.map { k =>
      val rs = Seq(timeApp(k), timeApp(k), timeApp(k))
      k -> rs.sorted.apply(1)
    }.toMap
    val a1 = (appMed(160) - appMed(64)) / 96.0
    val a2 = (appMed(256) - appMed(160)) / 96.0

    def r4(v: Double) =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    // ambient 1-min loadavg at launch — the same self-describing capture
    // stamp Bench carries; a reader can judge window quality from the
    // artifact alone
    val gateLoad = scala.util.Try(
      new String(Files.readAllBytes(Paths.get("/proc/loadavg")))
        .split("\\s+")(0).toDouble).getOrElse(-1.0)
    val json =
      s"""{"sf":"${new java.io.File(sfDir).getName}","stat":"median_of_3",""" +
        s""""gate_load":$gateLoad,""" +
        s""""t64":${r4(med(64))},"t160":${r4(med(160))},"t256":${r4(med(256))},""" +
        s""""marginal_64_160":${r4(m1)},"marginal_160_256":${r4(m2)},""" +
        s""""app_t64":${r4(appMed(64))},"app_t160":${r4(appMed(160))},""" +
        s""""app_t256":${r4(appMed(256))},"app_marginal_64_160":${r4(a1)},""" +
        s""""app_marginal_160_256":${r4(a2)}}"""
    println(json)
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
