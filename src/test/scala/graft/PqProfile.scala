package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (test scope, like ScratchProbe): stage timings for the PQ
  * training forms, to aim optimization at the measured dominant stage
  * rather than a guess. Run:
  *   sbt 'Test/runMain graft.PqProfile /root/testdata/sf0.1'
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq-profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val e = Tables.embeddings(spark, sfDir)
    sink(e.limit(5)) // warmup
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val (cb, codes) = graft.ops.Similarity.buildPqIndex(e)
      time("buildPqIndex: codebooks")(sink(cb))
      time("buildPqIndex: codes")(sink(codes))
      time("s07 full (topkPq)")(sink(
        graft.ops.Similarity.topkPq(e, col("vec_id") % 40 === 0, k = 3)))
      val (ict, icb, icodes) = graft.ops.Similarity.buildIvfPqIndex(e)
      time("buildIvfPqIndex: centroids")(sink(ict))
      time("buildIvfPqIndex: codebooks")(sink(icb))
      time("buildIvfPqIndex: codes")(sink(icodes))
      time("s08 full (topkIvfPq)")(sink(
        graft.ops.Similarity.topkIvfPq(e, col("vec_id") % 40 === 0, k = 3)))
    }
    spark.stop()
  }
}
