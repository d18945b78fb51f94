package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Overlay probe (r10 verdict item 6): put a NUMBER on the
  * `spark.graft.reliableBarriers` knob. `docs/PLANS.md` calls the
  * storage-backed barrier "cheap insurance" on the argument that the
  * barriered intermediates (edge lists, component labels, verdict tables)
  * are orders of magnitude smaller than the corpus; this main measures
  * that claim on the two heaviest barriered registered routes — e05 (the
  * fused multimodal corpus: two perceptual near-dup joins + a components
  * run, multiple barriers) and d09 (the connected-components loop, one
  * barrier per propagation round) — local vs reliable mode on the same
  * corpus with Bench's median-of-3 + load-recording methodology. Results
  * land in `bench/barrier_overlay_r11.json`; the headline overhead
  * percentage goes into docs/PLANS.md next to the guidance it prices.
  *
  * Test scope: a measurement harness, not library surface (the
  * ScratchProbe precedent, r9 verdict item 7).
  *
  * Run: sbt "Test/runMain graft.BarrierProbe"
  */
object BarrierProbe {

  private def loadavg(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_BARRIER_OUT",
      "bench/barrier_overlay_r11.json")
    val queries = Seq("e05_multimodal_corpus", "d09_dedup_clusters")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = Files.createTempDirectory("graft_barrier_probe_ck")
    spark.sparkContext.setCheckpointDir(ckDir.toString)

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[barrier-probe] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both routes once (local mode) so codegen/readers are hot
    // before either mode's measured triple
    queries.foreach(run)

    def triple(name: String, reliable: Boolean): (Double, Double, Seq[Double]) = {
      spark.conf.set(graft.ops.Barrier.ConfKey, reliable.toString)
      val rs = Seq(run(name), run(name), run(name))
      val med = if (rs.exists(_ < 0)) -1.0 else rs.sorted.apply(1)
      val min = if (rs.exists(_ < 0)) -1.0 else rs.min
      (med, min, rs)
    }
    def r3(v: Double) =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val gateLoad = loadavg()
    val rows = queries.map { n =>
      // local/reliable triples interleaved per query so a load drift hits
      // both modes rather than biasing one
      val (lm, lmin, lr) = triple(n, reliable = false)
      val (rm, rmin, rr) = triple(n, reliable = true)
      val overheadMed = if (lm > 0 && rm > 0) (rm / lm - 1) * 100 else Double.NaN
      val overheadMin = if (lmin > 0 && rmin > 0) (rmin / lmin - 1) * 100 else Double.NaN
      System.err.println(
        f"[barrier-probe] $n%-24s local=$lm%.2f reliable=$rm%.2f " +
          f"overhead=$overheadMed%.1f%% (min-based $overheadMin%.1f%%)")
      s""""$n":{"local_med":${r3(lm)},"reliable_med":${r3(rm)},""" +
        s""""local_min":${r3(lmin)},"reliable_min":${r3(rmin)},""" +
        s""""overhead_med_pct":${r3(overheadMed)},"overhead_min_pct":${r3(overheadMin)},""" +
        s""""runs_local":[${lr.map(r3).mkString(",")}],"runs_reliable":[${rr.map(r3).mkString(",")}]}"""
    }
    val sfName = new java.io.File(sfDir).getName
    val json =
      s"""{"sf":"$sfName","gate_load":$gateLoad,"stat":"median_of_3","ck_dir":"local tmp (cluster deployments pay object-store write latency instead)","queries":${rows.mkString("{", ",", "}")}}"""
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
