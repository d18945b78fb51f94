package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of composed queries (not part of the
  * driver contract; excluded from the bench registry). Lives in TEST scope
  * (r9 verdict item 7): a dev `main` with hardcoded local paths does not
  * belong in the production jar. Run via `sbt 'Test/runMain graft.ScratchProbe'`.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup") {
      Tables.documents(spark, sfDir).limit(5).write.mode("overwrite")
        .format("noop").save()
    }
    time("m18 assets materialize") {
      EntryOps.mpegL1Assets(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    time("m18 decode struct only") {
      EntryOps.mpegL1Assets(spark, sfDir)
        .select(col("asset_id"),
          graft.functions.MpegL1Samples(col("payload")).as("f"))
        .write.mode("overwrite").format("noop").save()
    }
    time("m18 full (7-field select)") {
      EntryOps.mpegL1Pcm(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    time("m17 full") {
      EntryOps.jpegProgressivePixels(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    time("m19 assets materialize") {
      EntryOps.flacAssets(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    time("m19 full") {
      EntryOps.flacPcm(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    var ck: org.apache.spark.sql.DataFrame = null
    time("m19 assets -> localCheckpoint") {
      ck = EntryOps.flacAssets(spark, sfDir).localCheckpoint()
    }
    time("m19 decode from checkpoint") {
      ck.select(col("asset_id"),
          graft.functions.Staged(
            graft.functions.FlacFeatures(col("payload"))).as("f"))
        .select(col("asset_id"), col("f.format"), col("f.sample_rate"),
          col("f.channels"), col("f.bits"), col("f.n_blocks"),
          col("f.n_samples"), col("f.sum_ch0"), col("f.sum_ch1"),
          col("f.peak_abs"))
        .write.mode("overwrite").format("noop").save()
    }
    time("m19 decode+sort from checkpoint") {
      ck.select(col("asset_id"),
          graft.functions.Staged(
            graft.functions.FlacFeatures(col("payload"))).as("f"))
        .select(col("asset_id"), col("f.format"), col("f.n_samples"))
        .orderBy(col("asset_id"))
        .write.mode("overwrite").format("noop").save()
    }
    time("e05 full") {
      EntryOps.multimodalCorpus(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    time("e06 full") {
      EntryOps.jpegCorpus(spark, sfDir).write.mode("overwrite")
        .format("noop").save()
    }
    spark.stop()
  }
}
