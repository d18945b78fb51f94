package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of queries to files, plus one
  * noop-sink rep timing each — the plans/rNN evidence artifacts.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new File(outDir).mkdirs()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val w = new PrintWriter(new File(outDir, s"${name}_$suffix.txt"))
      try {
        w.println(f"[plandump] $name $suffix: noop-sink rep $sec%.2f s (sfDir=$sfDir, local[$cpus])")
        w.println(plan)
      } finally w.close()
      println(f"[plandump] $name $suffix done ($sec%.2f s)")
    }
    spark.stop()
  }
}
