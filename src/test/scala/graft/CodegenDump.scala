package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dev scratch (test scope, like [[ScratchProbe]]): dump the generated
  * whole-stage code of one registered query to a file for janino 64 KB
  * diagnosis. Run via `sbt 'Test/runMain graft.CodegenDump <query> <out>'`.
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "m24_media_assets_mp4"
    val out = if (args.length > 1) args(1) else "/tmp/codegen_dump.txt"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    val code = df.queryExecution.debug.codegenToSeq()
      .zipWithIndex
      .map { case ((subtree, code, stats), i) =>
        s"== Subtree $i ($stats) ==\n$subtree\n$code"
      }
      .mkString("\n\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out), code.getBytes)
    println(s"[codegen-dump] wrote ${code.length} chars to $out")
    spark.stop()
  }
}
