package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: time one query repeatedly and dump its formatted plan.
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // q10 decomposition: line construction only
    def debugLines(s: org.apache.spark.sql.SparkSession, d: String) = {
      val ev = graft.Tables.events(s, d)
      ev.select(concat(
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), lit(" +0000|"),
        lit("www.example.com|443|1.2.3.4|"),
        col("user_id") % 1000, lit("|"), floor(col("value") * 100).cast("long"),
        lit("|"), col("user_id") * 7 % 100000, lit("|200|"),
        lit("[\"-\", \"GET /p HTTP/1.1\", \"GET\", \"/p\", \"HTTP/1.1\", \"-\", \"M\"]")).as("value"))
    }
    def rep(df: org.apache.spark.sql.DataFrame) = df.repartition(16)
    val debug: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "x_lines" -> (debugLines _),
      "x_parse" -> ((s, d) => graft.parse.ApacheParser.parse(debugLines(s, d)).events),
      "x_reqline" -> ((s, d) =>
        graft.parse.ApacheParser.parse(rep(debugLines(s, d))).events.select("reqline")),
      "x_ts" -> ((s, d) =>
        graft.parse.ApacheParser.parse(rep(debugLines(s, d))).events.select("timestamp")),
      "x_casts" -> ((s, d) =>
        graft.parse.ApacheParser.parse(rep(debugLines(s, d))).events.select("bytesin", "status")),
      "x_full" -> ((s, d) =>
        graft.parse.ApacheParser.parse(rep(debugLines(s, d))).events),
      "x_mh_sigs" -> ((s, d) => {
        val docs = graft.Tables.documents(s, d).repartition(16)
        docs.withColumn("words", split(trim(col("text")), "\\s+"))
          .select(col("doc_id"), expr(
            """array_distinct(filter(transform(sequence(1, size(words)), i ->
               CASE WHEN i + 2 <= size(words)
               THEN concat_ws(' ', element_at(words, i), element_at(words, i+1), element_at(words, i+2))
               END), x -> x IS NOT NULL))""").as("grams"))
          .select(col("doc_id"),
            graft.functions.MinHashBandSigs(col("grams"), 8, 4).as("sigs"))
      }),
      "x_mh_tri" -> ((s, d) =>
        graft.ops.Dedup.shingles(graft.Tables.documents(s, d).repartition(16), 3)
          .groupBy("doc_id").count()),
      "x_strs" -> ((s, d) =>
        graft.parse.ApacheParser.parse(rep(debugLines(s, d))).events
          .select("authuser", "reqline", "method", "path", "protocol", "referer", "user_agent"))
    )
    val fn = debug.getOrElse(name, graft.SparkEntry.queries(name))
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
