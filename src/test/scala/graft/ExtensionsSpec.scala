package graft

/** Native expressions exposed to SQL via GraftExtensions. */
class ExtensionsSpec extends GraftSpec {

  test("native functions callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT reencode('cafÃ©') AS r,
                simhash16('a b c') AS s,
                dot_f32(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)),
                        array(CAST(3 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
      """).head()
    assert(row.getAs[String]("r") === "café")
    val sh = row.getAs[String]("s")
    assert(sh.length === 16 && sh.forall(c => c == '0' || c == '1'))
    assert(row.getAs[Double]("d") === 5.5)
  }

  test("native hyperplane_bucket equals the expression-string formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    // deterministic pseudo-random float vectors, 64 dims, incl. exact zeros
    val vecs = (0 until 50).map { v =>
      (v.toLong, (1 to 64).map { j =>
        val h = (v * 131 + j * 17) % 23 - 11
        (h.toFloat / 4.0f)
      }.toArray)
    }.toDF("vec_id", "embedding")
    // the pre-r3 generated-SQL formulation, kept here as the spec oracle
    val planes = 4
    val terms = (0 until planes).map { i =>
      val proj = (1 to 64).map { j =>
        val c = ((i * 37 + j * 101) % 17 - 8).toDouble / 8.0
        s"CAST(element_at(embedding, $j) AS DOUBLE) * CAST($c AS DOUBLE)"
      }.mkString("(", " + ", ")")
      s"(CASE WHEN $proj > CAST(0 AS DOUBLE) THEN ${1 << i} ELSE 0 END)"
    }
    val rows = vecs
      .withColumn("native",
        graft.functions.HyperplaneBucket(col("embedding"), planes, 64))
      .withColumn("via_sql", expr(terms.mkString(" + ")))
      .withColumn("via_fn", expr(s"hyperplane_bucket(embedding, $planes, 64)"))
      .select("vec_id", "native", "via_sql", "via_fn")
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"vec ${r.getLong(0)}")
      assert(r.getInt(1) === r.getInt(3), s"vec ${r.getLong(0)}")
    }
    assert(rows.map(_.getInt(1)).distinct.length > 1) // buckets actually vary
  }

  test("SQL simhash16 equals the Dedup pipeline value") {
    import spark.implicits._
    GraftExtensions.registerAll(spark)
    val viaSql = spark.sql("SELECT simhash16('hello world spark') AS s")
      .head().getString(0)
    val viaOp = graft.ops.Dedup.simhash(
      Seq((1L, "hello world spark")).toDF("doc_id", "text"))
      .head().getAs[String]("simhash")
    assert(viaSql === viaOp)
  }
}
