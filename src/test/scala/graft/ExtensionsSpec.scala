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
