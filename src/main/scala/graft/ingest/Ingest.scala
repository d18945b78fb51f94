package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse layout: one Parquet directory per table under a root path, fact
  * tables partitioned by `event_date` so the reports' 24-hour predicate prunes
  * partitions at any scale (SURVEY §4). Stands in for the reference's PostgreSQL
  * database (`core.py:26-33`); at cluster scale the same code targets a
  * transactional table format via the same append/merge entry points.
  */
final case class Warehouse(root: String) {
  def path(table: String): String = s"$root/$table"
  private def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
  def apache(spark: SparkSession): DataFrame = read(spark, "apache_access")
  def authfail(spark: SparkSession): DataFrame = read(spark, "authfail")
  def inbox(spark: SparkSession): DataFrame = read(spark, "inbox")
  def contacts(spark: SparkSession): DataFrame = read(spark, "inbox_contacts")
  def tocc(spark: SparkSession): DataFrame = read(spark, "inbox_tocc")
  def deadLetters(spark: SparkSession): DataFrame = read(spark, "dead_letters")
}

/** Batch writers (reference W1/W2/W3/W5, SURVEY §2.3).
  *
  * The reference commits one transaction per event row (`core.py:46-48`) and
  * resolves contacts with an N+1 SELECT-then-INSERT per address
  * (`maillog.py:66-78`); here each micro-batch is ONE partitioned append and ONE
  * set-based merge — the scalable shape of the same semantics.
  */
object Ingest {

  /** W1 — append fact rows, partitioned by event date for partition pruning. */
  def appendEvents(df: DataFrame, warehouse: Warehouse, table: String): Unit =
    df.withColumn("event_date", to_date(col("timestamp")))
      .write.mode(SaveMode.Append)
      .partitionBy("event_date")
      .parquet(warehouse.path(table))

  /** W5 — dead-letter sink (schema `graft.model.Schemas.deadLetter`). */
  def appendDeadLetters(df: DataFrame, warehouse: Warehouse): Unit =
    if (!df.isEmpty)
      df.write.mode(SaveMode.Append).parquet(warehouse.path("dead_letters"))

  /** W2 — dimension upsert ("lookup-or-insert", maillog.py:66-78).
    *
    * Set-based MERGE semantics: new (realname, email_address) pairs absent from
    * the stored dimension get surrogate ids `maxId + row_number()` over a
    * deterministic order, so ids are stable across replays of the same batch
    * (SURVEY §7.4 risk 3). Returns the full refreshed dimension.
    *
    * Scale: the dimension is small (it's broadcast in Q3); the anti-join is a
    * broadcast anti-join; with a transactional format this body becomes
    * `MERGE INTO contacts USING batch ON name<=>n AND email<=>e WHEN NOT MATCHED
    * THEN INSERT`.
    */
  def upsertContacts(newContacts: DataFrame, warehouse: Warehouse): DataFrame = {
    val spark = newContacts.sparkSession
    val path = warehouse.path("inbox_contacts")
    val existing: DataFrame =
      if (tableExists(spark, path)) spark.read.parquet(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Schemas.contacts)
    val maxId = existing.agg(coalesce(max(col("id")), lit(0L))).collect()(0).getLong(0)
    val fresh = newContacts
      .select(col("realname"), col("email_address")).distinct()
      .join(existing.select("realname", "email_address"),
        Seq("realname", "email_address"), "left_anti")
      .withColumn("id",
        lit(maxId) + row_number().over(
          Window.orderBy(col("realname"), col("email_address"))).cast("long"))
      .select(col("id"), col("realname"), col("email_address"))
    val updated = existing.unionByName(fresh)
    val staged = updated.cache()
    staged.count()
    staged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    staged.unpersist()
    spark.read.parquet(path)
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
