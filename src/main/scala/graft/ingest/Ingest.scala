package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  def contacts(spark: SparkSession): DataFrame = {
    // self-healing open: if a crash interrupted the staged swap while the live
    // directory was absent, restore it from __staging/__old before reading
    Ingest.recoverSwap(spark, path("inbox_contacts"))
    read(spark, "inbox_contacts")
  }
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

  /** W1 — append fact rows, partitioned by (event_date, batch_id):
    * `event_date` for partition pruning, `batch_id` for IDEMPOTENT re-delivery —
    * a retried micro-batch first deletes its own `batch_id=N` leaf directories
    * and rewrites them, so at-least-once delivery from the streaming engine
    * becomes exactly-once table contents (overwrite-by-batchId; the reference
    * gets the same guarantee from per-row PostgreSQL transactions,
    * core.py:46-48).
    */
  def appendEvents(df: DataFrame, warehouse: Warehouse, table: String,
      batchId: Long = 0L): Unit = {
    deleteBatchDirs(df.sparkSession, warehouse.path(table), s"*/batch_id=$batchId")
    df.withColumn("event_date", to_date(col("timestamp")))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Append)
      .partitionBy("event_date", "batch_id")
      .parquet(warehouse.path(table))
  }

  /** W5 — dead-letter sink (schema `graft.model.Schemas.deadLetter`), same
    * overwrite-by-batchId idempotence as the fact append.
    */
  def appendDeadLetters(df: DataFrame, warehouse: Warehouse,
      batchId: Long = 0L): Unit =
    if (!df.isEmpty) idempotentAppend(df, warehouse, "dead_letters", batchId)

  /** Idempotent un-dated append (bridge tables like `inbox_tocc`):
    * overwrite-by-batchId, partitioned by `batch_id` only.
    */
  def idempotentAppend(df: DataFrame, warehouse: Warehouse, table: String,
      batchId: Long): Unit = {
    deleteBatchDirs(df.sparkSession, warehouse.path(table), s"batch_id=$batchId")
    df.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Append).partitionBy("batch_id")
      .parquet(warehouse.path(table))
  }

  /** Remove a batch's partition directories (glob relative to `root`) so a
    * replayed batch rewrites exactly its own output.
    */
  private def deleteBatchDirs(spark: SparkSession, root: String,
      glob: String): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) {
      val hits = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/$glob"))
      if (hits != null) hits.foreach(s => fs.delete(s.getPath, true))
    }
  }

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
    recoverSwap(spark, path) // heal a swap a previous run crashed mid-way
    val existing: DataFrame =
      if (tableExists(spark, path)) spark.read.parquet(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Schemas.contacts)
    val maxId = existing.agg(coalesce(max(col("id")), lit(0L))).collect()(0).getLong(0)
    val newPairs = newContacts
      .select(col("realname"), col("email_address")).distinct()
      .join(existing.select("realname", "email_address"),
        Seq("realname", "email_address"), "left_anti")
    // ids via the distributed ordered indexer (no single-partition window);
    // maxId offset keeps ids stable across replays of the same batch
    val fresh = graft.ops.OrderedIndex.withOrderedId(newPairs,
        Seq(col("realname"), col("email_address")), "id", offset = maxId)
      .select(col("id"), col("realname"), col("email_address"))
    val updated = existing.unionByName(fresh)
    // crash-safe swap: write the refreshed dimension to a scratch path (the
    // read lineage over the live path stays valid while writing), then swap
    // via rename — a crash leaves either the old or the new table, never a
    // half-overwritten one. The window where `live` is absent (between the two
    // renames) is healed by [[recoverSwap]] on the next open. CAVEAT: this
    // relies on `rename` being atomic (HDFS/local); on S3-style object stores
    // rename is copy+delete, so the production form there is a transactional
    // table format where this whole body is one MERGE (the scaladoc contract
    // above). Reference invariant: per-row txn + UNIQUE(realname,
    // email_address), maillog.py:16, core.py:46-48.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "__staging")
    val live = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    fs.delete(tmp, true)
    updated.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
    spark.read.parquet(path)
  }

  /** Self-heal a staged swap interrupted between its two renames. States a
    * crash can leave (in swap order) and their recovery:
    *  - staging write died mid-flight → `live` still present: no-op (the
    *    garbage staging dir is deleted at the next upsert's start);
    *  - after `rename(live, old)`, before `rename(staging, live)` → `live`
    *    absent, staging COMPLETE (it was fully written before the swap began;
    *    `_SUCCESS` proves it): promote staging — it is the newest data;
    *  - staging somehow incomplete and `live` absent → fall back to `__old`
    *    (the pre-swap table; loses only the crashed batch, which the caller
    *    replays idempotently).
    * Idempotent and cheap (two `exists` calls) — safe to call on every open.
    */
  def recoverSwap(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(live)) return
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    val stagingComplete = fs.exists(staging) &&
      fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))
    if (stagingComplete) {
      fs.rename(staging, live)
      fs.delete(old, true) // finish the interrupted swap
    } else if (fs.exists(old)) {
      fs.rename(old, live)
      fs.delete(staging, true)
    }
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
