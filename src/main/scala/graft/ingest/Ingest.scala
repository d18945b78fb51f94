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
  def contacts(spark: SparkSession): DataFrame =
    Ingest.currentSnapshot(spark, path("inbox_contacts")) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => read(spark, "inbox_contacts") // missing table: same error as before
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
      // co-locate each date's rows before partitionBy: without this, EVERY
      // upstream task writes its own file into EVERY (event_date, batch_id)
      // leaf — tasks × dates small files per micro-batch, the classic
      // accumulation that kills 100 TB scans. One date = one writer task and
      // maxRecordsPerFile re-splits a genuinely hot date into right-sized
      // files instead of one giant one.
      .repartition(col("event_date"))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", 5000000)
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
    val snapshot = currentSnapshot(spark, path)
    val existing: DataFrame = snapshot match {
      case Some(dir) => spark.read.parquet(dir)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Schemas.contacts)
    }
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
    // Versioned-snapshot commit (the minimal core of a transactional table
    // format, object-store safe — no directory renames anywhere):
    //  - each refresh writes a NEW immutable `v-NNNNNNNN` directory; the
    //    committer writes `_SUCCESS` last, and that file IS the commit marker;
    //  - readers resolve the highest version with `_SUCCESS`, so a torn write
    //    (no `_SUCCESS`) is simply invisible and the previous snapshot keeps
    //    serving — there is no instant at which the table is absent;
    //  - a replay after a torn write recomputes the same next version number
    //    and SaveMode.Overwrite reclaims the torn directory.
    // Single-writer (the reference is a cron job, maillog.py); at cluster
    // scale with concurrent writers this becomes a real table format's MERGE.
    // Reference invariant: per-row txn + UNIQUE(realname, email_address),
    // maillog.py:16, core.py:46-48.
    val nextVersion = snapshot match {
      case Some(VersionDirRe(n)) => n.toLong + 1
      case Some(_) => 1L // legacy un-versioned layout: first versioned commit
      case None => 1L
    }
    val target = f"$path/v-$nextVersion%08d"
    updated.write.mode(SaveMode.Overwrite).parquet(target)
    gcOldSnapshots(spark, path, keepFrom = nextVersion - 1)
    spark.read.parquet(target)
  }

  private[ingest] val VersionDirRe = ".*/v-(\\d{8})$".r

  /** Resolve the current committed snapshot directory of a versioned
    * dimension table: the highest `v-NNNNNNNN` child containing `_SUCCESS`.
    * Falls back to the pre-versioning layouts so existing warehouses upgrade
    * transparently on their next upsert:
    *  - plain parquet files directly under `base` → that directory;
    *  - a crashed pre-versioning staged swap (`__staging`/`__old` leftovers)
    *    is healed first via [[recoverSwap]].
    * Returns None when the table does not exist at all.
    */
  def currentSnapshot(spark: SparkSession, base: String): Option[String] = {
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // steady state costs ONE listing; the extra filesystem work below happens
    // only in crash-recovery states
    val listing =
      if (fs.exists(basePath)) fs.listStatus(basePath)
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val versionDirs = listing.collect {
      case st if st.isDirectory =>
        st.getPath.toString match {
          case VersionDirRe(n) => Some((n.toLong, st.getPath))
          case _ => None
        }
    }.flatten
    val committed = versionDirs.filter { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    }
    if (committed.nonEmpty) Some(committed.maxBy(_._1)._2.toString)
    else {
      val hasLegacyData =
        listing.exists(s => s.isFile && s.getPath.getName.startsWith("part-"))
      if (hasLegacyData) {
        // a torn FIRST versioned commit (v-dir without _SUCCESS) nested under
        // a legacy layout would make spark.read.parquet(base) trip over the
        // mixed files/dirs structure — clear the torn garbage so the legacy
        // data stays readable (the replaying writer rebuilds the version)
        versionDirs.foreach { case (_, p) => fs.delete(p, true) }
        Some(base)
      } else if (versionDirs.nonEmpty) {
        None // only torn writes exist: no committed table yet
      } else {
        recoverSwap(spark, base) // heal a pre-versioning swap crash
        val healed = fs.exists(basePath) &&
          fs.listStatus(basePath).exists(s => s.isFile && s.getPath.getName.startsWith("part-"))
        if (healed) Some(base) else None
      }
    }
  }

  /** Retain the current and previous snapshots (short-lived readers of the
    * prior version finish against immutable files); delete older versions,
    * torn higher-numbered directories from crashed FUTURE writes cannot exist
    * (single writer), and clear pre-versioning legacy files once a versioned
    * snapshot is committed.
    */
  private def gcOldSnapshots(spark: SparkSession, base: String, keepFrom: Long): Unit = {
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(basePath).foreach { st =>
      st.getPath.toString match {
        case VersionDirRe(n) if st.isDirectory && n.toLong < keepFrom =>
          fs.delete(st.getPath, true)
        case _ =>
          // legacy layout leftovers: root part-files, _SUCCESS, __old/__staging
          val name = st.getPath.getName
          if (name.startsWith("part-") || name == "_SUCCESS")
            fs.delete(st.getPath, false)
      }
    }
    val old = new org.apache.hadoop.fs.Path(base + "__old")
    val staging = new org.apache.hadoop.fs.Path(base + "__staging")
    fs.delete(old, true)
    fs.delete(staging, true)
  }

  /** Self-heal a PRE-VERSIONING staged swap interrupted between its two
    * renames (kept for transparent upgrade of old warehouses; the versioned
    * commit above never renames). States and recovery:
    *  - staging write died mid-flight → `live` still present: no-op;
    *  - after `rename(live, old)`, before `rename(staging, live)` → `live`
    *    absent, staging COMPLETE (`_SUCCESS` proves it): promote staging;
    *  - staging incomplete and `live` absent → fall back to `__old` (loses
    *    only the crashed batch, which the caller replays idempotently).
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
}
