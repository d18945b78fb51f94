package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.{Ingest, Warehouse}

/** Ingest writers: partitioned append, dead letters, and the contacts MERGE
  * (reference W1/W2/W5; maillog.py:66-78 lookup-or-insert semantics).
  */
class IngestSpec extends GraftSpec {
  import spark.implicits._

  private def tmpWarehouse(): Warehouse =
    Warehouse(Files.createTempDirectory("graft-wh").toString)

  test("upsertContacts assigns stable surrogate ids and never duplicates") {
    val wh = tmpWarehouse()
    val batch1 = Seq(("Alice", "alice@a.example"), ("Bob", "bob@b.example"))
      .toDF("realname", "email_address")
    val c1 = Ingest.upsertContacts(batch1, wh).orderBy("id").collect()
    assert(c1.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "Alice"), (2L, "Bob")))

    // second batch: one known, one new -> known keeps id, new gets maxId+1
    val batch2 = Seq(("Bob", "bob@b.example"), ("Carol", "carol@c.example"),
      ("Bob", "bob@b.example")).toDF("realname", "email_address")
    val c2 = Ingest.upsertContacts(batch2, wh).orderBy("id").collect()
    assert(c2.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "Alice"), (2L, "Bob"), (3L, "Carol")))

    // same (realname, email) twice in one batch deduplicates (UNIQUE constraint,
    // maillog.py:16); same name with different address is a distinct contact
    val batch3 = Seq(("Bob", "bob@other.example")).toDF("realname", "email_address")
    val c3 = Ingest.upsertContacts(batch3, wh)
    assert(c3.count() === 4)
  }

  test("appendEvents partitions by event date (pruning layout)") {
    val wh = tmpWarehouse()
    val df = Seq(
      ("2026-08-10 23:00:00", "a"),
      ("2026-08-11 01:00:00", "b"))
      .toDF("ts", "username")
      .select(col("ts").cast("timestamp").as("timestamp"), col("username"),
        lit("1.2.3.4").as("src_addr"))
    Ingest.appendEvents(df, wh, "authfail")
    val dirs = new java.io.File(wh.path("authfail")).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("event_date=2026-08-10", "event_date=2026-08-11"))
    assert(wh.authfail(spark).count() === 2)
  }

  test("date predicate prunes partitions on the warehouse layout") {
    val wh = tmpWarehouse()
    val df = Seq(
      ("2026-08-10 23:00:00", "a"), ("2026-08-11 01:00:00", "b"))
      .toDF("ts", "username")
      .select(col("ts").cast("timestamp").as("timestamp"), col("username"),
        lit("1.2.3.4").as("src_addr"))
    Ingest.appendEvents(df, wh, "authfail")
    val q = wh.authfail(spark)
      .filter(col("event_date") === java.sql.Date.valueOf("2026-08-11"))
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters"))
    assert(q.count() === 1)
    // the scan must not read the other day's files
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("event_date"), "partition column missing from scan")
  }

  test("appendEvents with the same batchId overwrites, not duplicates (idempotent redelivery)") {
    val wh = tmpWarehouse()
    val df = Seq(("2026-08-10 23:00:00", "a"), ("2026-08-11 01:00:00", "b"))
      .toDF("ts", "username")
      .select(col("ts").cast("timestamp").as("timestamp"), col("username"),
        lit("1.2.3.4").as("src_addr"))
    Ingest.appendEvents(df, wh, "authfail", batchId = 3L)
    Ingest.appendEvents(df, wh, "authfail", batchId = 3L) // redelivered batch
    assert(wh.authfail(spark).count() === 2)
    Ingest.appendEvents(df, wh, "authfail", batchId = 4L) // a NEW batch appends
    assert(wh.authfail(spark).count() === 4)
  }

  test("contacts dimension self-heals from every crash point of the staged swap") {
    val wh = tmpWarehouse()
    val fsPath = new org.apache.hadoop.fs.Path(wh.path("inbox_contacts"))
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def live = new org.apache.hadoop.fs.Path(wh.path("inbox_contacts"))
    def staging = new org.apache.hadoop.fs.Path(wh.path("inbox_contacts") + "__staging")
    def old = new org.apache.hadoop.fs.Path(wh.path("inbox_contacts") + "__old")

    val batch1 = Seq(("Alice", "alice@a.example")).toDF("realname", "email_address")
    Ingest.upsertContacts(batch1, wh)
    val batch2 = Seq(("Bob", "bob@b.example")).toDF("realname", "email_address")
    Ingest.upsertContacts(batch2, wh)
    val expected = wh.contacts(spark).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(expected === Seq((1L, "Alice"), (2L, "Bob")))

    // crash point A: between rename(live, old) and rename(staging, live) —
    // live absent, staging complete, old present. Recover → newest (staging).
    fs.rename(live, staging) // stand-in for the fully-written staging dir
    // staging was written by parquet so _SUCCESS exists; simulate old as stale
    Seq(("Alice", "alice@a.example")).toDF("realname", "email_address")
      .write.parquet(old.toString)
    assert(!fs.exists(live))
    val healedA = wh.contacts(spark).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(healedA === expected, "recovery must promote the complete staging dir")
    assert(!fs.exists(old) && !fs.exists(staging), "swap must be finished")

    // crash point B: staging incomplete (no _SUCCESS) and live absent —
    // recover falls back to __old (pre-swap table).
    fs.rename(live, old)
    fs.mkdirs(staging) // torn write: directory exists, no _SUCCESS
    assert(!fs.exists(live))
    val healedB = wh.contacts(spark).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(healedB === expected, "recovery must fall back to the old table")
    assert(!fs.exists(staging), "torn staging dir must be cleared")

    // crash point C: nothing to heal — live present plus leftover dirs; reads
    // and the next upsert proceed and clean up.
    fs.mkdirs(staging)
    val batch3 = Seq(("Carol", "carol@c.example")).toDF("realname", "email_address")
    val c3 = Ingest.upsertContacts(batch3, wh).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(c3 === Seq((1L, "Alice"), (2L, "Bob"), (3L, "Carol")))
  }

  test("dead letters append with the reference error-record shape (W5)") {
    val wh = tmpWarehouse()
    val dead = Seq(("2026-08-11T00:00:00Z", "bad line", "ValueError",
      "Could not parse logfile entry")).toDF("time", "line", "error_type", "error")
    Ingest.appendDeadLetters(dead, wh)
    val rows = wh.deadLetters(spark).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("error_type") === "ValueError")
  }
}
