package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` primitives for the ANN / learned-delta index roots.
  *
  * The index lifecycle ([[Similarity.compactPqIndex]]'s generation flips,
  * [[Dedup]]'s `learned/` deltas) needs a handful of filesystem moves —
  * list children, read/write a small marker, recursive delete, an atomic
  * claim — and it needs them against WHATEVER store the index root lives
  * on. `java.nio.file` only speaks the local disk; routing everything
  * through the Hadoop `FileSystem` API (the same layer `spark.read` and
  * the fact tables' `ingest.Ingest`/`ingest.Compaction` already use) makes
  * an `hdfs://` or `s3a://` index root work identically to a local one —
  * the resolver picks the driver from the path's scheme and the cluster's
  * `hadoopConfiguration`.
  *
  * Driver-side only, and only against METADATA-sized payloads (dir
  * listings, one-line markers): the data planes stay DataFrame reads and
  * writes.
  */
private[graft] object IndexFs {

  /** The `FileSystem` serving `path`'s scheme under the session's Hadoop
    * configuration (local `file:`, `hdfs:`, `s3a:`, …).
    */
  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(fs: FileSystem, p: String): Boolean = fs.exists(new Path(p))

  /** Child NAMES of a directory (not paths); empty when the directory does
    * not exist. One round-trip — callers pattern-match the names
    * (`batch_id=N`, `codes_g<G>`) without further calls.
    */
  def childNames(fs: FileSystem, dir: String): Seq[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  /** Read a small marker file as UTF-8 (generation horizons — one line). */
  def readSmallString(fs: FileSystem, p: String): String = {
    val in = fs.open(new Path(p))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Write a small marker file (overwrite allowed — markers are only
    * written by the lock holder, so overwrite reclaims a torn marker from
    * a crashed predecessor at the same generation).
    */
  def writeSmallString(fs: FileSystem, p: String, content: String): Unit = {
    val out = fs.create(new Path(p), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** ATOMICALLY publish a small marker: write to a dot-tmp sibling, then
    * rename into place. A bare create+write+close is not atomic on
    * HDFS/object stores — a reader passing the `exists(marker)` gate could
    * read an empty or partial marker and crash parsing it on the query hot
    * path; rename is atomic on HDFS and the local FS, so readers observe
    * either no marker or the whole marker. Only the claim holder calls
    * this, so removing a torn predecessor's marker first is safe. The tmp
    * sibling starts with `_` like the marker itself, keeping it invisible
    * to Spark's parquet file listing.
    */
  def commitSmallString(fs: FileSystem, p: String, content: String): Unit = {
    val tmp = p + ".tmp"
    writeSmallString(fs, tmp, content)
    val dst = new Path(p)
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(new Path(tmp), dst))
      throw new java.io.IOException(s"marker rename failed: $tmp -> $p")
  }

  /** Read a marker holding one long, tolerating absence and torn/garbled
    * content (None) — a generation whose marker cannot be parsed is
    * treated as UNCOMMITTED rather than crashing the read path. Pairs with
    * [[commitSmallString]]: on stores where even the rename discipline is
    * unavailable, a torn marker degrades to invisibility, never to a
    * reader exception.
    */
  def readMarkerLong(fs: FileSystem, p: String): Option[Long] =
    try {
      val s = readSmallString(fs, p).trim
      if (s.isEmpty) None else Some(s.toLong)
    } catch { case _: Exception => None }

  /** Rename, false on failure (dest exists, concurrent move, store without
    * the op). Callers treat failure as "a racer won" and abort their own
    * commit.
    */
  def rename(fs: FileSystem, src: String, dst: String): Boolean =
    try fs.rename(new Path(src), new Path(dst))
    catch { case _: java.io.IOException => false }

  /** Recursive delete; no-op when absent. */
  def rmTree(fs: FileSystem, p: String): Unit = {
    val path = new Path(p)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Modification time of `p`, or None when absent (a concurrent holder
    * released between our existence check and the stat).
    */
  def mtime(fs: FileSystem, p: String): Option[Long] =
    try Some(fs.getFileStatus(new Path(p)).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** Atomic create-if-absent claim marker — `ingest.Ingest.tryClaim`'s
    * protocol verbatim: `java.io.File.createNewFile` is the atomic
    * primitive on the local FS; elsewhere `create(overwrite=false)` is
    * atomic on HDFS (namenode-arbitrated). On object stores WITHOUT atomic
    * create-if-absent (s3a without S3 conditional writes) the claim is
    * ADVISORY ONLY — creation can race — so the claim-locked maintenance
    * entries ([[Similarity.compactPqIndex]], [[Dedup.compactLearnedDelta]],
    * the versioned-root commits) additionally verify the holder TOKEN
    * ([[ownsClaim]]) immediately before publishing, and stage data under
    * token-suffixed dirs renamed into place — a lost race then aborts a
    * commit instead of mixing files.
    */
  def tryClaim(fs: FileSystem, lock: String): Boolean = {
    val p = new Path(lock)
    fs.mkdirs(p.getParent)
    if (fs.getScheme == "file")
      new java.io.File(p.toUri.getPath).createNewFile()
    else
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** [[tryClaim]] with a HOLDER TOKEN: the atomic create wins the claim,
    * then the winner's unique token is written into the lock file — the
    * ownership witness [[ownsClaim]] re-checks before every destructive
    * or publishing step, and the write refreshes the lock mtime the
    * stale-steal policy keys on.
    *
    * The token write itself can fail when a concurrent maintainer STEALS
    * the just-created lock before the token lands (observed on the
    * checksummed local FS as a chmod-on-missing-.crc shell exception
    * under a zero stale timeout). That is a lost race, not an error:
    * report the claim as lost (false) and let the ownership verify /
    * stale-steal machinery converge — if the failed write left a token-
    * less lock behind, it reads as held-by-nobody and is stolen after the
    * timeout like any crashed holder's.
    */
  def tryClaim(fs: FileSystem, lock: String, token: String): Boolean =
    tryClaim(fs, lock) && {
      try { writeSmallString(fs, lock, token + "\n"); true }
      catch { case _: Exception => false }
    }

  /** The token in the lock file; None when absent, empty (a pre-token
    * claimant or a claim torn mid-write), or unreadable.
    */
  def claimHolder(fs: FileSystem, lock: String): Option[String] =
    try {
      val s = readSmallString(fs, lock).trim
      if (s.isEmpty) None else Some(s)
    } catch { case _: Exception => None }

  /** True iff the lock still exists and carries `token` — the commit-time
    * ownership re-verification: a holder paused past the stale timeout
    * (GC pause, long build) whose claim was stolen MUST abort rather than
    * publish over the stealer's work.
    */
  def ownsClaim(fs: FileSystem, lock: String, token: String): Boolean =
    claimHolder(fs, lock).contains(token)

  /** Run `body` while a daemon thread HEARTBEATS the claim — TOUCHES the
    * lock's mtime every `intervalMs` (minimum 500 ms), so a LIVE holder is
    * never classified stale by a concurrent maintainer however long its
    * build runs (the r11 steal policy keyed on a creation-time mtime the
    * holder never refreshed). The touch is `setTimes` — pure metadata,
    * never a content rewrite — so the holder's own commit-time
    * [[ownsClaim]] read can never race a truncating write of its own
    * heartbeat; the token content is written exactly once, at claim time.
    * The heartbeat re-checks ownership before each touch: once stolen, it
    * stops touching — it must not resurrect a stolen lock's freshness.
    */
  def withHeartbeat[T](fs: FileSystem, lock: String, token: String,
      intervalMs: Long)(body: => T): T = {
    val interval = math.max(intervalMs, 500L)
    @volatile var live = true
    val t = new Thread(() => {
      while (live) {
        try Thread.sleep(interval)
        catch { case _: InterruptedException => () }
        if (live)
          try {
            if (ownsClaim(fs, lock, token))
              fs.setTimes(new Path(lock), System.currentTimeMillis(), -1L)
          } catch { case _: Exception => () }
      }
    }, s"graft-claim-heartbeat")
    t.setDaemon(true)
    t.start()
    try body
    finally { live = false; t.interrupt() }
  }

  /** Path-capability names that advertise an ATOMIC create-if-absent on
    * object stores: S3 conditional writes (HTTP `If-None-Match: *`) were
    * wired into s3a's `create(overwrite=false)` by HADOOP-19256 and
    * surface through the public `PathCapabilities` probe on hadoop-aws
    * builds new enough to carry them. Probed, not assumed — the connector
    * in THIS build (see docs/PLANS.md capability matrix) advertises
    * neither, so the claim there stays advisory and the token-verify path
    * stays load-bearing.
    */
  val ConditionalCreateCapabilities: Seq[String] = Seq(
    "fs.option.create.conditional.overwrite",
    "fs.s3a.create.conditional.enabled")

  /** True when [[tryClaim]]'s create-if-absent is ATOMIC on the store
    * serving `path` — the capability probe behind the PLANS.md claim
    * matrix: local (`O_EXCL`) and HDFS (namenode-arbitrated) always are;
    * an object store is atomic exactly when it advertises a conditional-
    * create path capability ([[ConditionalCreateCapabilities]]). On a
    * capable store the claim upgrades from advisory to atomic with NO
    * protocol change (`create(overwrite=false)` is already what tryClaim
    * issues — the store now arbitrates it); the token-verify /
    * staged-rename defense-in-depth is kept regardless, because publish
    * safety must not depend on a probe. Probe failures (a pre-
    * PathCapabilities filesystem) read as not-capable, never as an error.
    */
  def atomicClaimSupported(fs: FileSystem, path: String): Boolean =
    fs.getScheme match {
      case "file" | "hdfs" | "viewfs" => true
      case _ => ConditionalCreateCapabilities.exists { c =>
        try fs.hasPathCapability(new Path(path), c)
        catch { case _: Throwable => false }
      }
    }

  def release(fs: FileSystem, lock: String): Unit =
    fs.delete(new Path(lock), false)

  /** Release only while still the holder — a stolen lock now belongs to
    * the stealer and must not be deleted out from under it.
    */
  def releaseIfOwner(fs: FileSystem, lock: String, token: String): Unit =
    if (ownsClaim(fs, lock, token)) release(fs, lock)
}
