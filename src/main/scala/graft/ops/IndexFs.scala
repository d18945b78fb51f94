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
    * atomic on HDFS (namenode-arbitrated). Object stores without atomic
    * create keep the single-writer deployment assumption.
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

  def release(fs: FileSystem, lock: String): Unit =
    fs.delete(new Path(lock), false)
}
