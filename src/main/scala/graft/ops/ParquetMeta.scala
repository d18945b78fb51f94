package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Table-level statistics from parquet FOOTERS alone — no data scan, no
  * Spark job. Sizing a grown index geometry (planes = smallest p with
  * 2^p·48 ≥ N, K = ⌈N/48⌉ centroids) needs ONE integer: the corpus row
  * count. Deriving it with `df.count()` costs a full corpus pass before
  * the real query even starts — at 100 TB that is an extra scan per run
  * to learn a number every parquet footer (and, at deployment, every
  * catalog) already records exactly (r14 verdict item 3). Footer reads
  * are O(files), driver-side, and byte-exact: parquet row counts are
  * physical metadata, not estimates.
  *
  * Returns None on any failure (non-parquet layout, unreadable footer,
  * empty dir) so callers fall back to the scan — a sizing statistic must
  * never turn a readable corpus into an error.
  */
object ParquetMeta {

  /** [[rowCount]] with a LOUD scan fallback — the one entry point geometry
    * sizing should use (r15 advice item 2): every sizing call site derives
    * N from the FULL table (footer count ≡ `count(*)`) and then applies
    * its cohort-share integer rule (`* share / 10`, `+ 1` for planted
    * witnesses) OUTSIDE this call, so the fallback path computes the
    * identical arithmetic the DuckDB oracle mirrors — the pre-r16 form let
    * each fallback count a filtered cohort directly, which near a
    * planes/K threshold could disagree with the oracle's
    * `floor(share · count(*))` by one and silently diverge the geometry.
    * `scan` must therefore be the UNFILTERED table count. The fallback is
    * logged so a parity mismatch is traceable to it.
    */
  def rowCountOrScan(spark: SparkSession, path: String, scan: => Long): Long =
    rowCount(spark, path).getOrElse {
      System.err.println(s"[graft] ParquetMeta: footer row count unavailable " +
        s"for $path — falling back to a full count(*) scan (same integer " +
        "rule as the oracle; geometry parity preserved)")
      scan
    }

  /** Exact total row count of the parquet file/directory at `path`. */
  def rowCount(spark: SparkSession, path: String): Option[Long] = try {
    val conf = spark.sessionState.newHadoopConf()
    val files = listParquet(conf, new Path(path))
    if (files.isEmpty) None
    else Some(files.map { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try r.getRecordCount finally r.close()
    }.sum)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Data files under `path`: the file itself, or the non-hidden
    * `*.parquet` leaves of a (possibly partitioned) directory layout.
    */
  private def listParquet(conf: Configuration, p: Path): Seq[FileStatus] = {
    val fs = p.getFileSystem(conf)
    def walk(s: FileStatus): Seq[FileStatus] =
      if (s.isDirectory)
        fs.listStatus(s.getPath).toSeq
          .filterNot { c =>
            val n = c.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
          .flatMap(walk)
      else if (s.getPath.getName.endsWith(".parquet")) Seq(s)
      else Nil
    val root = fs.getFileStatus(p)
    if (root.isFile) Seq(root) else walk(root)
  }
}
