package graft.parse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** sshd auth-failure line parser (reference: `src/logsdb/authfail.py:48-81`).
  *
  * The reference compiles two regexen with named groups (timestamp, username,
  * src_addr) and requires a FULL match of one of them; no match is a hard error
  * (authfail.py:80-81). We translate both patterns to Java regex, anchor them
  * (`\A...\z` ≙ `fullmatch`), and keep everything in codegen'd `regexp_extract` —
  * unmatched rows go to the dead-letter channel instead of aborting the job.
  */
object AuthfailParser {

  /** authfail.py:49-56 — "Failed password|keyboard-interactive/pam|none", optional
    * "message repeated N times: [" wrapper, optional "invalid user" prefix.
    * Group 1 = timestamp, 2 = username, 3 = src_addr.
    */
  val FailedRgx: String =
    """\A(\S+) \S+ sshd\[\d+\]:(?: message repeated \d+ times: \[)?""" +
      """ Failed (?:password|keyboard-interactive/pam|none)""" +
      """ for (?:invalid user )?(.+?) from (\S+) port \d+ ssh2\]?\s*\z"""

  /** authfail.py:57-61 — "Invalid user ... from IP port N" (no trailing "ssh2"). */
  val InvalidRgx: String =
    """\A(\S+) \S+ sshd\[\d+\]:(?: message repeated \d+ times: \[)?""" +
      """ Invalid user (.*?) from (\S+) port \d+\s*\z"""

  /** `lines` must have a string column `value`. Timestamps are ISO-8601 with offset
    * (journal format), parsed like `datetime.fromisoformat` (authfail.py:74) by the
    * native string→timestamp cast.
    */
  def parse(lines: DataFrame): ParseResult = {
    val m1 = col("value").rlike(FailedRgx)
    val m2 = col("value").rlike(InvalidRgx)

    // One Staged projection evaluates the regex work exactly once per row:
    // whole-stage codegen eliminates the shared rlike subexpressions WITHIN
    // the projection, and the fence keeps the validity filter from being
    // pushed below it (which would re-run both regexes per filter conjunct).
    val withCols = lines
      .withColumns(Map(
        "matched" -> graft.functions.Staged(m1 || m2),
        "ts_raw" -> graft.functions.Staged(
          when(m1, regexp_extract(col("value"), FailedRgx, 1))
            .when(m2, regexp_extract(col("value"), InvalidRgx, 1))),
        "username" -> graft.functions.Staged(
          when(m1, regexp_extract(col("value"), FailedRgx, 2))
            .when(m2, regexp_extract(col("value"), InvalidRgx, 2))),
        "src_addr" -> graft.functions.Staged(
          when(m1, regexp_extract(col("value"), FailedRgx, 3))
            .when(m2, regexp_extract(col("value"), InvalidRgx, 3)))))
      .withColumn("timestamp", try_to_timestamp(col("ts_raw")))

    val ok = col("matched") && col("timestamp").isNotNull

    val events = withCols.filter(ok)
      .select(col("timestamp"), col("username"), col("src_addr"))

    val dead = withCols.filter(!ok).select(
      F.iso8601Z(current_timestamp()).as("time"),
      col("value").as("line"),
      lit("ValueError").as("error_type"),
      lit("Could not parse logfile entry").as("error"))

    ParseResult(events, dead)
  }
}
