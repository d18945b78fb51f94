package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Result of a parse transform: well-formed rows plus a dead-letter channel
  * (reference routes any parse failure to a JSON error record and aborts,
  * `apache_access.py:128-143`; at scale we keep the pipeline running and quarantine
  * bad rows instead).
  */
final case class ParseResult(events: DataFrame, deadLetters: DataFrame)

/** Apache access-log line parser (reference: `src/logsdb/apache_access.py:88-127`).
  *
  * Input line format (apache_access.py:88-90):
  * {{{
  * %{%Y-%m-%d %H:%M:%S %z}t|%v|%p|%a|%I|%O|%D|%>s|["%u", "%r", "%m", "%U%q", "%H", "%{Referer}i", "%{User-Agent}i"]
  * }}}
  *
  * Spark-first design: the 9-way `split` with a limit mirrors `line.split("|", 8)`
  * (apache_access.py:95-105); the trailing string-array literal is parsed by the
  * native codegen'd [[graft.functions.ParseStrArray]] expression, which handles
  * JSON escapes plus Apache's `\xhh` in one scan (`ast.literal_eval` at
  * apache_access.py:106-108). Each of the 7 strings is latin-1→utf-8 re-decoded
  * (apache_access.py:146-147).
  */
object ApacheParser {

  /** `lines` must have a string column `value`; extra columns are preserved on the
    * dead-letter side for provenance.
    */
  def parse(lines: DataFrame): ParseResult = {
    // Staged projections so the two expensive expressions — the 9-way split and
    // the string-array parse — run ONCE per row. The Staged fence keeps the
    // optimizer from collapsing the projections or pushing the validity filter
    // below them (which would re-derive the parse per filter conjunct).
    val withParts = lines.withColumn("parts",
      graft.functions.Staged(split(col("value"), "\\|", 9)))
    val withStrs = withParts.withColumn("strs",
      graft.functions.Staged(
        graft.functions.ParseStrArray(get(col("parts"), lit(8)))))

    def p(i: Int): Column = get(col("parts"), lit(i))
    def s(i: Int): Column = F.reencode(get(col("strs"), lit(i)))

    // ANSI-safe casts: Spark 4 runs with ANSI on, where a bad cast THROWS; the
    // dead-letter contract requires malformed rows to yield null and be routed,
    // not to kill the job.
    def tryInt(c: Column): Column = when(c.rlike("^-?\\d+$"), c.cast("int"))
    def tryLong(c: Column): Column = when(c.rlike("^-?\\d+$"), c.cast("long"))

    val withCols = withStrs
      .withColumn("timestamp",
        try_to_timestamp(p(0), lit("yyyy-MM-dd HH:mm:ss Z")))
      .withColumn("host", p(1))
      .withColumn("port", tryInt(p(2)))
      .withColumn("src_addr", p(3))
      .withColumn("bytesin", tryLong(p(4)))
      .withColumn("bytesout", tryLong(p(5)))
      .withColumn("microsecs", tryLong(p(6)))
      .withColumn("status", tryInt(p(7)))
      .withColumn("authuser", s(0))
      .withColumn("reqline", s(1))
      .withColumn("method", s(2))
      .withColumn("path", s(3))
      .withColumn("protocol", s(4))
      .withColumn("referer", s(5))
      .withColumn("user_agent", s(6))

    val ok = withCols.col("timestamp").isNotNull &&
      withCols.col("port").isNotNull && withCols.col("bytesin").isNotNull &&
      withCols.col("bytesout").isNotNull && withCols.col("microsecs").isNotNull &&
      withCols.col("status").isNotNull &&
      withCols.col("strs").isNotNull && size(withCols.col("strs")) === 7

    val events = withCols.filter(ok).select(
      col("timestamp"), col("host"), col("port"), col("src_addr"), col("authuser"),
      col("bytesin"), col("bytesout"), col("microsecs"), col("status"),
      col("reqline"), col("method"), col("path"), col("protocol"),
      col("referer"), col("user_agent"))

    val dead = withCols.filter(!ok).select(
      F.iso8601Z(current_timestamp()).as("time"),
      col("value").as("line"),
      lit("ValueError").as("error_type"),
      lit("Could not parse logfile entry").as("error"))

    ParseResult(events, dead)
  }
}
