package graft.reports

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** The reference's three report queries as declarative DataFrame transforms
  * (reference: `apache_access.py:52-84`, `authfail.py:30-45`, `maillog.py:106-138`).
  * `now` is injectable so the 24-hour window (`core.py:60-61`) is deterministic in
  * tests and oracle comparisons.
  *
  * Scale notes: all three are filter→(groupBy|join)→sort over a date-partitioned
  * fact table. The timestamp predicate is a pushed-down Parquet filter plus
  * partition pruning when the table is laid out by `date(timestamp)`; the
  * aggregations are two-phase hash aggregates; the dimension join is a broadcast.
  */
object Reports {

  private def window24h(df: DataFrame, now: Column): DataFrame =
    df.filter(col("timestamp") >= F.oneDayAgo(now))

  /** Q1 — apache hits-by-request (apache_access.py:59-69):
    * SELECT reqline, COUNT(*) qty, SUM(bytesin), SUM(bytesout) ... GROUP BY reqline
    * ORDER BY qty DESC, reqline ASC.
    */
  def apacheHitsByRequest(apache: DataFrame, now: Column): DataFrame =
    window24h(apache, now)
      .groupBy(col("reqline"))
      .agg(
        count(lit(1)).as("qty"),
        sum(col("bytesin")).as("sum_bytesin"),
        sum(col("bytesout")).as("sum_bytesout"))
      .orderBy(col("qty").desc, col("reqline").asc)

  /** Grand totals over the same window (the reference accumulates these client-side
    * while iterating groups, apache_access.py:57-73; one extra partial-agg pass here).
    */
  def apacheTotals(apache: DataFrame, now: Column): DataFrame =
    window24h(apache, now)
      .agg(
        coalesce(sum(col("bytesin")), lit(0L)).as("total_bytesin"),
        coalesce(sum(col("bytesout")), lit(0L)).as("total_bytesout"))

  /** Q2 — authfail attempts-by-IP (authfail.py:34-39). PostgreSQL orders INET
    * numerically by octet, so the ASC tiebreak sorts on parsed octets, not text.
    */
  def authfailAttemptsByIp(authfail: DataFrame, now: Column): DataFrame =
    window24h(authfail, now)
      .groupBy(col("src_addr"))
      .agg(count(lit(1)).as("qty"))
      .orderBy(col("qty").desc, F.ipSortKey(col("src_addr")).asc)
      .select(col("src_addr"), col("qty"))

  /** Q3 — inbox listing (maillog.py:106-138): 24 h detail scan ordered by
    * (timestamp, id); sender resolved via a broadcast equi-join on the contacts
    * dimension; recipients resolved through the tocc bridge, semi-join filtered to
    * the local-domain set, and sorted per message by (realname, email).
    */
  def inboxListing(
      inbox: DataFrame,
      contacts: DataFrame,
      tocc: DataFrame,
      localDomains: Seq[String],
      now: Column
  ): DataFrame = {
    val recent = window24h(inbox, now)
    val sender = broadcast(contacts)
      .select(col("id").as("sender_id"), col("realname").as("sender_name"),
        col("email_address").as("sender_email"))

    // recipients per message: bridge join → dim join → domain semi-filter →
    // deterministic per-message order, collected as an array (the denormalized
    // form SURVEY §1.2 recommends). Reference semantics (maillog.py:128): the
    // extracted domain keeps its case; only the local-domain set is lowercased.
    val recipients = tocc
      .join(broadcast(contacts), tocc("contact_id") === contacts("id"))
      .filter(F.domainOf(col("email_address")).isin(localDomains.map(_.toLowerCase): _*))
      .groupBy(col("msg_id"))
      .agg(array_sort(collect_list(struct(
        col("realname"), col("email_address")))).as("recips"))

    recent
      .join(sender, Seq("sender_id"), "left")
      .join(recipients, recent("id") === recipients("msg_id"), "left")
      .select(
        recent("id"), col("timestamp"), col("subject"),
        col("sender_name"), col("sender_email"),
        coalesce(col("recips"), array()).as("recipients"),
        col("size"), col("date"))
      .orderBy(col("timestamp").asc, recent("id").asc)
  }
}
