package graft

import org.apache.spark.sql.Row

import graft.render.{DailyReport, TextTable}

/** Golden-output tests for the report composer (reference dailyreport.py,
  * apache_access.py:52-84, authfail.py:30-45) and the PrettyTable-compatible
  * frame.
  */
class RenderSpec extends GraftSpec {

  test("TextTable renders PrettyTable default box style") {
    val out = TextTable.render(
      Seq("Attempts", "IP Address"), Seq(TextTable.R, TextTable.L),
      Seq(Seq("17", "198.51.100.23"), Seq("3", "9.9.9.9")))
    val expected =
      """+----------+---------------+
        || Attempts |   IP Address  |
        |+----------+---------------+
        ||       17 | 198.51.100.23 |
        ||        3 | 9.9.9.9       |
        |+----------+---------------+""".stripMargin
    assert(out === expected)
  }

  private object FakeProbe extends DailyReport.SystemProbe {
    def errlogFiles: Seq[(String, Long)] = Seq(("apache.err", 120L), ("empty.err", 0L))
    def loadAvg: Seq[String] = Seq("0.15", "0.10", "0.05")
    def diskUsage: (Long, Long) = (1000000000L, 650000000L)
    def rebootRequired: Option[Seq[String]] = Some(Seq("libc6", "linux-image"))
    def mailboxNonEmpty: Boolean = true
    def vnstat: (Long, Long) = (123456789L, 987654321L)
    def hostname: String = "testhost"
    def nowIso: String = "2026-08-11T06:00:00Z"
    def logsDirPath: String = "/var/log/logsdb-errors"
  }

  test("tag priority ordering matches dailyreport.py:134-141") {
    val r = DailyReport.compose(
      Seq(Some("body")),
      tags = Set("MAIL", "ZEBRA", "DISK", "ALPHA"),
      hostname = "h", nowIso = "2026-08-11T06:00:00Z")
    // TAGSEQ order first (DISK before MAIL), then remaining sorted
    assert(r.subject === "[DISK] [MAIL] [ALPHA] [ZEBRA] Status Report: h, 2026-08-11T06:00:00Z")
  }

  test("empty sections fall back to 'Nothing to report' (dailyreport.py:131-132)") {
    val r = DailyReport.compose(Seq(None, Some("")), Set.empty, "h", "t")
    assert(r.body === "Nothing to report\n")
  }

  test("disk section math + threshold tag (dailyreport.py:34-48)") {
    val tags = scala.collection.mutable.Set[String]()
    val s = DailyReport.diskSection(FakeProbe, tags)
    assert(tags.contains("DISK")) // 65 % >= 50
    assert(s.contains("650 000 000"))
    assert(s.contains("1 000 000 000"))
    assert(s.contains("(65.000000%)"))
  }

  test("errlogs section lists only nonempty files and tags LOGERR") {
    val tags = scala.collection.mutable.Set[String]()
    val s = DailyReport.errlogsSection(FakeProbe, tags)
    assert(tags.contains("LOGERR"))
    assert(s.get ===
      "The following files in /var/log/logsdb-errors are nonempty:\n    apache.err\n")
  }

  test("vnstat section aligns widths (dailyreport.py:92-107)") {
    val s = DailyReport.vnstatSection(FakeProbe)
    assert(s ===
      "Data sent yesterday:     123 456 789 B\nData received yesterday: 987 654 321 B\n")
  }

  test("apache section renders table + aligned byte totals (apache_access.py:52-83)") {
    val hits = Seq(Row("GET / HTTP/1.1", 12L), Row("GET /a HTTP/1.1", 3L))
    val s = DailyReport.apacheSection(hits, totalIn = 1234L, totalOut = 567890L)
    val expected =
      """Website activity in the past 24 hours:
        |+------+-----------------+
        || Hits |     Request     |
        |+------+-----------------+
        ||   12 | GET / HTTP/1.1  |
        ||    3 | GET /a HTTP/1.1 |
        |+------+-----------------+
        |Total bytes sent:     567 890
        |Total bytes received:   1 234
        |""".stripMargin
    assert(s === expected)
  }

  test("inbox section: empty -> 'none' (maillog.py:115-116)") {
    assert(DailyReport.inboxSection(Seq.empty) ===
      "E-mails received in the past 24 hours: none\n")
  }
}
