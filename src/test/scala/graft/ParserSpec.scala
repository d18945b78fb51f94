package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.parse.{ApacheParser, AuthfailParser, MailParser}

/** Parsers against the FIXTURES.md format-faithful lines (reference formats:
  * apache_access.py:88-90, authfail.py:48-62, maillog.py:141-156).
  */
class ParserSpec extends GraftSpec {
  import spark.implicits._

  test("ApacheParser parses the documented line format") {
    val line = "2026-08-11 04:23:17 +0000|www.example.com|443|203.0.113.7|512|14034|2751|200|" +
      """["-", "GET /index.html HTTP/1.1", "GET", "/index.html", "HTTP/1.1", "-", "Mozilla/5.0 (X11; Linux x86_64)"]"""
    val res = ApacheParser.parse(Seq(line).toDF("value"))
    val r = res.events.collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[String]("host") === "www.example.com")
    assert(row.getAs[Int]("port") === 443)
    assert(row.getAs[String]("src_addr") === "203.0.113.7")
    assert(row.getAs[Long]("bytesin") === 512L)
    assert(row.getAs[Long]("bytesout") === 14034L)
    assert(row.getAs[Long]("microsecs") === 2751L)
    assert(row.getAs[Int]("status") === 200)
    assert(row.getAs[String]("authuser") === "-")
    assert(row.getAs[String]("reqline") === "GET /index.html HTTP/1.1")
    assert(row.getAs[String]("method") === "GET")
    assert(row.getAs[String]("path") === "/index.html")
    assert(row.getAs[String]("protocol") === "HTTP/1.1")
    assert(row.getAs[String]("user_agent") === "Mozilla/5.0 (X11; Linux x86_64)")
    assert(row.getAs[java.sql.Timestamp]("timestamp").toInstant.toString ===
      "2026-08-11T04:23:17Z")
    assert(res.deadLetters.count() === 0)
  }

  test("ApacheParser repairs mojibake via reencode (P3) and handles \\x escapes") {
    // UA logged by Apache as latin-1 bytes of UTF-8 "café", with \xhh escape
    val mojibake = new String("café".getBytes(UTF_8), "ISO-8859-1")
    val line = "2026-08-11 04:23:17 +0000|h|80|1.2.3.4|1|2|3|200|" +
      s"""["-", "GET / HTTP/1.1", "GET", "/", "HTTP/1.1", "-", "$mojibake\\x21"]"""
    val r = ApacheParser.parse(Seq(line).toDF("value")).events.collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("user_agent") === "café!")
  }

  test("ApacheParser dead-letters malformed lines instead of dropping (W5)") {
    val bad = Seq("not a log line", "2026-08-11 04:23:17 +0000|only|three")
    val res = ApacheParser.parse(bad.toDF("value"))
    assert(res.events.count() === 0)
    val dead = res.deadLetters.collect()
    assert(dead.length === 2)
    assert(dead(0).getAs[String]("error_type") === "ValueError")
  }

  test("AuthfailParser matches all reference regex variants (authfail.py:48-62)") {
    val lines = Seq(
      "2026-08-11T04:00:01.123456+00:00 myhost sshd[12345]: Failed password for invalid user admin from 198.51.100.23 port 51022 ssh2",
      "2026-08-11T04:00:02.000000+00:00 myhost sshd[12345]: Failed password for root from 198.51.100.23 port 51023 ssh2",
      "2026-08-11T04:00:03.000000+00:00 myhost sshd[12346]: Failed keyboard-interactive/pam for root from 203.0.113.9 port 40100 ssh2",
      "2026-08-11T04:00:04.000000+00:00 myhost sshd[12347]: message repeated 3 times: [ Failed password for git from 192.0.2.4 port 22222 ssh2]",
      "2026-08-11T04:00:05.000000+00:00 myhost sshd[12348]: Invalid user oracle from 198.51.100.23 port 51030",
      "2026-08-11T04:00:06.000000+00:00 myhost sshd[12349]: Failed none for invalid user  from 192.0.2.77 port 4242 ssh2"
    )
    val res = AuthfailParser.parse(lines.toDF("value"))
    val rows = res.events.orderBy("timestamp").collect()
    assert(rows.length === 6)
    // last line: optional "invalid user " group can't consume (double space), so
    // the username capture includes it — matches CPython fullmatch behavior.
    assert(rows.map(_.getAs[String]("username")).toSeq ===
      Seq("admin", "root", "root", "git", "oracle", "invalid user "))
    assert(rows(0).getAs[String]("src_addr") === "198.51.100.23")
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp").toInstant.toString ===
      "2026-08-11T04:00:01.123456Z")
    assert(res.deadLetters.count() === 0)
  }

  test("AuthfailParser dead-letters unmatched lines (hard error in reference)") {
    val res = AuthfailParser.parse(Seq(
      "2026-08-11T04:00:01+00:00 myhost sshd[1]: Accepted password for root from 1.2.3.4 port 22 ssh2"
    ).toDF("value"))
    assert(res.events.count() === 0)
    assert(res.deadLetters.count() === 1)
  }

  test("typed Dataset view over parsed events (SURVEY §1.4)") {
    val lines = Seq(
      "2026-08-11T04:00:01+00:00 h sshd[1]: Failed password for root from 1.2.3.4 port 22 ssh2",
      "2026-08-11T04:00:02+00:00 h sshd[2]: Failed password for root from 1.2.3.4 port 23 ssh2",
      "2026-08-11T04:00:03+00:00 h sshd[3]: Failed password for eve from 5.6.7.8 port 24 ssh2")
    val ds = graft.model.Typed.authfail(
      AuthfailParser.parse(lines.toDF("value")).events)
    // typed groupByKey aggregation over case-class fields
    val counts = ds.groupByKey(_.src_addr).count().collect().toMap
    assert(counts === Map("1.2.3.4" -> 2L, "5.6.7.8" -> 1L))
    assert(ds.head().username === "root")
  }

  test("MailParser extracts headers per maillog.py:141-156") {
    val raw =
      """From: "Ærøskøbing Lister" <lister@example.org>
        |To: John Doe <jdoe@mydomain.example>, =?utf-8?q?Jos=C3=A9?= <jose@elsewhere.example>
        |CC: jdoe@mydomain.example
        |Subject: =?utf-8?q?Daily_digest_=E2=80=94_caf=C3=A9?=
        |Date: Tue, 11 Aug 2026 03:59:00 +0000
        |Message-ID: <abc123@example.org>
        |
        |Body text.
        |""".stripMargin
    val p = MailParser.parseMessage(raw.getBytes(UTF_8)).toOption.get
    assert(p.subject === "Daily digest — café")
    assert(p.sender_name === "Ærøskøbing Lister")
    assert(p.sender_email === "lister@example.org")
    assert(p.date.toInstant.toString === "2026-08-11T03:59:00Z")
    assert(p.recipients.map(_.email) ===
      Seq("jdoe@mydomain.example", "jose@elsewhere.example", "jdoe@mydomain.example"))
    assert(p.recipients(1).realname === "José")
    assert(p.size === raw.getBytes(UTF_8).length.toLong)
  }

  test("MailParser defaults missing Subject to NO SUBJECT (maillog.py:153)") {
    val raw = "From: a@b.c\nDate: Tue, 11 Aug 2026 03:59:00 +0000\n\nx"
    val p = MailParser.parseMessage(raw.getBytes(UTF_8)).toOption.get
    assert(p.subject === "NO SUBJECT")
    assert(p.recipients.isEmpty)
  }

  test("MailParser unfolds continuation lines and splits quoted addresses") {
    val raw =
      "From: x@y.z\nTo: \"Doe, John\" <jdoe@d.e>,\n jane@d.e\nDate: Mon, 10 Aug 2026 00:00:00 +0000\n\n."
    val p = MailParser.parseMessage(raw.getBytes(UTF_8)).toOption.get
    assert(p.recipients.map(_.email) === Seq("jdoe@d.e", "jane@d.e"))
    assert(p.recipients(0).realname === "Doe, John")
  }

  test("MailParser flattens group addresses like policy=default .addresses") {
    // groups: display name dropped, members surface flat (maillog.py:148-151
    // reads msg["To"].addresses, which flattens RFC 5322 group syntax)
    val raw =
      """From: x@y.z
        |To: Team Alpha: a@x.example, Bea <b@y.example>;, solo@z.example
        |CC: undisclosed-recipients:;
        |Date: Mon, 10 Aug 2026 00:00:00 +0000
        |
        |.""".stripMargin
    val p = MailParser.parseMessage(raw.getBytes(UTF_8)).toOption.get
    assert(p.recipients.map(_.email) ===
      Seq("a@x.example", "b@y.example", "solo@z.example"))
    assert(p.recipients(1).realname === "Bea")
    // quoted colon must NOT start a group
    val q = MailParser.parseAddressList("\"Dept: Sales\" <sales@x.example>")
    assert(q === Seq(MailParser.Address("Dept: Sales", "sales@x.example")))
    // a domain-literal colon (user@[IPv6:...]) must NOT start a group either
    val lit6 = MailParser.parseAddressList("user@[IPv6:2001:db8::1]")
    assert(lit6 === Seq(MailParser.Address("", "user@[IPv6:2001:db8::1]")))
    // an unquoted display colon with NO terminating ';' is not group syntax
    val noSemi = MailParser.parseAddressList("Note: real <real@x.example>")
    assert(noSemi.map(_.email) === Seq("real@x.example"))
    assert(noSemi(0).realname === "Note: real")
  }

  test("MailParser rejects what process_input would raise on (strict parity)") {
    def err(raw: String): String =
      MailParser.parseMessage(raw.getBytes(UTF_8)).swap.toOption.get
    // absent From: msg["From"].addresses on None raises — even when a Sender
    // header exists (the reference never reads Sender)
    assert(err("Sender: s <s@relay.example>\nTo: t@d.e\n" +
      "Date: Mon, 10 Aug 2026 00:00:00 +0000\n\n.") === "AttributeError")
    // From present but zero addresses (empty group): .addresses[0] raises
    assert(err("From: undisclosed-recipients:;\n" +
      "Date: Mon, 10 Aug 2026 00:00:00 +0000\n\n.") === "IndexError")
    // absent Date: msg["Date"].datetime on None raises
    assert(err("From: a@b.c\nTo: t@d.e\n\n.") === "AttributeError")
    // unparseable Date: .datetime is None, inbox.date is non-nullable
    assert(err("From: a@b.c\nDate: not a date\n\n.") === "IntegrityError")
    // a From with both present parses From (never Sender)
    val both = "From: f@a.example\nSender: s@b.example\nDate: Mon, 10 Aug 2026 00:00:00 +0000\n\n."
    assert(MailParser.parseMessage(both.getBytes(UTF_8))
      .toOption.get.sender_email === "f@a.example")
  }
}
