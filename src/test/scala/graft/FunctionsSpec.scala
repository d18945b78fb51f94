package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.F

/** Scalar function semantics vs the reference's observable behavior
  * (core.py:51-65, apache_access.py:146-147, maillog.py:22-25).
  */
class FunctionsSpec extends GraftSpec {

  /** Minimal property loop (scalacheck Gen without the scalatest bridge). */
  private def forAll[A](gen: Gen[A], n: Int = 40)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("longintScala groups digits like reference core.py:51-57 incl. nl%3 edges") {
    assert(F.longintScala(0) === "0")
    assert(F.longintScala(1) === "1")
    assert(F.longintScala(12) === "12")
    assert(F.longintScala(123) === "123")
    assert(F.longintScala(1234) === "1 234")
    assert(F.longintScala(12345) === "12 345")
    assert(F.longintScala(123456) === "123 456")
    assert(F.longintScala(1234567) === "1 234 567")
    assert(F.longintScala(1000000000L) === "1 000 000 000")
  }

  test("longint Column matches longintScala for arbitrary non-negative longs") {
    forAll(Gen.chooseNum(0L, 9007199254740992L)) { n =>
      val viaCol = {
        import spark.implicits._
        Seq(n).toDF("n").select(F.longint(col("n"))).head().getString(0)
      }
      assert(viaCol === F.longintScala(n))
    }
  }

  test("reencode recovers UTF-8 mis-decoded as latin-1 (apache_access.py:146-147)") {
    // "café" encoded UTF-8 then decoded latin-1 gives "cafÃ©"; reencode recovers.
    val mojibake = new String("café".getBytes("UTF-8"), "ISO-8859-1")
    assert(mojibake === "cafÃ©")
    assert(F.reencodeScala(mojibake) === "café")
    assert(F.reencodeScala("plain ascii") === "plain ascii")
    assert(F.reencodeScala(null) === null)
  }

  test("reencode is identity on ASCII (property)") {
    forAll(Gen.asciiPrintableStr) { s =>
      assert(F.reencodeScala(s) === s)
    }
  }

  test("formatAddressScala mirrors email.headerregistry.Address rendering") {
    assert(F.formatAddressScala("John Doe", "jdoe@example.com") ===
      "John Doe <jdoe@example.com>")
    assert(F.formatAddressScala("", "bare@example.com") === "bare@example.com")
    // specials force quoting
    assert(F.formatAddressScala("Doe, John", "j@e.com") === "\"Doe, John\" <j@e.com>")
    assert(F.formatAddressScala("O\"Quote", "q@e.com") === "\"O\\\"Quote\" <q@e.com>")
    // non-ASCII is NOT encoded (maillog.py:22-25 comment)
    assert(F.formatAddressScala("Ærøskøbing Lister", "l@e.org") ===
      "Ærøskøbing Lister <l@e.org>")
  }

  test("domainOf takes text after FIRST @, case preserved (maillog.py:128 partition('@')[2])") {
    import spark.implicits._
    val out = Seq("User@MyDomain.Example", "noatsign", "a@b@C.d").toDF("e")
      .select(F.domainOf(col("e"))).as[String].collect()
    assert(out === Array("MyDomain.Example", "", "b@C.d"))
  }

  test("ipSortKey orders dotted quads numerically, not lexically") {
    import spark.implicits._
    val sorted = Seq("10.2.0.1", "10.10.0.1", "9.255.0.1").toDF("ip")
      .orderBy(F.ipSortKey(col("ip")).asc).as[String].collect()
    assert(sorted === Array("9.255.0.1", "10.2.0.1", "10.10.0.1"))
  }

  test("iso8601Z renders UTC with Z suffix (core.py:64-65)") {
    import spark.implicits._
    val out = Seq("2026-08-11 04:23:17").toDF("s")
      .select(F.iso8601Z(col("s").cast("timestamp"))).head().getString(0)
    assert(out === "2026-08-11T04:23:17Z")
  }
}
