package graft

import graft.model.Config

/** Config loading (reference config.py:9-40: TOML → pydantic, extra="forbid"). */
class ConfigSpec extends GraftSpec {

  private val good = Seq(
    "[database]",
    "database = \"logsdb\"",
    "username = \"logsdb\"",
    "password = \"secret\"",
    "",
    "[features]",
    "apache_access = true",
    "authfail = true",
    "maillog = false",
    "",
    "[dailyreport]",
    "recipient = \"admin@mydomain.example\"",
    "mailbox = \"/var/mail/root\"",
    "logs_dir = \"/var/log/logsdb-errors\""
  )

  test("parses the reference config shape") {
    val cfg = Config.fromToml(good)
    assert(cfg.database.database === "logsdb")
    assert(cfg.features.apache_access)
    assert(cfg.features.authfail)
    assert(!cfg.features.maillog)
    assert(cfg.dailyreport.recipient === "admin@mydomain.example")
    assert(cfg.warehousePath === "logsdb")
  }

  test("features default to false when omitted (config.py:19-22)") {
    val cfg = Config.fromToml(good.filterNot(_.startsWith("apache_access")))
    assert(!cfg.features.apache_access)
  }

  test("unknown keys are rejected (extra=forbid, config.py:10)") {
    intercept[IllegalArgumentException] {
      Config.fromToml(good :+ "bogus = \"x\"")
    }
    intercept[IllegalArgumentException] {
      Config.fromToml("[nonsense]" +: good)
    }
  }

  test("missing required keys are rejected") {
    intercept[IllegalArgumentException] {
      Config.fromToml(good.filterNot(_.startsWith("password")))
    }
  }
}
