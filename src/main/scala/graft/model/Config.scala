package graft.model

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Engine configuration (reference: `src/logsdb/config.py:9-40` — TOML → pydantic with
  * `extra="forbid"`). The reference's `[database]` postgres coordinates become the
  * warehouse directory holding the engine's Parquet tables.
  *
  * The TOML subset parsed here covers the reference's config shape exactly
  * ([section] headers, `key = "string" | true | false`); unknown keys are rejected to
  * mirror `extra="forbid"` (config.py:10).
  */
final case class DatabaseDetails(database: String, username: String, password: String)
final case class Features(
    apache_access: Boolean = false,
    authfail: Boolean = false,
    maillog: Boolean = false
)
final case class DailyReportCfg(recipient: String, mailbox: String, logs_dir: String)
final case class Config(
    database: DatabaseDetails,
    features: Features,
    dailyreport: DailyReportCfg
) {
  /** Warehouse root for the engine's tables (stands in for the reference's
    * postgres database, config.py:42-50).
    */
  def warehousePath: String = database.database
}

object Config {
  private val allowed: Map[String, Set[String]] = Map(
    "database" -> Set("database", "username", "password"),
    "features" -> Set("apache_access", "authfail", "maillog"),
    "dailyreport" -> Set("recipient", "mailbox", "logs_dir")
  )

  def fromTomlFile(path: Path): Config =
    fromToml(Files.readAllLines(path).asScala.toSeq)

  def fromToml(lines: Seq[String]): Config = {
    var section = ""
    val values = scala.collection.mutable.Map[(String, String), String]()
    val Section = """\s*\[([A-Za-z_]+)\]\s*""".r
    val KeyVal = """\s*([A-Za-z_]+)\s*=\s*(.+?)\s*""".r
    lines.foreach {
      case l if l.trim.isEmpty || l.trim.startsWith("#") => ()
      case Section(name) =>
        require(allowed.contains(name), s"unknown config section [$name]")
        section = name
      case KeyVal(key, raw) =>
        require(section.nonEmpty, s"key '$key' outside any section")
        require(allowed(section).contains(key), s"unknown key '$key' in [$section]")
        val v = raw.split("#", 2)(0).trim
        val unq =
          if (v.startsWith("\"") && v.endsWith("\"") && v.length >= 2)
            v.substring(1, v.length - 1)
          else v
        values((section, key)) = unq
      case l => throw new IllegalArgumentException(s"unparseable config line: $l")
    }
    def str(s: String, k: String): String =
      values.getOrElse((s, k), throw new IllegalArgumentException(s"missing [$s] $k"))
    def bool(s: String, k: String): Boolean =
      values.get((s, k)).exists(_.toBoolean)
    Config(
      DatabaseDetails(str("database", "database"), str("database", "username"),
        str("database", "password")),
      Features(bool("features", "apache_access"), bool("features", "authfail"),
        bool("features", "maillog")),
      DailyReportCfg(str("dailyreport", "recipient"), str("dailyreport", "mailbox"),
        str("dailyreport", "logs_dir"))
    )
  }
}
