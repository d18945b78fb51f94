package graft.render

/** ASCII table renderer compatible with PrettyTable's default box style
  * (reference: `apache_access.py:54-56,71,74` and `authfail.py:31-33,40-43` build
  * `PrettyTable` with per-column alignment; headers are centered, data cells follow
  * the column alignment, one space of padding, `+---+` frame).
  */
object TextTable {
  sealed trait Align
  case object L extends Align
  case object R extends Align
  case object C extends Align

  def render(headers: Seq[String], aligns: Seq[Align], rows: Seq[Seq[String]]): String = {
    val widths = headers.indices.map { i =>
      (headers(i).length +: rows.map(r => r(i).length)).max
    }
    def rule: String = widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    def pad(s: String, w: Int, a: Align): String = a match {
      case L => s + " " * (w - s.length)
      case R => " " * (w - s.length) + s
      case C =>
        // PrettyTable mimics str.center(): for odd excess the extra space goes
        // left when the text length is even, right when it is odd.
        val total = w - s.length
        val left =
          if (total % 2 == 1 && s.length % 2 == 0) total / 2 + 1 else total / 2
        " " * left + s + " " * (total - left)
    }
    def line(cells: Seq[String], as: Seq[Align]): String =
      cells.zip(widths).zip(as).map { case ((s, w), a) => " " + pad(s, w, a) + " " }
        .mkString("|", "|", "|")
    val headerLine = line(headers, headers.map(_ => C))
    val body = rows.map(r => line(r, aligns))
    (Seq(rule, headerLine, rule) ++ body ++ Seq(rule)).mkString("\n")
  }
}
