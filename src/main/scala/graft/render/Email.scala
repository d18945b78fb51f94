package graft.render

/** W6 — e-mail emit (reference `__main__.py:62-74`): serialize the daily report
  * as an RFC-822-style message on stdout (delivery is the caller's job), or as
  * the pager-friendly pseudo-e-mail when attached to a TTY.
  */
object Email {

  /** Plain-text EmailMessage-equivalent serialization. */
  def render(subject: String, to: String, body: String): String = {
    val sb = new StringBuilder
    sb.append("Subject: ").append(subject).append("\n")
    sb.append("To: ").append(to).append("\n")
    sb.append("MIME-Version: 1.0\n")
    sb.append("Content-Type: text/plain; charset=\"utf-8\"\n")
    sb.append("Content-Transfer-Encoding: 8bit\n")
    sb.append("\n")
    sb.append(body)
    if (!body.endsWith("\n")) sb.append("\n")
    sb.toString
  }

  /** Pager form (reference `__main__.py:63-70`): pseudo-e-mail, trailing
    * newlines stripped.
    */
  def pagerForm(subject: String, body: String): String =
    s"Subject: $subject\n\n$body".replaceAll("\n+$", "")
}
