package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL-INET-compatible sort key for textual IP addresses (reference
  * `core.py:14` declares `src_addr INET`; `authfail.py:38` orders by it).
  *
  * Produces a BinaryType key `[family] ++ addressBytes` — `0x04` + 4 bytes for
  * IPv4, `0x06` + 16 bytes for IPv6. Spark compares BinaryType bytewise
  * unsigned, which reproduces PostgreSQL's INET `<`: family first (all IPv4
  * sort before all IPv6), then numeric address bytes. Unparseable strings
  * yield NULL (never an ANSI cast error), so a malformed log line cannot fail
  * the report — it just sorts with the nulls.
  *
  * The parser accepts only literal addresses (dotted-quad IPv4; RFC 4291 IPv6
  * incl. `::` compression and an embedded IPv4 tail). Deliberately NOT
  * `InetAddress.getByName`, which falls back to hostname resolution — a DNS
  * lookup inside a codegen'd expression would be a scale (and security)
  * disaster on 100 TB of attacker-controlled strings.
  */
case class InetSortKey(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = BinaryType

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(StringType)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    InetSortKey.key(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // key() returns null for unparseable input, so the generated code must
    // re-check for null after the call (defineCodeGen assumes non-null out)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.InetSortKey.key(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): InetSortKey =
    copy(child = newChild)

  override def prettyName: String = "inet_sort_key"
}

object InetSortKey {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null for anything that is not a literal IPv4/IPv6 address.
    */
  def key(s: UTF8String): Array[Byte] = {
    if (s == null) return null
    val str = s.toString.trim
    val v4 = parseV4(str)
    if (v4 != null) {
      val out = new Array[Byte](5)
      out(0) = 4
      System.arraycopy(v4, 0, out, 1, 4)
      return out
    }
    val v6 = parseV6(str)
    if (v6 != null) {
      val out = new Array[Byte](17)
      out(0) = 6
      System.arraycopy(v6, 0, out, 1, 16)
      return out
    }
    null
  }

  /** Strict dotted-quad: exactly 4 decimal octets 0-255, no extra characters. */
  private[functions] def parseV4(s: String): Array[Byte] = {
    val out = new Array[Byte](4)
    var octet = 0
    var digits = 0
    var idx = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        octet = octet * 10 + (c - '0')
        digits += 1
        if (digits > 3 || octet > 255) return null
      } else if (c == '.') {
        if (digits == 0 || idx >= 3) return null
        out(idx) = octet.toByte
        idx += 1; octet = 0; digits = 0
      } else return null
      i += 1
    }
    if (digits == 0 || idx != 3) return null
    out(3) = octet.toByte
    out
  }

  /** RFC 4291 textual IPv6: 16-bit hex groups separated by ':', at most one
    * `::` compression, optional embedded dotted-quad as the last two groups.
    */
  private[functions] def parseV6(s: String): Array[Byte] = {
    if (s.indexOf(':') < 0) return null
    // split into head (before ::) and tail (after ::); reject multiple '::'
    val dc = s.indexOf("::")
    if (dc >= 0 && s.indexOf("::", dc + 1) >= 0) return null
    val (headStr, tailStr) =
      if (dc >= 0) (s.substring(0, dc), s.substring(dc + 2)) else (s, null)
    def groups(part: String): Array[String] =
      if (part == null || part.isEmpty) Array.empty else part.split(":", -1)
    val head = groups(headStr)
    val tail = if (dc >= 0) groups(tailStr) else Array.empty[String]
    if (dc < 0 && headStr.isEmpty) return null
    // an empty group outside '::' (e.g. ":1:2" or "1:::2") is malformed
    if (head.exists(_.isEmpty) || tail.exists(_.isEmpty)) return null

    def expand(gs: Array[String], canEndWithV4: Boolean): Array[Int] = {
      // each group is 1-4 hex digits, except a final embedded IPv4
      val buf = new scala.collection.mutable.ArrayBuffer[Int](8)
      var k = 0
      while (k < gs.length) {
        val g = gs(k)
        if (g.indexOf('.') >= 0) {
          // the dotted-quad must occupy the address's final 32 bits
          if (!canEndWithV4 || k != gs.length - 1) return null
          val v4 = parseV4(g)
          if (v4 == null) return null
          buf += ((v4(0) & 0xff) << 8) | (v4(1) & 0xff)
          buf += ((v4(2) & 0xff) << 8) | (v4(3) & 0xff)
        } else {
          if (g.length > 4) return null
          var v = 0
          var m = 0
          while (m < g.length) {
            val c = g.charAt(m)
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else return null
            v = (v << 4) | d
            m += 1
          }
          buf += v
        }
        k += 1
      }
      buf.toArray
    }

    val h = expand(head, canEndWithV4 = dc < 0)
    if (h == null) return null
    val t = expand(tail, canEndWithV4 = true)
    if (t == null) return null
    val total = h.length + t.length
    val fill = 8 - total
    // '::' must compress at least one group; without it need exactly 8
    if (dc >= 0 && fill < 1) return null
    if (dc < 0 && total != 8) return null

    val words = new Array[Int](8)
    var w = 0
    h.foreach { g => words(w) = g; w += 1 }
    w += (if (dc >= 0) fill else 0)
    t.foreach { g => words(w) = g; w += 1 }

    val out = new Array[Byte](16)
    var g = 0
    while (g < 8) {
      out(2 * g) = ((words(g) >> 8) & 0xff).toByte
      out(2 * g + 1) = (words(g) & 0xff).toByte
      g += 1
    }
    out
  }

  def apply(c: Column): Column =
    GraftBridge.column(InetSortKey(GraftBridge.expression(c)))
}
