package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parser for the quoted-string-array literal that terminates an Apache log
  * line (reference `apache_access.py:88-108`: `%u/%r/...` rendered as a
  * 7-element list literal, read back with `ast.literal_eval`).
  *
  * Replaces the previous two-pass pipeline — a `regexp_replace` rewriting
  * Apache's `\xhh` escapes to `\u00hh`, then `from_json` (a CodegenFallback
  * that allocates a Jackson parser per row) — with one codegen'd scan: the
  * single hottest expression on the ingest path. Handles JSON escapes plus
  * `\xhh` natively (closer to `literal_eval` than the regex rewrite, which
  * also mangled a literal backslash followed by `xhh`). Malformed input
  * yields NULL (never throws), which the caller routes to the dead-letter
  * sink exactly as `from_json`'s PERMISSIVE null did.
  */
case class ParseStrArray(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType)

  override def inputTypes: Seq[GraftBridge.AbsDataType] = Seq(StringType)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ParseStrArray.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // parse() returns null for malformed input, so the generated code must
    // re-check for null after the call (defineCodeGen assumes non-null out)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = ${childGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.ParseStrArray.parse(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseStrArray =
    copy(child = newChild)

  override def prettyName: String = "parse_str_array"
}

object ParseStrArray {

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null for anything `from_json` would reject (bareword tokens,
    * unbalanced nesting, bad escapes); accepts what it accepts — quoted
    * strings, JSON scalars (stringified the same way), nested structures
    * (captured as raw text).
    */
  def parse(u: UTF8String): ArrayData = {
    if (u == null) return null
    val s = u.toString
    val n = s.length
    var i = 0
    def ws(): Unit = { while (i < n && Character.isWhitespace(s.charAt(i))) i += 1 }
    def hex(len: Int): Int = {
      if (i + len > n) return -1
      var v = 0
      var k = 0
      while (k < len) {
        val c = s.charAt(i + k)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else return -1
        v = (v << 4) | d
        k += 1
      }
      i += len
      v
    }
    ws()
    if (i >= n || s.charAt(i) != '[') return null
    i += 1
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    ws()
    // trailing content after the closing ']' is ignored (from_json parity:
    // Jackson reads the first JSON value and stops)
    if (i < n && s.charAt(i) == ']') return new GenericArrayData(out.toArray)
    while (true) {
      ws()
      if (i >= n) return null
      if (s.charAt(i) == '"') {
        // quoted string with JSON escapes plus Apache's \xhh
        i += 1
        val sb = new java.lang.StringBuilder
        var closed = false
        while (!closed) {
          if (i >= n) return null
          val ch = s.charAt(i)
          if (ch == '"') { closed = true; i += 1 }
          else if (ch == '\\') {
            i += 1
            if (i >= n) return null
            val e = s.charAt(i)
            i += 1
            e match {
              case '"' => sb.append('"')
              case '\\' => sb.append('\\')
              case '/' => sb.append('/')
              case 'b' => sb.append('\b')
              case 'f' => sb.append('\f')
              case 'n' => sb.append('\n')
              case 'r' => sb.append('\r')
              case 't' => sb.append('\t')
              case 'u' => val h = hex(4); if (h < 0) return null; sb.append(h.toChar)
              case 'x' => val h = hex(2); if (h < 0) return null; sb.append(h.toChar)
              case _ => return null
            }
          } else if (ch < 0x20) return null // raw control char: malformed
          else { sb.append(ch); i += 1 }
        }
        out += UTF8String.fromString(sb.toString)
      } else if (s.charAt(i) == '[' || s.charAt(i) == '{') {
        // nested structure: from_json with a string schema captures it as raw
        // JSON text — emit the balanced substructure verbatim (matching
        // closers, quote-aware); unbalanced/mismatched nesting is malformed
        val start = i
        val stack = new scala.collection.mutable.ArrayDeque[Char]()
        var inQ = false
        var ok = true
        while (i < n && (i == start || stack.nonEmpty) && ok) {
          val c = s.charAt(i)
          if (inQ) {
            if (c == '\\') i += 1
            else if (c == '"') inQ = false
          } else c match {
            case '"' => inQ = true
            case '[' => stack.prepend(']')
            case '{' => stack.prepend('}')
            case ']' | '}' =>
              if (stack.isEmpty || stack.head != c) ok = false
              else stack.removeHead()
            case _ =>
          }
          i += 1
        }
        if (!ok || stack.nonEmpty || inQ) return null
        out += UTF8String.fromString(s.substring(start, i))
      } else {
        // bare token: ONLY strict JSON scalars, exactly as Jackson accepts
        // them — from_json stringifies ints verbatim, renders fraction/
        // exponent numbers from the parsed double ('1e3' -> '1000.0'), keeps
        // true/false, and maps JSON null to a null element; anything else
        // (barewords) is malformed
        val start = i
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != ']' &&
          !Character.isWhitespace(s.charAt(i))) i += 1
        if (i == start) return null
        val tok = s.substring(start, i)
        if (tok == "null") out += null
        else if (tok == "true" || tok == "false") out += UTF8String.fromString(tok)
        else if (tok.matches("-?(?:0|[1-9][0-9]*)"))
          // Jackson copies integers via getIntValue, so "-0" renders as "0"
          out += UTF8String.fromString(if (tok == "-0") "0" else tok)
        else if (tok.matches("-?(?:0|[1-9][0-9]*)(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"))
          out += UTF8String.fromString(java.lang.Double.toString(tok.toDouble))
        else return null
      }
      ws()
      if (i >= n) return null
      s.charAt(i) match {
        case ',' => i += 1
        case ']' => return new GenericArrayData(out.toArray)
        case _ => return null
      }
    }
    null // unreachable
  }

  def apply(c: Column): Column =
    GraftBridge.column(ParseStrArray(GraftBridge.expression(c)))
}
