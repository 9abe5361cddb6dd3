package graft.core

/** Minimal ordered JSON AST + parser + serializer.
  *
  * The serializer reproduces CPython `json.dumps(obj, ensure_ascii=False)`
  * byte-for-byte for the value shapes this engine emits (objects keep
  * insertion order; separators ", " / ": "; control chars escaped as in
  * CPython; non-ASCII passes through raw) — required because the
  * reference's goldens are written that way
  * (/root/reference/src/paper2table/writers/file.py:21,
  * /root/reference/src/tablemerge/__main__.py:233-239).
  */
sealed trait JVal {
  def render: String = {
    val sb = new java.lang.StringBuilder
    JVal.write(sb, this)
    sb.toString
  }
}

object JVal {
  case object JNull extends JVal
  final case class JBool(b: Boolean) extends JVal
  /** Numbers carry their literal text so ints/floats round-trip exactly. */
  final case class JNum(raw: String) extends JVal
  final case class JStr(s: String) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def get(key: String): Option[JVal] = fields.collectFirst { case (`key`, v) => v }
  }

  def num(i: Int): JNum = JNum(i.toString)
  def num(l: Long): JNum = JNum(l.toString)

  def write(sb: java.lang.StringBuilder, v: JVal): Unit = v match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(if (b) "true" else "false")
    case JNum(raw) => sb.append(raw)
    case JStr(s) => writeString(sb, s)
    case JArr(items) =>
      sb.append('[')
      var first = true
      items.foreach { it =>
        if (!first) sb.append(", ")
        first = false
        write(sb, it)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(", ")
        first = false
        writeString(sb, k)
        sb.append(": ")
        write(sb, fv)
      }
      sb.append('}')
  }

  /** Quoted+escaped JSON string literal. */
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    writeString(sb, s)
    sb.toString
  }

  /** CPython json string escaping with ensure_ascii=False. */
  def writeString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  // -------------------------------------------------------------------
  // Parser (recursive descent; enough for .tables.json documents)
  // -------------------------------------------------------------------

  def parse(input: String): JVal = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' || s.charAt(pos) == '\t' || s.charAt(pos) == '\r')) pos += 1
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"JSON parse error at $pos: $msg")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def parseValue(): JVal = {
      skipWs()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _ => parseNum()
      }
    }

    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail(s"expected $lit")
      pos += lit.length
    }

    private def parseObj(): JObj = {
      expect('{')
      val b = Vector.newBuilder[(String, JVal)]
      skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(b.result()) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        skipWs()
        expect(':')
        val v = parseValue()
        b += ((k, v))
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }

    private def parseArr(): JArr = {
      expect('[')
      val b = Vector.newBuilder[JVal]
      skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(b.result()) }
      var done = false
      while (!done) {
        b += parseValue()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(b.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos)
        if (c == '"') { pos += 1; return sb.toString }
        else if (c == '\\') {
          pos += 1
          if (eof) fail("bad escape")
          s.charAt(pos) match {
            case '"' => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case '/' => sb.append('/'); pos += 1
            case 'n' => sb.append('\n'); pos += 1
            case 't' => sb.append('\t'); pos += 1
            case 'r' => sb.append('\r'); pos += 1
            case 'b' => sb.append('\b'); pos += 1
            case 'f' => sb.append('\f'); pos += 1
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 5
            case other => fail(s"bad escape \\$other")
          }
        } else { sb.append(c); pos += 1 }
      }
      throw new IllegalStateException("unreachable")
    }

    private def parseNum(): JNum = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || s.charAt(pos) == '.' || s.charAt(pos) == 'e' || s.charAt(pos) == 'E' || s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      if (pos == start) fail("expected number")
      JNum(s.substring(start, pos))
    }
  }
}
