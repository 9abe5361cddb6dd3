package graft.html

/** Byte-stream HTML tokenizer: a single forward scan producing start/end
  * tags, text, and skipping comments, doctypes, CDATA and raw-text element
  * content (script/style). No DOM library — this is the performance-critical
  * inner loop of the extraction stage (north rule: "byte-stream tokenizes
  * HTML, builds a lightweight DOM").
  *
  * Decodes a small, fixed entity set (named subset + numeric) — enough for
  * web-table content; unknown entities pass through literally.
  */
object HtmlTokenizer {

  sealed trait Tok { def pos: Int }
  final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean, pos: Int, endPos: Int) extends Tok
  final case class EndTag(name: String, pos: Int, endPos: Int) extends Tok

  /** A text run as a RANGE over the source string — the decoded text is
    * materialized lazily ([[text]]) or streamed straight into a builder
    * ([[appendTo]], the hot path: entity-free runs append as a char range
    * with no per-run substring, which was the tokenizer's largest
    * allocation class).
    */
  final case class TextTok(src: String, start: Int, endIdx: Int, pos: Int) extends Tok {
    /** Entity-decoded text (allocates; prefer [[appendTo]] on hot paths). */
    def text: String = rangeText(src, start, endIdx)

    /** Append the entity-decoded run to `sb` without intermediate strings. */
    def appendTo(sb: java.lang.StringBuilder): Unit =
      appendRangeTo(sb, src, start, endIdx)
  }

  /** Entity-decoded text of html[start, end) (static form of
    * [[TextTok.text]] for [[TokSink.text]] consumers).
    */
  def rangeText(src: String, start: Int, end: Int): String =
    if (indexOfIn(src, '&', start, end) < 0) src.substring(start, end)
    else {
      val sb = new java.lang.StringBuilder(end - start)
      decodeEntitiesInto(sb, src, start, end)
      sb.toString
    }

  /** Append the entity-decoded run html[start, end) to `sb` without
    * intermediate strings (static form of [[TextTok.appendTo]]).
    */
  def appendRangeTo(sb: java.lang.StringBuilder, src: String, start: Int, end: Int): Unit = {
    val amp = indexOfIn(src, '&', start, end)
    if (amp < 0) { sb.append(src, start, end); () }
    else decodeEntitiesInto(sb, src, start, end)
  }

  /** Streaming consumer of the token scan — the allocation-free hot path:
    * [[tokenizeInto]] drives a sink with NO per-token object (the
    * Iterator[Tok] form allocates a case-class instance per tag/text run,
    * ~150 objects per typical page; the extraction stage consumes tokens
    * exactly once in order, so the iterator indirection bought nothing).
    * Text runs arrive as (src, start, end) ranges with entities NOT yet
    * decoded — use [[appendRangeTo]]/[[rangeText]].
    */
  trait TokSink {
    def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean, pos: Int, endPos: Int): Unit
    def endTag(name: String, pos: Int, endPos: Int): Unit
    def text(src: String, start: Int, end: Int, pos: Int): Unit
  }

  private val RawTextTags = Set("script", "style")

  /** The only attribute names HtmlExtractor ever reads (`data-page` page
    * splits, `rowspan`/`colspan` grid resolution). Start-tag parsing scans
    * every attribute for correctness but materializes only these — on
    * attr-dense real-world pages (class/style/href on most tags) the
    * dropped name/value substrings were pure allocation-rate overhead.
    * Extend this array if the extractor starts consuming a new attribute.
    */
  private val RetainedAttrs = Array("data-page", "rowspan", "colspan")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "ldquo" -> "“", "rdquo" -> "”", "lsquo" -> "‘", "rsquo" -> "’",
    "laquo" -> "«", "raquo" -> "»", "middot" -> "·",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "eacute" -> "é", "egrave" -> "è", "aacute" -> "á", "agrave" -> "à",
    "iacute" -> "í", "oacute" -> "ó", "uacute" -> "ú", "ntilde" -> "ñ",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß"
  )

  /** Common tag/attribute names grouped by length: `internedName` matches a
    * source region against these case-insensitively WITHOUT allocating —
    * the `substring().toLowerCase` pair per tag/attr was a measurable slice
    * of the tokenizer's allocation rate; unknown names still fall back to
    * the allocating path, so behavior is unchanged.
    */
  private val InternedNames: Array[Array[String]] = {
    val names = Seq(
      "a", "b", "i", "p", "em", "h1", "h2", "h3", "h4", "h5", "h6", "hr",
      "br", "dl", "dt", "dd", "ol", "ul", "li", "td", "th", "tr", "id",
      "nav", "pre", "div", "img", "src", "rel", "alt",
      "body", "form", "head", "html", "span", "abbr", "cite", "code", "href",
      "meta", "link", "name", "role", "lang", "type",
      "aside", "table", "tbody", "thead", "tfoot", "title", "style", "class",
      "width", "small", "label",
      "footer", "header", "strong", "select", "option", "script", "figure",
      "iframe", "button", "height", "hidden",
      "section", "article", "caption", "colspan", "rowspan", "noscript",
      "template", "fieldset", "blockquote", "figcaption", "data-page")
    val byLen = names.groupBy(_.length)
    Array.tabulate(byLen.keys.max + 1)(l => byLen.getOrElse(l, Nil).toArray)
  }

  /** The lowercase name for html[start, end), reusing an interned constant
    * when the region matches one (ASCII case-insensitive); allocates only
    * for unknown names. The fast path bails on any non-ASCII char: per-char
    * Character.toLowerCase diverges from String.toLowerCase exactly when a
    * char's string lowercase is multi-char (e.g. U+0130 'İ' → "i̇"), so
    * restricting interning to ASCII keeps exotic tag/attr names
    * byte-identical to the allocating path.
    */
  private def internedName(html: String, start: Int, end: Int): String = {
    val len = end - start
    if (len > 0 && len < InternedNames.length) {
      val cands = InternedNames(len)
      var k = 0
      while (k < cands.length) {
        val t = cands(k)
        var j = 0
        var ok = true
        while (ok && j < len) {
          val c = html.charAt(start + j)
          if (c >= 0x80 || lowerAscii(c) != t.charAt(j)) ok = false
          j += 1
        }
        if (ok) return t
        k += 1
      }
      // any non-ASCII char also disqualifies names that matched no
      // candidate prefix-wise; the substring path below handles them
    }
    // Locale.ROOT: default-locale toLowerCase would fold "DIV" to "dıv"
    // under tr_TR and break every tag-name comparison downstream.
    html.substring(start, end).toLowerCase(java.util.Locale.ROOT)
  }

  private def lowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** ASCII-case-insensitive indexOf for lowercase-ASCII needles. Folding is
    * deliberately ASCII-only (HTML5 treats raw-text close tags as ASCII
    * case-insensitive, so `</scrİpt>` must NOT close a `<script>`): this is
    * both spec behavior and what keeps the string and byte scanners
    * emission-identical — Character.toLowerCase would additionally map
    * U+0130/U+212A into ASCII, which [[indexOfIgnoreCaseAscii]] (bytes)
    * never does.
    */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = needle.length
    val limit = hay.length - n
    var i = math.max(from, 0)
    while (i <= limit) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        val a = lowerAscii(hay.charAt(i + j))
        if (a != needle.charAt(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Decode character references in a text slice. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    decodeEntitiesInto(sb, s, 0, s.length)
    sb.toString
  }

  /** First index of `c` in s[from, to), or -1 — a bounded indexOf. */
  private[html] def indexOfIn(s: String, c: Char, from: Int, to: Int): Int = {
    var i = from
    while (i < to) {
      if (s.charAt(i) == c) return i
      i += 1
    }
    -1
  }

  /** Range form of [[decodeEntities]]: decode s[from, to) into `sb`
    * without materializing the slice; entity-free stretches append as
    * bulk char ranges. Entity handling is byte-identical to the string
    * form (an entity's `;` must fall INSIDE the range, as it had to fall
    * inside the substring before).
    */
  private[html] def decodeEntitiesInto(sb: java.lang.StringBuilder, s: String, from: Int, to: Int): Unit = {
    var i = from
    while (i < to) {
      val amp = indexOfIn(s, '&', i, to)
      if (amp < 0) { sb.append(s, i, to); return }
      if (amp > i) sb.append(s, i, amp)
      i = amp
      val semi = indexOfIn(s, ';', i + 1, to)
      if (semi > i && semi - i <= 10) {
        val body = s.substring(i + 1, semi)
        if (body.startsWith("#x") || body.startsWith("#X")) {
          try {
            val cp = Integer.parseInt(body.substring(2), 16)
            sb.appendCodePoint(cp); i = semi + 1
          } catch { case _: Exception => sb.append('&'); i += 1 }
        } else if (body.startsWith("#")) {
          try {
            val cp = Integer.parseInt(body.substring(1))
            sb.appendCodePoint(cp); i = semi + 1
          } catch { case _: Exception => sb.append('&'); i += 1 }
        } else NamedEntities.get(body) match {
          case Some(rep) => sb.append(rep); i = semi + 1
          case None => sb.append('&'); i += 1
        }
      } else { sb.append('&'); i += 1 }
    }
  }

  /** Tokenize a decoded HTML string into a buffered token sequence — the
    * convenience/test surface over [[tokenizeInto]]. The extraction hot
    * path drives a [[TokSink]] directly and allocates no Tok objects.
    * TextTok carries an UNDECODED range (entities decode lazily via
    * `text`/`appendTo`).
    */
  def tokenize(html: String): Iterator[Tok] = {
    val buf = Vector.newBuilder[Tok]
    tokenizeInto(html, new TokSink {
      def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean, pos: Int, endPos: Int): Unit = {
        buf += StartTag(name, attrs, selfClosing, pos, endPos); ()
      }
      def endTag(name: String, pos: Int, endPos: Int): Unit = { buf += EndTag(name, pos, endPos); () }
      def text(src: String, start: Int, end: Int, pos: Int): Unit = { buf += TextTok(src, start, end, pos); () }
    })
    buf.result().iterator
  }

  /** Single forward scan driving `sink` — same scanner, same emission
    * order and positions as the Iterator form (which is implemented on
    * top of this), with zero per-token allocation.
    */
  def tokenizeInto(html: String, sink: TokSink): Unit = {
    var i = 0
    var pendingRawEnd: String = null // inside <script>/<style>: skip to this end tag

    def parseStartTag(start: Int): Unit = {
      var j = start + 1
      val nameStart = j
      while (j < html.length && isNameChar(html.charAt(j))) j += 1
      if (j == nameStart) { // '<' followed by junk: empty self-closing tag
        sink.startTag("", Nil, selfClosing = true, start, start + 1)
        i = start + 1
        return
      }
      val name = internedName(html, nameStart, j)
      // built reversed via ::, reversed once at the end — no builder
      // allocation on the (overwhelmingly common) attribute-free tag
      var attrs: List[(String, String)] = Nil
      var selfClosing = false
      var done = false
      while (!done && j < html.length) {
        while (j < html.length && Character.isWhitespace(html.charAt(j))) j += 1
        if (j >= html.length) done = true
        else html.charAt(j) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < html.length && html.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
            else j += 1
          case _ =>
            val aStart = j
            while (j < html.length && !Character.isWhitespace(html.charAt(j)) &&
              html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
            // prune at the scan: only RetainedAttrs are ever consumed
            // downstream, so other attributes are SCANNED (quote handling
            // must stay exact) but their name/value never materialize
            val aName = retainedAttr(html, aStart, j)
            while (j < html.length && Character.isWhitespace(html.charAt(j))) j += 1
            var aVal = ""
            if (j < html.length && html.charAt(j) == '=') {
              j += 1
              while (j < html.length && Character.isWhitespace(html.charAt(j))) j += 1
              if (j < html.length && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                val q = html.charAt(j)
                val vStart = j + 1
                val vEnd = html.indexOf(q, vStart)
                if (vEnd < 0) { if (aName != null) aVal = html.substring(vStart); j = html.length }
                else { if (aName != null) aVal = html.substring(vStart, vEnd); j = vEnd + 1 }
              } else {
                val vStart = j
                while (j < html.length && !Character.isWhitespace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                if (aName != null) aVal = html.substring(vStart, j)
              }
            }
            if (aName != null) attrs = (aName, decodeEntities(aVal)) :: attrs
        }
      }
      sink.startTag(name, attrs.reverse, selfClosing, start, j)
      i = j
      if (!selfClosing && RawTextTags.contains(name)) pendingRawEnd = "</" + name
    }

    while (i < html.length) {
      if (pendingRawEnd != null) {
        val close = indexOfIgnoreCase(html, pendingRawEnd, i)
        val endName = pendingRawEnd.substring(2)
        if (close < 0) { i = html.length; pendingRawEnd = null }
        else {
          val gt = html.indexOf('>', close)
          i = if (gt < 0) html.length else gt + 1
          sink.endTag(endName, close, i)
          pendingRawEnd = null
        }
      } else {
        val lt = html.indexOf('<', i)
        if (lt < 0) {
          if (i < html.length) sink.text(html, i, html.length, i)
          i = html.length
        } else if (lt > i) {
          sink.text(html, i, lt, i)
          i = lt
        } else {
          // at a '<'
          if (html.startsWith("<!--", i)) {
            val close = html.indexOf("-->", i + 4)
            i = if (close < 0) html.length else close + 3
          } else if (html.startsWith("<![CDATA[", i)) {
            val close = html.indexOf("]]>", i + 9)
            i = if (close < 0) html.length else close + 3
          } else if (i + 1 < html.length && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
            val gt = html.indexOf('>', i)
            i = if (gt < 0) html.length else gt + 1
          } else if (i + 1 < html.length && html.charAt(i + 1) == '/') {
            val gt = html.indexOf('>', i)
            if (gt < 0) { i = html.length }
            else {
              var ns = i + 2
              var ne = gt
              while (ns < ne && html.charAt(ns) <= ' ') ns += 1 // String.trim semantics
              while (ne > ns && html.charAt(ne - 1) <= ' ') ne -= 1
              sink.endTag(internedName(html, ns, ne), i, gt + 1)
              i = gt + 1
            }
          } else parseStartTag(lt)
        }
      }
    }
  }

  // -------------------------------------------------------------------
  // Byte-level scan: tokenize the RAW UTF-8 page bytes, decoding only
  // the text that downstream keeps
  // -------------------------------------------------------------------

  /** Streaming consumer of the BYTE-level token scan. Identical contract
    * to [[TokSink]], except text runs arrive as ranges over the raw UTF-8
    * byte array (entities not yet decoded) — consume them with the byte
    * overloads of [[appendRangeTo]]/[[rangeText]], which fuse UTF-8 decode
    * with entity decode. `pos`/`endPos` are CHAR offsets (UTF-16 code
    * units) of the would-be decoded document, byte-identical to the String
    * scanner's positions on valid UTF-8 — so spans and page-range
    * arithmetic don't change when the input skips the full-document
    * decode.
    */
  trait ByteTokSink {
    def startTag(name: String, attrs: List[(String, String)], selfClosing: Boolean, pos: Int, endPos: Int): Unit
    def endTag(name: String, pos: Int, endPos: Int): Unit
    def text(src: Array[Byte], startB: Int, endB: Int, pos: Int): Unit
  }

  /** UTF-16 length of the decoded form of `src`: one unit per 1-3-byte
    * sequence, two per 4-byte sequence. Counts with the SAME state machine
    * as [[decodeCp]], so on malformed input (stray continuation bytes,
    * 0xF5-0xFF, truncated sequences) the count still equals exactly the
    * number of UTF-16 units [[appendRangeTo]] emits — positions and
    * decoded text can never desync, valid UTF-8 or not.
    */
  def charLength(src: Array[Byte]): Int = {
    var i = 0
    var c = 0
    val n = src.length
    while (i < n) {
      val step = utf16Step(src, i, n)
      c += (step & 0xFFFFFFFFL).toInt
      i += (step >>> 32).toInt
    }
    c
  }

  /** One counting step at src(i): `(bytesConsumed << 32) | utf16Units`.
    * This is the ONE place the byte→UTF-16 advance rule lives — both
    * [[charLength]] and the byte scanner's position counter step with it,
    * so a future change to the malformed-input replacement policy cannot
    * desync span ends (charLength) from token positions (charPos).
    */
  @inline private[html] def utf16Step(src: Array[Byte], i: Int, n: Int): Long = {
    val b = src(i) & 0xFF
    if (b < 0x80) (1L << 32) | 1L
    else {
      val packed = decodeCp(src, i, n)
      val units = if ((packed & 0xFFFFFFFFL) >= 0x10000L) 2L else 1L
      (packed & 0xFFFFFFFF00000000L) | units
    }
  }

  /** Entity-decoded text of src[from, to) — byte-array form of
    * [[rangeText]]; UTF-8 decode fused with entity decode, so only this
    * range ever materializes as chars.
    */
  def rangeText(src: Array[Byte], from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    appendRangeTo(sb, src, from, to)
    sb.toString
  }

  /** Append the entity- and UTF-8-decoded run src[from, to) to `sb` with
    * no intermediate strings — the byte-scan hot path. Semantics mirror
    * [[decodeEntitiesInto]] exactly on valid UTF-8 (an entity's `;` must
    * fall inside the range; bad numeric refs fall through as literal '&').
    */
  def appendRangeTo(sb: java.lang.StringBuilder, src: Array[Byte], from: Int, to: Int): Unit = {
    var i = from
    while (i < to) {
      val b = src(i) & 0xFF
      if (b == '&') {
        // The string path's window is 10 CHARS ('&' to ';' inclusive of
        // neither, semi - amp <= 10 UTF-16 units). 9 body units occupy at
        // most 27 bytes, so a byte-window of 30 is sufficient; the char
        // condition is then re-checked on the decoded body so multi-byte
        // bodies gate identically to the string scanner.
        val semi = indexOfByteIn(src, ';', i + 1, math.min(to, i + 31))
        val body: String =
          if (semi < 0) null
          else {
            val ascii = asciiSlice(src, i + 1, semi)
            if (ascii != null) { if (semi - i <= 10) ascii else null }
            else {
              // rare: non-ASCII bytes in an entity body — decode and
              // apply the same numeric/named rules the string path does
              // (Integer.parseInt accepts any Unicode digit, so
              // `&#١٢٣;` must decode here exactly as it does there)
              val s = new String(src, i + 1, semi - i - 1,
                java.nio.charset.StandardCharsets.UTF_8)
              if (s.length + 1 <= 10) s else null
            }
          }
        if (body != null) {
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              val cp = Integer.parseInt(body.substring(2), 16)
              sb.appendCodePoint(cp); i = semi + 1
            } catch { case _: Exception => sb.append('&'); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              val cp = Integer.parseInt(body.substring(1))
              sb.appendCodePoint(cp); i = semi + 1
            } catch { case _: Exception => sb.append('&'); i += 1 }
          } else NamedEntities.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append('&'); i += 1
          }
        } else { sb.append('&'); i += 1 }
      } else if (b < 0x80) {
        sb.append(b.toChar); i += 1
      } else {
        val packed = decodeCp(src, i, to)
        sb.appendCodePoint((packed & 0xFFFFFFFFL).toInt)
        i += (packed >>> 32).toInt
      }
    }
  }

  /** src[from, to) as a String iff every byte is ASCII; null otherwise. */
  private def asciiSlice(src: Array[Byte], from: Int, to: Int): String = {
    var i = from
    while (i < to) {
      if ((src(i) & 0xFF) >= 0x80) return null
      i += 1
    }
    val out = new Array[Char](to - from)
    i = from
    while (i < to) { out(i - from) = (src(i) & 0xFF).toChar; i += 1 }
    new String(out)
  }

  /** Decode the UTF-8 sequence at src[i]: returns (len << 32) | codePoint.
    * Malformed sequences decode to U+FFFD with length 1 (valid UTF-8 —
    * the case the corpus guarantees — is exact; the replacement policy on
    * junk approximates the JDK decoder's).
    */
  private def decodeCp(src: Array[Byte], i: Int, end: Int): Long = {
    @inline def cont(k: Int): Boolean = k < end && (src(k) & 0xC0) == 0x80
    val b0 = src(i) & 0xFF
    if (b0 < 0xC2) (1L << 32) | 0xFFFD // stray continuation or overlong lead
    else if (b0 < 0xE0) {
      if (cont(i + 1)) (2L << 32) | (((b0 & 0x1F) << 6) | (src(i + 1) & 0x3F)).toLong
      else (1L << 32) | 0xFFFD
    } else if (b0 < 0xF0) {
      if (cont(i + 1) && cont(i + 2)) {
        val cp = ((b0 & 0x0F) << 12) | ((src(i + 1) & 0x3F) << 6) | (src(i + 2) & 0x3F)
        if (cp >= 0x800 && !(cp >= 0xD800 && cp <= 0xDFFF)) (3L << 32) | cp.toLong
        else (1L << 32) | 0xFFFD
      } else (1L << 32) | 0xFFFD
    } else if (b0 < 0xF5) {
      if (cont(i + 1) && cont(i + 2) && cont(i + 3)) {
        val cp = ((b0 & 0x07) << 18) | ((src(i + 1) & 0x3F) << 12) |
          ((src(i + 2) & 0x3F) << 6) | (src(i + 3) & 0x3F)
        if (cp >= 0x10000 && cp <= 0x10FFFF) (4L << 32) | cp.toLong
        else (1L << 32) | 0xFFFD
      } else (1L << 32) | 0xFFFD
    } else (1L << 32) | 0xFFFD
  }

  /** First index of ASCII byte `c` in src[from, to), or -1. Safe on UTF-8:
    * continuation/lead bytes are >= 0x80 and can never equal an ASCII
    * needle.
    */
  private[html] def indexOfByteIn(src: Array[Byte], c: Char, from: Int, to: Int): Int = {
    val cb = c.toByte
    var i = from
    while (i < to) {
      if (src(i) == cb) return i
      i += 1
    }
    -1
  }

  private def startsWithAscii(src: Array[Byte], i: Int, pat: String): Boolean = {
    if (i + pat.length > src.length) return false
    var j = 0
    while (j < pat.length) {
      if (src(i + j) != pat.charAt(j).toByte) return false
      j += 1
    }
    true
  }

  private def indexOfAscii(src: Array[Byte], pat: String, from: Int): Int = {
    val limit = src.length - pat.length
    var i = math.max(from, 0)
    while (i <= limit) {
      if (startsWithAscii(src, i, pat)) return i
      i += 1
    }
    -1
  }

  /** Case-insensitive indexOf for lowercase-ASCII needles over bytes. */
  private def indexOfIgnoreCaseAscii(src: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.length
    val limit = src.length - n
    var i = math.max(from, 0)
    while (i <= limit) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        val b = src(i + j) & 0xFF
        val a = if (b < 0x80) lowerAscii(b.toChar) else b.toChar
        if (a != needle.charAt(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  private def internedNameBytes(src: Array[Byte], start: Int, end: Int): String = {
    val len = end - start
    if (len > 0 && len < InternedNames.length) {
      val cands = InternedNames(len)
      var k = 0
      while (k < cands.length) {
        val t = cands(k)
        var j = 0
        var ok = true
        while (ok && j < len) {
          val b = src(start + j) & 0xFF
          if (b >= 0x80 || lowerAscii(b.toChar) != t.charAt(j)) ok = false
          j += 1
        }
        if (ok) return t
        k += 1
      }
    }
    // Locale.ROOT for the same reason as internedName's fallback.
    new String(src, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
      .toLowerCase(java.util.Locale.ROOT)
  }

  private def retainedAttrBytes(src: Array[Byte], start: Int, end: Int): String = {
    val len = end - start
    var k = 0
    while (k < RetainedAttrs.length) {
      val t = RetainedAttrs(k)
      if (t.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          val b = src(start + j) & 0xFF
          if (b >= 0x80 || lowerAscii(b.toChar) != t.charAt(j)) ok = false
          j += 1
        }
        if (ok) return t
      }
      k += 1
    }
    null
  }

  /** Single forward scan over the RAW UTF-8 bytes driving `sink` — same
    * scanner structure, emission order and CHAR positions as
    * [[tokenizeInto]] on the decoded string (HtmlTokenizerBytesSpec pins
    * the equivalence property), but the document is never decoded as a
    * whole: markup, skipped subtrees and dropped attributes stay bytes,
    * and only the text ranges the sink keeps pay UTF-8 decode. Non-ASCII
    * sequences inside tags are evaluated per code point (so exotic
    * Unicode whitespace separates attributes exactly as it does in the
    * char scanner).
    */
  def tokenizeBytesInto(html: Array[Byte], sink: ByteTokSink): Unit = {
    val n = html.length
    var i = 0
    var pendingRawEnd: String = null

    // lazy, monotone byte→char(UTF-16) position counter: every sink
    // position is derived by advancing this counter over the bytes in
    // between — each byte is counted exactly once across the whole scan.
    // Steps with decodeCp (not per-byte lead-byte heuristics) so the
    // count equals the units appendRangeTo emits even on malformed
    // UTF-8. Targets always land on step boundaries: the scanner's
    // boundaries are ASCII delimiters, decodeCp consumes >1 byte only
    // for VALID sequences, and valid sequences contain no ASCII bytes.
    var cpB = 0
    var cpC = 0
    def charPos(target: Int): Int = {
      var b = cpB
      var c = cpC
      while (b < target) {
        val step = utf16Step(html, b, n)
        c += (step & 0xFFFFFFFFL).toInt
        b += (step >>> 32).toInt
      }
      cpB = b; cpC = c
      c
    }

    // whitespace test at byte index j (ASCII fast path; non-ASCII decodes
    // the code point so Unicode whitespace matches the char scanner);
    // returns the byte length to skip if whitespace, else 0
    def wsLenAt(j: Int): Int = {
      val b = html(j) & 0xFF
      if (b < 0x80) { if (Character.isWhitespace(b.toChar)) 1 else 0 }
      else {
        val packed = decodeCp(html, j, n)
        if (Character.isWhitespace((packed & 0xFFFFFFFFL).toInt)) (packed >>> 32).toInt else 0
      }
    }
    @inline def seqLenAt(j: Int): Int = {
      val b = html(j) & 0xFF
      if (b < 0x80) 1 else (decodeCp(html, j, n) >>> 32).toInt
    }

    def parseStartTag(start: Int): Unit = {
      var j = start + 1
      val nameStart = j
      while (j < n && isNameCharB(html(j))) j += 1
      if (j == nameStart) {
        sink.startTag("", Nil, selfClosing = true, charPos(start), charPos(start + 1))
        i = start + 1
        return
      }
      val name = internedNameBytes(html, nameStart, j)
      var attrs: List[(String, String)] = Nil
      var selfClosing = false
      var done = false
      while (!done && j < n) {
        var w = 0
        while (j < n && { w = wsLenAt(j); w > 0 }) j += w
        if (j >= n) done = true
        else ((html(j) & 0xFF).toChar) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < n && html(j + 1) == '>') { selfClosing = true; j += 2; done = true }
            else j += 1
          case _ =>
            val aStart = j
            while (j < n && wsLenAt(j) == 0 && html(j) != '=' && html(j) != '>' && html(j) != '/')
              j += seqLenAt(j)
            val aName = retainedAttrBytes(html, aStart, j)
            while (j < n && { w = wsLenAt(j); w > 0 }) j += w
            var aVal = ""
            if (j < n && html(j) == '=') {
              j += 1
              while (j < n && { w = wsLenAt(j); w > 0 }) j += w
              if (j < n && (html(j) == '"' || html(j) == '\'')) {
                val q = (html(j) & 0xFF).toChar
                val vStart = j + 1
                val vEnd = indexOfByteIn(html, q, vStart, n)
                if (vEnd < 0) { if (aName != null) aVal = rangeRaw(html, vStart, n); j = n }
                else { if (aName != null) aVal = rangeRaw(html, vStart, vEnd); j = vEnd + 1 }
              } else {
                val vStart = j
                while (j < n && wsLenAt(j) == 0 && html(j) != '>') j += seqLenAt(j)
                if (aName != null) aVal = rangeRaw(html, vStart, j)
              }
            }
            if (aName != null) attrs = (aName, decodeEntities(aVal)) :: attrs
        }
      }
      sink.startTag(name, attrs.reverse, selfClosing, charPos(start), charPos(j))
      i = j
      if (!selfClosing && RawTextTags.contains(name)) pendingRawEnd = "</" + name
    }

    while (i < n) {
      if (pendingRawEnd != null) {
        val close = indexOfIgnoreCaseAscii(html, pendingRawEnd, i)
        val endName = pendingRawEnd.substring(2)
        if (close < 0) { i = n; pendingRawEnd = null }
        else {
          val gt = indexOfByteIn(html, '>', close, n)
          val endB = if (gt < 0) n else gt + 1
          sink.endTag(endName, charPos(close), charPos(endB))
          i = endB
          pendingRawEnd = null
        }
      } else {
        val lt = indexOfByteIn(html, '<', i, n)
        if (lt < 0) {
          if (i < n) sink.text(html, i, n, charPos(i))
          i = n
        } else if (lt > i) {
          sink.text(html, i, lt, charPos(i))
          i = lt
        } else {
          if (startsWithAscii(html, i, "<!--")) {
            val close = indexOfAscii(html, "-->", i + 4)
            i = if (close < 0) n else close + 3
          } else if (startsWithAscii(html, i, "<![CDATA[")) {
            val close = indexOfAscii(html, "]]>", i + 9)
            i = if (close < 0) n else close + 3
          } else if (i + 1 < n && (html(i + 1) == '!' || html(i + 1) == '?')) {
            val gt = indexOfByteIn(html, '>', i, n)
            i = if (gt < 0) n else gt + 1
          } else if (i + 1 < n && html(i + 1) == '/') {
            val gt = indexOfByteIn(html, '>', i, n)
            if (gt < 0) { i = n }
            else {
              var ns = i + 2
              var ne = gt
              while (ns < ne && (html(ns) & 0xFF) <= ' ') ns += 1 // String.trim semantics
              while (ne > ns && (html(ne - 1) & 0xFF) <= ' ') ne -= 1
              sink.endTag(internedNameBytes(html, ns, ne), charPos(i), charPos(gt + 1))
              i = gt + 1
            }
          } else parseStartTag(lt)
        }
      }
    }
  }

  /** Raw (pre-entity-decode) UTF-8 string of src[from, to) — the byte
    * analog of String#substring for attribute values (entity decode
    * happens in the caller, mirroring the char scanner).
    */
  private def rangeRaw(src: Array[Byte], from: Int, to: Int): String =
    new String(src, from, to - from, java.nio.charset.StandardCharsets.UTF_8)

  @inline private def isNameCharB(b: Byte): Boolean = {
    val c = b & 0xFF
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
  }

  /** The interned attribute name iff html[start, end) ASCII-case-
    * insensitively matches one the extractor consumes; null otherwise
    * (allocation-free either way).
    */
  private def retainedAttr(html: String, start: Int, end: Int): String = {
    val len = end - start
    var k = 0
    while (k < RetainedAttrs.length) {
      val t = RetainedAttrs(k)
      if (t.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          val c = html.charAt(start + j)
          if (c >= 0x80 || lowerAscii(c) != t.charAt(j)) ok = false
          j += 1
        }
        if (ok) return t
      }
      k += 1
    }
    null
  }

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
}
