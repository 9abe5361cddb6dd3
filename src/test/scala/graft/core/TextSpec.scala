package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Minimal JSON string/array-of-strings decoder for the parity fixtures. */
object Fx {
  def unJson(s: String): String = {
    require(s.startsWith("\"") && s.endsWith("\""), s"not a JSON string: $s")
    val b = new StringBuilder
    var i = 1
    while (i < s.length - 1) {
      val c = s.charAt(i)
      if (c == '\\') {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case '"' => b.append('"'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '/' => b.append('/'); i += 2
          case 'u' =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => throw new IllegalArgumentException(s"bad escape \\$other")
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  def unJsonStringArray(s: String): List[String] = {
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"))
    val inner = t.substring(1, t.length - 1).trim
    if (inner.isEmpty) Nil
    else {
      // fixture arrays contain only simple schema tokens (no commas inside)
      inner.split(",").toList.map(x => unJson(x.trim))
    }
  }

  def lines(resource: String): List[String] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList
    finally src.close()
  }
}

class TextSpec extends AnyFunSuite {
  import Text._

  /** Deterministic fuzz loop (seeded) — property-test substitute that
    * needs no extra deps beyond scalatest.
    */
  private def forAll(f: String => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    val interesting = "aA1 _-\t\n éñÜß…—‐«»“”´`(cid:200)½ﬁ́�表テキスト"
    for (_ <- 0 until 500) {
      val len = rnd.nextInt(24)
      val s = new StringBuilder
      for (_ <- 0 until len) {
        if (rnd.nextBoolean()) s.append(interesting.charAt(rnd.nextInt(interesting.length)))
        else s.append((rnd.nextInt(0x2fff) + 1).toChar)
      }
      f(s.toString)
    }
  }

  test("normalize_str / normalize_column_name / normalize_column_value parity") {
    for (line <- Fx.lines("/graft/parity/normalize.tsv")) {
      val Array(in, ns, ncn, ncv) = line.split("\t", -1)
      val input = Fx.unJson(in)
      assert(normalizeStr(input) == Fx.unJson(ns), s"normalizeStr($in)")
      assert(normalizeColumnName(input) == Fx.unJson(ncn), s"normalizeColumnName($in)")
      assert(normalizeColumnValue(input) == Fx.unJson(ncv), s"normalizeColumnValue($in)")
    }
  }

  test("python float() grammar parity") {
    for (line <- Fx.lines("/graft/parity/floats.tsv")) {
      val parts = line.split("\t", -1)
      val input = Fx.unJson(parts(0))
      val expectParses = parts(1) == "True"
      // CPython accepts non-ASCII decimal digits ("１２３"); our ASCII-only
      // grammar intentionally diverges there (fixtures we control are ASCII).
      val asciiOnly = input.forall(_ < 128)
      if (asciiOnly) {
        assert(pythonFloatParses(input) == expectParses, s"parses(${parts(0)})")
        if (expectParses && parts(2) != "null") {
          val d = pythonParseFloat(input).get
          assert(pyFloatRepr(d) == Fx.unJson(parts(2)), s"repr(${parts(0)})")
          if (parts(3) != "null" && !d.isInfinite) {
            assert(pyIntOfFloatRepr(d).contains(Fx.unJson(parts(3))), s"int(${parts(0)})")
          }
        }
      }
    }
  }

  test("python repr(float) parity on 420 doubles") {
    for (line <- Fx.lines("/graft/parity/float_repr.tsv")) {
      val Array(hex, expected) = line.split("\t", -1)
      val bits = java.lang.Long.parseUnsignedLong(hex, 16)
      val d = java.lang.Double.longBitsToDouble(bits)
      assert(pyFloatRepr(d) == Fx.unJson(expected), s"repr of bits $hex")
    }
  }

  test("coerce_str parity") {
    import ColType._
    for (line <- Fx.lines("/graft/parity/coerce.tsv")) {
      val Array(in, asStr, asInt, asFloat, asBool) = line.split("\t", -1)
      val input = Fx.unJson(in)
      assert(coerceStr(input, TStr) == Fx.unJson(asStr), s"str($in)")
      assert(coerceStr(input, TInt) == Fx.unJson(asInt), s"int($in)")
      assert(coerceStr(input, TFloat) == Fx.unJson(asFloat), s"float($in)")
      assert(coerceStr(input, TBool) == Fx.unJson(asBool), s"bool($in)")
    }
  }

  test("tokenize_schema parity") {
    for (line <- Fx.lines("/graft/parity/schema_tokens.tsv")) {
      val Array(in, expected) = line.split("\t", -1)
      val want = Fx.unJsonStringArray(Fx.unJson(expected))
      assert(tokenizeSchema(Fx.unJson(in)) == want, s"tokenizeSchema($in)")
    }
  }

  test("is_semantic_column matches reference rules") {
    assert(!isSemanticColumn("0"))
    assert(!isSemanticColumn("1e3"))
    assert(!isSemanticColumn("nan"))
    assert(!isSemanticColumn(" 2 "))
    assert(!isSemanticColumn("-1.5"))
    assert(isSemanticColumn("scientific_name"))
    assert(isSemanticColumn("a1"))
    assert(isSemanticColumn(""))
    assert(isSemanticColumn("1,2"))
  }

  test("normalizers are idempotent (property)") {
    forAll { s =>
      val once = normalizeStr(s)
      assert(normalizeStr(once) == once)
      val cn = normalizeColumnName(s)
      assert(normalizeColumnName(cn) == cn)
    }
  }

  test("normalizeColumnName output is closed over [a-z0-9_] (property)") {
    forAll { s =>
      val out = normalizeColumnName(s)
      assert(out.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_'))
      assert(!out.startsWith("_") && !out.endsWith("_") && !out.contains("__"))
    }
  }

  test("transliterate produces ASCII (property)") {
    forAll { s =>
      assert(transliterate(s).forall(_ < 128))
    }
  }

  test("transliterate covers merge-equality vocabulary") {
    assert(transliterate("café") == "cafe")
    assert(transliterate("Señor") == "Senor")
    assert(transliterate("Straße") == "Strasse")
    assert(transliterate("Ælfred") == "AElfred")
    assert(transliterate("naïve") == "naive")
    assert(transliterate("Müller") == "Muller")
  }

  test("scientific name canonicalization (gnparser-style)") {
    assert(ScientificName.parse("Homo sapiens") == "Homo sapiens")
    assert(ScientificName.parse("homo sapiens") == "Homo sapiens")
    assert(ScientificName.parse("Homo sapiens Linnaeus, 1758") == "Homo sapiens, 1758")
    assert(ScientificName.parse("Panthera leo, Panthera onca") == "Panthera leo, Panthera onca")
    assert(ScientificName.parse("Felis catus / Canis lupus") == "Felis catus, Canis lupus")
    assert(ScientificName.parse("Pinus sylvestris var. mongolica") == "Pinus sylvestris var. mongolica")
  }
}
