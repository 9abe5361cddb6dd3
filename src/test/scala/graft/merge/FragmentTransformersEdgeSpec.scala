package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** F2/F4/F5 edge cases ported from the reference's
  * tests/test_fragment_transformer.py (semantics, not code).
  */
class FragmentTransformersEdgeSpec extends AnyFunSuite {

  private def r(vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) })

  private def frag(rows: RowData*): Fragment = Fragment(rows.toList, 1)

  // ---- F2 FilterTitleRows ------------------------------------------------

  test("title row removed only within the first 3 rows (test_filter_title_rows_transformer_*)") {
    val in = frag(
      r("0" -> "Figure 1. Species"),
      r("0" -> "species", "1" -> "family"),
      r("0" -> "Ammi majus", "1" -> "Apiaceae"))
    assert(FilterTitleRowsTransformer.transformFragment(in) == frag(
      r("0" -> "species", "1" -> "family"),
      r("0" -> "Ammi majus", "1" -> "Apiaceae")))

    val late = frag(
      r("0" -> "species", "1" -> "family"),
      r("0" -> "Ammi majus", "1" -> "Apiaceae"),
      r("0" -> "Rosa canina", "1" -> "Rosaceae"),
      r("0" -> "Figure 2. Continued"))
    assert(FilterTitleRowsTransformer.transformFragment(late) == late)
  }

  test("title regex family: figure/fig./table/figura/tabla, split across columns") {
    def titled(s: String) = FilterTitleRowsTransformer.transformFragment(frag(r("0" -> s))).rows.isEmpty
    assert(titled("Figure 1. x"))
    assert(titled("fig. 2"))
    assert(titled("Fig.3"))
    assert(titled("Table 4 continued"))
    assert(titled("Figura 5"))
    assert(titled("Tabla 6"))
    assert(!titled("Apiaceae 12"))
    // split title across columns: non-empty values join with NO separator
    // (reference is_title_row "".join — test_is_title_row_detects_split_title_across_columns)
    val split = frag(r(
      "family" -> "Table 1: List of med", "scientific_name" -> "icinal s",
      "common_name" -> "pecies and us", "notes" -> "es with their"))
    assert(FilterTitleRowsTransformer.transformFragment(split).rows.isEmpty)
    // a gap that breaks the joined prefix keeps the row
    val broken = frag(r("0" -> "Table", "1" -> "3. Species list")) // "Table3. ..." — no match
    assert(FilterTitleRowsTransformer.transformFragment(broken) == broken)
  }

  // ---- F4 LeadingRowNumber -----------------------------------------------

  test("leading numbers stripped only when >=2 samples all match and strictly increase") {
    val in = frag(
      r("a" -> "1. Alpha", "b" -> "x"),
      r("a" -> "2. Beta", "b" -> "y"),
      r("a" -> "5. Gamma", "b" -> "z"))
    val out = LeadingRowNumberTransformer.transformFragment(in)
    assert(out == frag(
      r("a" -> "Alpha", "b" -> "x"),
      r("a" -> "Beta", "b" -> "y"),
      r("a" -> "Gamma", "b" -> "z")))
  }

  test("non-increasing or single-sample leading numbers are kept") {
    val nonInc = frag(r("a" -> "2. Beta"), r("a" -> "1. Alpha"))
    assert(LeadingRowNumberTransformer.transformFragment(nonInc) == nonInc)
    val single = frag(r("a" -> "1. Alpha"), r("a" -> "no number"))
    assert(LeadingRowNumberTransformer.transformFragment(single) == single)
    val dup = frag(r("a" -> "1. Alpha"), r("a" -> "1. Beta"))
    assert(LeadingRowNumberTransformer.transformFragment(dup) == dup)
  }

  // ---- F5 NormalizePunctuation --------------------------------------------

  private def norm(vals: (String, String)*): RowData =
    NormalizePunctuationTransformer.transformFragment(frag(r(vals: _*))).rows.head

  test("dash variants fold to '-' (test_normalize_punctuation_converts_dash_variants)") {
    assert(norm("period" -> "2010–2020", "range" -> "5—7")
      == r("period" -> "2010-2020", "range" -> "5-7"))
  }

  test("guillemets removed (test_normalize_punctuation_removes_guillemets)") {
    assert(norm("species" -> "«Homo sapiens»", "note" -> "‹present›")
      == r("species" -> "Homo sapiens", "note" -> "present"))
  }

  test("double quotes (typographic + straight) become single quotes") {
    assert(norm("value" -> "“positive”") == r("value" -> "'positive'"))
    assert(norm("value" -> "\"yes\"") == r("value" -> "'yes'"))
  }

  test("apostrophe family folds to the straight apostrophe") {
    // NOTE: the reference's own punctuation tests expect the TYPOGRAPHIC
    // apostrophe, but they are @pytest.mark.integration-excluded from its
    // CI and contradict the executed code: fragment_transformer.py:177
    // substitutes a straight "'" for every variant (golden-verified here).
    assert(norm("note" -> "don’t") == r("note" -> "don't"))
    // acute after non-vowel, grave, prime, modifier letters
    assert(norm("note" -> "don´t", "opening" -> "L´Hopital")
      == r("note" -> "don't", "opening" -> "L'Hopital"))
    assert(norm("note" -> "don`t") == r("note" -> "don't"))
    assert(norm("note" -> "don′t") == r("note" -> "don't"))
    assert(norm("note" -> "donʼt", "opening" -> "Lʻopital")
      == r("note" -> "don't", "opening" -> "L'opital"))
  }

  test("acute combines with a following vowel (test_normalize_punctuation_combines_acute_with_vowel)") {
    assert(norm("city" -> "Mo´nica", "note" -> "u´ltimo")
      == r("city" -> "Mónica", "note" -> "último"))
  }

  test("ellipsis becomes three dots") {
    assert(norm("note" -> "see below…") == r("note" -> "see below..."))
  }

  test("trailing dot stripped after long words, kept after short (abbreviation) words") {
    assert(norm("species" -> "Homo sapiens.", "location" -> "North America.")
      == r("species" -> "Homo sapiens", "location" -> "North America"))
    assert(norm("citation" -> "et al.", "figure" -> "Fig.", "taxon" -> "spp.", "rank" -> "sp.")
      == r("citation" -> "et al.", "figure" -> "Fig.", "taxon" -> "spp.", "rank" -> "sp."))
  }

  test("null cells pass through; list values transform per entry; special fields preserved") {
    val in = Fragment(List(RowData(
      Vector(
        "species" -> Cell.Str("Homo sapiens."),
        "note" -> Cell.Null,
        "multi" -> Cell.Multi(List(
          ValueWithAgreement("Homo sapiens.", 2), ValueWithAgreement("“positive”", 1)))),
      agreementLevel = Some(3), sources = Some(List("s1")), rowIdx = Some(5))), 1)
    val out = NormalizePunctuationTransformer.transformFragment(in).rows.head
    assert(out.get("species") == Some(Cell.Str("Homo sapiens")))
    assert(out.get("note") == Some(Cell.Null))
    assert(out.get("multi") == Some(Cell.Multi(List(
      ValueWithAgreement("Homo sapiens", 2), ValueWithAgreement("'positive'", 1)))))
    assert(out.agreementLevel == Some(3))
    assert(out.sources == Some(List("s1")))
    assert(out.rowIdx == Some(5))
  }
}
