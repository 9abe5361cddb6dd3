package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** A0/A1/J5 aligner edge cases ported from the reference's
  * tests/test_columns_aligner.py (semantics, not code).
  */
class ColumnsAlignerEdgeSpec extends AnyFunSuite {

  private def r(vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) })

  private def frag(rows: RowData*): Fragment = Fragment(rows.toList, 1)

  private def jacc(threshold: Double = 0.5) = new JaccardMergeTimeAnalyzer(threshold)

  private def mapping(left: Fragment, right: Option[Fragment], threshold: Double = 0.5) =
    ColumnsAligner.mergeTimeMapping(left, right, List(jacc(threshold))).toMap

  // ---- the reference's 20-species fixture (test_columns_aligner.py:177-210)

  private val Species = List(
    ("Ammi majus L.", "45.2", "Apiaceae", "Greater ammi"),
    ("Rosa canina L.", "12.8", "Rosaceae", "Dog rose"),
    ("Mentha spicata L.", "67.3", "Lamiaceae", "Spearmint"),
    ("Betula pendula Roth", "89.1", "Betulaceae", "Silver birch"),
    ("Quercus robur L.", "23.4", "Fagaceae", "English oak"),
    ("Taraxacum officinale F.H.Wigg.", "56.7", "Asteraceae", "Dandelion"),
    ("Urtica dioica L.", "34.9", "Urticaceae", "Stinging nettle"),
    ("Sambucus nigra L.", "78.2", "Adoxaceae", "Black elder"),
    ("Hypericum perforatum L.", "41.5", "Hypericaceae", "St John's wort"),
    ("Achillea millefolium L.", "93.6", "Asteraceae", "Yarrow"),
    ("Plantago lanceolata L.", "17.3", "Plantaginaceae", "Ribwort plantain"),
    ("Matricaria chamomilla L.", "52.8", "Asteraceae", "German chamomile"),
    ("Lavandula angustifolia Mill.", "61.4", "Lamiaceae", "Lavender"),
    ("Rosmarinus officinalis L.", "38.7", "Lamiaceae", "Rosemary"),
    ("Thymus vulgaris L.", "25.1", "Lamiaceae", "Common thyme"),
    ("Origanum vulgare L.", "72.9", "Lamiaceae", "Oregano"),
    ("Salvia officinalis L.", "44.6", "Lamiaceae", "Common sage"),
    ("Foeniculum vulgare Mill.", "83.2", "Apiaceae", "Fennel"),
    ("Melissa officinalis L.", "19.5", "Lamiaceae", "Lemon balm"),
    ("Echinacea purpurea (L.) Moench", "67.8", "Asteraceae", "Purple coneflower"))

  private val SpeciesWithEdits = List(
    ("Ammi majus", "45.2", "Apiaceae", "Greater ammi spp."),
    ("Rosa canina, L.", "12.8", "Rosaceae", "Dog-rose"),
    ("Mentha spicata", "67.3", "Lamiaceae", "Spearmint herb"),
    ("Betula pendula Rot", "89.1", "Betulaceae", "Silver-birch"),
    ("Quercus robur", "23.4", "Fagaceae", "Eng. oak"),
    ("T. officinale F.H.Wigg.", "56.7", "Asteraceae", "Dandelyon")) ++ Species.drop(6)

  private val FourColumnsMapping = Map(
    "0" -> "scientific_name", "1" -> "area", "2" -> "family", "3" -> "vernacular_name")

  private def semanticFrag(data: List[(String, String, String, String)]): Fragment =
    Fragment(data.map { case (sn, a, f, vn) =>
      r("scientific_name" -> sn, "area" -> a, "family" -> f, "vernacular_name" -> vn)
    }, 1)

  private def numericFrag(data: List[(String, String, String, String)]): Fragment =
    Fragment(data.map { case (sn, a, f, vn) =>
      r("0" -> sn, "1" -> a, "2" -> f, "3" -> vn)
    }, 1)

  // ---- basic direction / emptiness matrix ---------------------------------

  test("right-numeric maps to left-semantic and vice versa (test_column_aligner_*_numeric_to_*_semantic)") {
    val leftSem = frag(
      r("family" -> "Apiaceae", "scientific_name" -> "Ammi majus L."),
      r("family" -> "Rosaceae", "scientific_name" -> "Rosa canina L."))
    val rightNum = frag(
      r("0" -> "Apiaceae", "1" -> "Ammi majus L."),
      r("0" -> "Rosaceae", "1" -> "Rosa canina L."))
    assert(mapping(leftSem, Some(rightNum)) == Map("0" -> "family", "1" -> "scientific_name"))

    val leftNum = frag(r("0" -> "lunes", "1" -> "monday"), r("0" -> "martes", "1" -> "tuesday"))
    val rightSem = frag(r("dia" -> "lunes", "day" -> "monday"), r("dia" -> "martes", "day" -> "tuesday"))
    assert(mapping(leftNum, Some(rightSem)) == Map("0" -> "dia", "1" -> "day"))
  }

  test("empty-mapping cases: both semantic / both numeric / no overlap / no right / empty left") {
    assert(mapping(frag(r("family" -> "Apiaceae")), Some(frag(r("family" -> "Apiaceae")))).isEmpty)
    assert(mapping(frag(r("0" -> "Apiaceae")), Some(frag(r("0" -> "Apiaceae")))).isEmpty)
    assert(mapping(
      frag(r("family" -> "Apiaceae"), r("family" -> "Rosaceae")),
      Some(frag(r("0" -> "red"), r("0" -> "blue")))).isEmpty)
    assert(mapping(frag(r("family" -> "Apiaceae")), None).isEmpty)
    assert(mapping(Fragment(Nil, 1), Some(frag(r("0" -> "Apiaceae")))).isEmpty)
  }

  test("partial overlap + threshold parametrization (test_column_aligner_threshold)") {
    val left = frag(r("family" -> "Apiaceae"), r("family" -> "Rosaceae"))
    val right = frag(r("0" -> "Apiaceae")) // jaccard = 1/2
    assert(mapping(left, Some(right), 0.6).isEmpty)
    assert(mapping(left, Some(right), 0.5) == Map("0" -> "family"))
    assert(mapping(left, Some(right), 0.4) == Map("0" -> "family"))
  }

  test("one column matches, the other does not (test_column_aligner_one_col_matches_one_does_not)") {
    val left = frag(
      r("family" -> "Apiaceae", "scientific_name" -> "Ammi majus L."),
      r("family" -> "Rosaceae", "scientific_name" -> "Rosa canina L."))
    val right = frag(
      r("0" -> "Apiaceae", "1" -> "zzz"),
      r("0" -> "Rosaceae", "1" -> "www"))
    assert(mapping(left, Some(right)) == Map("0" -> "family"))
  }

  test("rename_row via the merge-time mapping (test_column_aligner_rename_row_renames_columns)") {
    val left = frag(r("family" -> "Apiaceae", "scientific_name" -> "Ammi majus L."))
    val right = frag(r("0" -> "Apiaceae", "1" -> "Ammi majus L."))
    val m = ColumnsAligner.mergeTimeMapping(left, Some(right), List(jacc()))
    val row = r("0" -> "Rosaceae", "1" -> "Rosa canina L.")
    assert(ColumnsAligner.renameRow(m, row)
      == r("family" -> "Rosaceae", "scientific_name" -> "Rosa canina L."))
    // no-mapping no-op
    val none = ColumnsAligner.mergeTimeMapping(
      frag(r("family" -> "Apiaceae")), Some(frag(r("genus" -> "Ammi"))), List(jacc()))
    assert(ColumnsAligner.renameRow(none, r("family" -> "Rosaceae")) == r("family" -> "Rosaceae"))
  }

  // ---- the 20-species 4-column scenarios -----------------------------------

  test("four columns map exactly at every threshold (test_column_aligner_four_columns_exact)") {
    for (t <- List(0.3, 0.4, 0.5, 0.6))
      assert(mapping(semanticFrag(Species), Some(numericFrag(Species)), t) == FourColumnsMapping, s"t=$t")
  }

  test("four columns with text edits: noisy columns drop at 0.6 (test_column_aligner_four_columns_with_text_edits)") {
    val left = semanticFrag(Species)
    val right = numericFrag(SpeciesWithEdits)
    for (t <- List(0.3, 0.4, 0.5))
      assert(mapping(left, Some(right), t) == FourColumnsMapping, s"t=$t")
    assert(mapping(left, Some(right), 0.6) == Map("1" -> "area", "2" -> "family"))
  }

  test("non-matching column stays unmapped at every threshold (test_column_aligner_four_columns_partial_column_match)") {
    val left = semanticFrag(Species)
    val right = Fragment(Species.zipWithIndex.map { case ((sn, a, _, vn), i) =>
      r("0" -> sn, "1" -> a, "2" -> f"REF$i%04d", "3" -> vn)
    }, 1)
    for (t <- List(0.3, 0.4, 0.5, 0.6))
      assert(mapping(left, Some(right), t)
        == Map("0" -> "scientific_name", "1" -> "area", "3" -> "vernacular_name"), s"t=$t")
  }

  // ---- load-time alias shapes ----------------------------------------------

  test("alias applies semantic-to-semantic and without a right fragment") {
    val left = frag(r("familia" -> "Apiaceae"), r("familia" -> "Rosaceae"))
    val m = ColumnsAligner.loadTimeMapping(left,
      List(new AliasLoadTimeAnalyzer(Vector("familia" -> "family"))))
    assert(m.toMap == Map("familia" -> "family"))
  }

  // ---- append_column_value + collision rename -------------------------------

  test("append_column_value unit matrix (test_append_column_value_*)") {
    assert(ColumnsAligner.appendColumnValue(Cell.Str("hello"), Cell.Str("world")) == Cell.Str("hello. world"))
    assert(ColumnsAligner.appendColumnValue(Cell.Str("hello."), Cell.Str("world")) == Cell.Str("hello. world"))
    assert(ColumnsAligner.appendColumnValue(Cell.Null, Cell.Str("world")) == Cell.Str("world"))
    assert(ColumnsAligner.appendColumnValue(Cell.Str("hello"), Cell.Null) == Cell.Str("hello"))
    assert(ColumnsAligner.appendColumnValue(
      Cell.Multi(List(ValueWithAgreement("a", 2))),
      Cell.Multi(List(ValueWithAgreement("b", 1))))
      == Cell.Multi(List(ValueWithAgreement("a", 2), ValueWithAgreement("b", 1))))
  }

  test("rename into an existing target keeps the target's value FIRST (test_rename_row_appends_*)") {
    val m = Analyzers.emptyMapping
    m("notes") = "description"
    // row order notes-then-description: self-keeping rule puts the target's own value first
    val row = r("notes" -> "extra info", "description" -> "main text")
    assert(ColumnsAligner.renameRow(m, row) == r("description" -> "main text. extra info"))
    val dotted = r("notes" -> "extra info", "description" -> "main text.")
    assert(ColumnsAligner.renameRow(m, dotted) == r("description" -> "main text. extra info"))
    // list-valued cells concatenate
    val lists = RowData(Vector(
      "description" -> Cell.Multi(List(ValueWithAgreement("main text", 2))),
      "notes" -> Cell.Multi(List(ValueWithAgreement("extra info", 1)))))
    assert(ColumnsAligner.renameRow(m, lists) == RowData(Vector(
      "description" -> Cell.Multi(List(
        ValueWithAgreement("main text", 2), ValueWithAgreement("extra info", 1))))))
  }

  // ---- the 50-row sample bound ----------------------------------------------

  test("mapping inspects only the first 50 rows (columns_aligner.py:26)") {
    // value overlap exists ONLY beyond row 50: within the sample, jaccard = 0
    val left = Fragment((1 to 60).toList.map(i => r("family" -> s"L$i")), 1)
    val right = Fragment(
      (1 to 50).toList.map(i => r("0" -> s"R$i")) ++
        (51 to 60).toList.map(i => r("0" -> s"L$i")), 1)
    assert(mapping(left, Some(right), 0.01).isEmpty)
    // move the overlap inside the sample and the mapping appears
    val rightIn = Fragment(
      (1 to 50).toList.map(i => r("0" -> s"L$i")) ++
        (51 to 60).toList.map(i => r("0" -> s"R$i")), 1)
    assert(mapping(left, Some(rightIn), 0.01) == Map("0" -> "family"))
  }
}
