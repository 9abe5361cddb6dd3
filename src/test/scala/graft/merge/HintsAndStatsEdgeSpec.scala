package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.stats.Stats

/** A3 hints analyzer + G5/G6 stats edge cases ported from the reference's
  * tests/test_analyzers.py:615-740 and tests/test_stats.py.
  */
class HintsAndStatsEdgeSpec extends AnyFunSuite {

  private def r(vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) })

  private def hints(hs: String*) = new HintsLoadTimeAnalyzer(hs.toList)

  // ---- A3 HintsLoadTimeAnalyzer (safe mode) ------------------------------

  test("hints: empty when no non-semantic columns (safe mode)") {
    assert(hints("species", "family")
      .buildMapping(List("species", "family"), List(r("species" -> "species", "family" -> "family")))
      .isEmpty)
  }

  test("hints: empty when first-row values not in hints") {
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(r("0" -> "Ammi majus", "1" -> "Apiaceae")))
      .isEmpty)
  }

  test("hints: ANY matching value renames ALL candidate columns to first-row values") {
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(r("0" -> "species", "1" -> "Apiaceae")))
      .toMap == Map("0" -> "species", "1" -> "apiaceae"))
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(
        r("0" -> "species", "1" -> "family"),
        r("0" -> "Ammi majus", "1" -> "Apiaceae")))
      .toMap == Map("0" -> "species", "1" -> "family"))
  }

  test("hints: first-row values normalize before comparing (case, spaces, accents)") {
    assert(hints("scientific_name", "family")
      .buildMapping(List("0", "1"), List(r("0" -> "Scientific Name", "1" -> "Family")))
      .toMap == Map("0" -> "scientific_name", "1" -> "family"))
    assert(hints("scientific_name")
      .buildMapping(List("1"), List(r("1" -> "Scientific name")))
      .toMap == Map("1" -> "scientific_name"))
    assert(hints("preparacion")
      .buildMapping(List("0"), List(r("0" -> "Preparación")))
      .toMap == Map("0" -> "preparacion"))
  }

  test("hints: empty rows before the header row are skipped") {
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(
        r("0" -> "", "1" -> ""),
        r("0" -> "", "1" -> ""),
        r("0" -> "species", "1" -> "family")))
      .toMap == Map("0" -> "species", "1" -> "family"))
  }

  test("hints: only non-empty header cells map; non-hint values still rename") {
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(r("0" -> "", "1" -> ""), r("0" -> "species", "1" -> "")))
      .toMap == Map("0" -> "species"))
    assert(hints("species", "family")
      .buildMapping(List("0", "1"), List(r("0" -> "", "1" -> ""), r("0" -> "species", "1" -> "foo")))
      .toMap == Map("0" -> "species", "1" -> "foo"))
  }

  test("hints: a single hint match renames every candidate column") {
    assert(hints("family")
      .buildMapping(List("0", "1", "2", "3"), List(
        r("0" -> "family", "1" -> "Scientific name", "2" -> "Species", "3" -> "Notes")))
      .toMap == Map("0" -> "family", "1" -> "scientific_name", "2" -> "species", "3" -> "notes"))
  }

  test("hints: unsafe mode also renames semantic-named columns") {
    val row = r("misnamed" -> "species", "0" -> "family")
    // safe: the hint trigger lives in the EXCLUDED semantic column, so the
    // non-semantic candidate's value ("family" ∉ hints) never triggers
    assert(new HintsLoadTimeAnalyzer(List("species"), safe = true)
      .buildMapping(List("misnamed", "0"), List(row)).isEmpty)
    // unsafe: semantic columns are candidates too; trigger fires, ALL rename
    assert(new HintsLoadTimeAnalyzer(List("species"), safe = false)
      .buildMapping(List("misnamed", "0"), List(row)).toMap
      == Map("misnamed" -> "species", "0" -> "family"))
  }

  // ---- G5 per-paper stats (test_stats.py) --------------------------------

  private def doc(tables: TableData*): TableDoc = TableDoc(tables.toList)
  private def stat(d: TableDoc) = Stats.paperStats("p", d)

  test("empty paper stats are all zero (test_empty_paper)") {
    val s = stat(doc())
    assert((s.tables, s.fragments, s.rows, s.columns, s.rows_with_agreement) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("one table, one row (test_paper_with_one_table_one_row)") {
    val s = stat(doc(TableData(List(Fragment(List(r("family" -> "Apiaceae")), 1)))))
    assert((s.tables, s.fragments, s.rows, s.columns, s.rows_with_agreement) == ((1L, 1L, 1L, 1L, 0L)))
  }

  test("agreement levels: only level > 1 counts (test_paper_with_agreement_levels)") {
    val rows = List(
      r("family" -> "Apiaceae").copy(agreementLevel = Some(0)),
      r("family" -> "Rosaceae").copy(agreementLevel = Some(2)),
      r("family" -> "Lamiaceae").copy(agreementLevel = Some(3)))
    val s = stat(doc(TableData(List(Fragment(rows, 1)))))
    assert(s.rows == 3 && s.rows_with_agreement == 2)
  }

  test("multiple tables and multi-fragment tables count separately") {
    val s = stat(doc(
      TableData(List(Fragment(List(r("family" -> "Apiaceae"), r("family" -> "Rosaceae")), 1))),
      TableData(List(Fragment(List(r("family" -> "Lamiaceae").copy(agreementLevel = Some(2))), 2)))))
    assert((s.tables, s.fragments, s.rows, s.columns, s.rows_with_agreement) == ((2L, 2L, 3L, 1L, 1L)))

    val mf = stat(doc(TableData(List(
      Fragment(List(r("family" -> "Apiaceae")), 1),
      Fragment(List(r("family" -> "Rosaceae")), 2)))))
    assert((mf.tables, mf.fragments, mf.rows) == ((1L, 2L, 2L)))
  }

  test("columns count unique names across fragments (test_columns_counts_unique_across_fragments)") {
    val s = stat(doc(
      TableData(List(Fragment(List(r("family" -> "Apiaceae", "genus" -> "Ammi")), 1))),
      TableData(List(Fragment(List(r("family" -> "Rosaceae", "color" -> "red")), 2)))))
    assert(s.columns == 3)
  }

  test("unique_rows: distinct row_ per table, summed (test_unique_rows_*)") {
    def rw(f: String, idx: Int) = r("family" -> f).copy(rowIdx = Some(idx))
    // no row_ attribute -> 0
    assert(stat(doc(TableData(List(Fragment(List(r("family" -> "A"), r("family" -> "B")), 1))))).unique_rows == 0)
    // single table {1,1,2,2,2} -> 2
    assert(stat(doc(TableData(List(Fragment(List(
      rw("A", 1), rw("B", 1), rw("C", 2), rw("D", 2), rw("E", 2)), 1))))).unique_rows == 2)
    // two tables: 2 + 4 = 6
    assert(stat(doc(
      TableData(List(Fragment(List(rw("A", 1), rw("B", 1), rw("C", 2), rw("D", 2), rw("E", 2)), 1))),
      TableData(List(Fragment(List(rw("P", 1), rw("Q", 2), rw("R", 3), rw("S", 4)), 2))))).unique_rows == 6)
    // across fragments of ONE table: {1,2} ∪ {2,3} -> 3
    assert(stat(doc(TableData(List(
      Fragment(List(rw("A", 1), rw("B", 2)), 1),
      Fragment(List(rw("C", 2), rw("D", 3)), 2))))).unique_rows == 3)
  }

  // ---- G6 shared values (test_stats.py:372-470) ---------------------------

  test("row_value_strings variants (test_row_value_strings_*)") {
    assert(Stats.rowValueStrings(r("family" -> "Apiaceae", "genus" -> "Ammi"))
      == Set(("family", "Apiaceae"), ("genus", "Ammi")))
    assert(Stats.rowValueStrings(RowData(Vector(
      "family" -> Cell.Multi(List(ValueWithAgreement("Apiaceae", 2))))))
      == Set(("family", "Apiaceae")))
    assert(Stats.rowValueStrings(r("family" -> "", "genus" -> "Ammi")) == Set(("genus", "Ammi")))
    assert(Stats.rowValueStrings(RowData(Vector("family" -> Cell.Null, "genus" -> Cell.Str("Ammi"))))
      == Set(("genus", "Ammi")))
  }

  test("infer_type parity: bool is true/false ONLY; int via CPython int(); float fallback (tablestats __main__.py:55-70)") {
    assert(Stats.inferColumnType("true") == "bool")
    assert(Stats.inferColumnType(" FALSE ") == "bool")
    assert(Stats.inferColumnType("yes") == "str")   // NOT bool in the reference
    assert(Stats.inferColumnType("0") == "int")     // NOT bool in the reference
    assert(Stats.inferColumnType("1") == "int")
    assert(Stats.inferColumnType(" 45 ") == "int")  // int() on the stripped value
    assert(Stats.inferColumnType("+5") == "int")
    assert(Stats.inferColumnType("1_0") == "int")   // CPython underscore literals
    assert(Stats.inferColumnType("45.2") == "float")
    assert(Stats.inferColumnType("1e3") == "float") // int() rejects, float() accepts
    assert(Stats.inferColumnType("nan") == "float")
    assert(Stats.inferColumnType("abc") == "str")
    assert(Stats.inferColumnType("") == "str")
    assert(Stats.inferColumnType("1_") == "str")    // trailing underscore is invalid
    assert(Stats.inferColumnType("١٢٣") == "int")   // CPython int() takes any Nd digits
    assert(Stats.inferColumnType("１２３") == "int") // fullwidth digits too
  }

  test("count_shared_values: spec example / all shared / none shared") {
    def rw(v: String, idx: Int) = r("family" -> v).copy(rowIdx = Some(idx))
    def counts(rows: RowData*) =
      Stats.countSharedValues(List(TableData(List(Fragment(rows.toList, 1)))))
    assert(counts(rw("v 1", 1), rw("v 2", 1), rw("v 3", 2), rw("v 3", 2)) == ((4L, 2L)))
    assert(counts(rw("Apiaceae", 1), rw("Apiaceae", 1), rw("Rosaceae", 2), rw("Rosaceae", 2)) == ((4L, 4L)))
    assert(counts(rw("Apiaceae", 1), rw("Rosaceae", 1), rw("Lamiaceae", 2), rw("Asteraceae", 2)) == ((4L, 0L)))
  }
}
