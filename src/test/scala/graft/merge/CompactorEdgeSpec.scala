package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** U2/U3 compactor + exploder edge cases ported from the reference's
  * tests/test_tablesfile_transformer.py (semantics, not code).
  */
class CompactorEdgeSpec extends AnyFunSuite {

  private def r(vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) })

  private def t(page: Int, rows: RowData*): TableData =
    TableData(List(Fragment(rows.toList, page)))

  private def doc(tables: TableData*): TableDoc = TableDoc(tables.toList)

  private def pagesOf(d: TableDoc): List[List[Int]] = d.tables.map(_.fragments.map(_.page))

  test("null transformer returns the doc unchanged") {
    val d = doc(t(1, r("family" -> "Apiaceae")))
    assert(NullTablesFileTransformer.transform(d) == d)
  }

  test("safe compactor merges consecutive tables with identical semantic columns on adjacent pages") {
    val d = doc(
      t(1, r("family" -> "Apiaceae")),
      t(2, r("family" -> "Rosaceae")))
    val out = SafeConsecutiveFragmentsCompactor.transform(d)
    assert(out.tables.size == 1)
    assert(pagesOf(out) == List(List(1, 2)))
  }

  test("safe compactor: different semantic columns / non-correlative pages / numeric columns stay separate") {
    assert(SafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("family" -> "Apiaceae")),
      t(2, r("genus" -> "Ammi")))).tables.size == 2)
    assert(SafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("family" -> "Apiaceae")),
      t(3, r("family" -> "Rosaceae")))).tables.size == 2)
    assert(SafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("0" -> "Apiaceae")),
      t(2, r("0" -> "Rosaceae")))).tables.size == 2)
  }

  test("same-page tables merge when columns match, not otherwise") {
    assert(SafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("family" -> "Apiaceae")),
      t(1, r("family" -> "Rosaceae")))).tables.size == 1)
    assert(SafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("family" -> "Apiaceae")),
      t(1, r("genus" -> "Ammi")))).tables.size == 2)
  }

  test("unsafe compactor merges numeric tables of same column count; different counts stay; page gaps allowed") {
    assert(UnsafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("0" -> "a", "1" -> "b")),
      t(2, r("0" -> "c", "1" -> "d")))).tables.size == 1)
    assert(UnsafeConsecutiveFragmentsCompactor.transform(doc(
      t(1, r("0" -> "a", "1" -> "b")),
      t(2, r("0" -> "c")))).tables.size == 2)
    // semantic tables on NON-consecutive pages: unsafe merges, safe does not
    val gap = doc(t(1, r("family" -> "Apiaceae")), t(5, r("family" -> "Rosaceae")))
    assert(UnsafeConsecutiveFragmentsCompactor.transform(gap).tables.size == 1)
    assert(SafeConsecutiveFragmentsCompactor.transform(gap).tables.size == 2)
  }

  test("three consecutive matching tables fold into one; a non-matching tail stays separate") {
    val three = doc(
      t(1, r("family" -> "A")), t(2, r("family" -> "B")), t(3, r("family" -> "C")))
    val out = SafeConsecutiveFragmentsCompactor.transform(three)
    assert(out.tables.size == 1)
    assert(pagesOf(out) == List(List(1, 2, 3)))

    val mixed = doc(
      t(1, r("family" -> "A")), t(2, r("family" -> "B")), t(3, r("genus" -> "G")))
    val out2 = SafeConsecutiveFragmentsCompactor.transform(mixed)
    assert(out2.tables.size == 2)
    assert(pagesOf(out2) == List(List(1, 2), List(3)))
  }

  test("empty fragment lists do not crash and pass through") {
    val d = doc(TableData(Nil), t(1, r("family" -> "A")))
    val out = SafeConsecutiveFragmentsCompactor.transform(d)
    assert(out.tables.size == 2)
  }

  test("exploder: every fragment becomes its own rows-form table (test_exploder_*)") {
    val d = doc(
      TableData(List(Fragment(List(r("a" -> "1")), 1), Fragment(List(r("a" -> "2")), 2))),
      t(3, r("b" -> "3")))
    val out = FragmentsExploder.transform(d)
    assert(out.tables.size == 3)
    assert(out.tables.forall(_.rowsForm))
    assert(out.tables.forall(_.fragments.size == 1))
    assert(pagesOf(out) == List(List(1), List(2), List(3)))
  }
}
