package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** K5 html viewer semantics (reference table2html __main__.py:175-214):
  * rowspan compaction over consecutive same-row_ groups, agreement color
  * classes, escaping. Complements MergeExtrasSpec's smoke coverage.
  */
class HtmlReportSpec extends AnyFunSuite {

  private def r(idx: Option[Int], agreement: Option[Int], vals: (String, String)*): RowData =
    RowData(vals.toVector.map { case (k, v) => (k, Cell.Str(v): Cell) },
      agreementLevel = agreement, rowIdx = idx)

  test("rowGroups: consecutive same row_ group; null row_ never groups; gaps split") {
    val a = r(Some(1), None, "x" -> "a")
    val b = r(Some(1), None, "x" -> "b")
    val c = r(Some(2), None, "x" -> "c")
    val d = r(None, None, "x" -> "d")
    val e = r(None, None, "x" -> "e")
    assert(HtmlReport.rowGroups(List(a, b, c)) == List(List(a, b), List(c)))
    // null row_ rows stay solo even when adjacent
    assert(HtmlReport.rowGroups(List(d, e)) == List(List(d), List(e)))
    // same row_ but not consecutive -> separate groups
    assert(HtmlReport.rowGroups(List(a, c, b)) == List(List(a), List(c), List(b)))
    assert(HtmlReport.rowGroups(Nil).isEmpty)
  }

  test("render: shared group value gets rowspan, differing values render per row") {
    val doc = TableDoc(List(TableData(List(Fragment(List(
      r(Some(0), Some(2), "region" -> "North", "count" -> "1"),
      r(Some(0), Some(1), "region" -> "North", "count" -> "2")), 1)))))
    val html = HtmlReport.render("doc-1", doc)
    assert(html.contains("""<td rowspan="2">North</td>"""))
    // rowspan'd cell appears once; per-row counts appear separately
    assert(html.split("""rowspan="2"""").length - 1 == 1)
    assert(html.contains("<td>1</td>") && html.contains("<td>2</td>"))
  }

  test("render: agreement classes per row, capped at 5") {
    val doc = TableDoc(List(TableData(List(Fragment(List(
      r(Some(0), Some(1), "x" -> "a"),
      r(Some(1), Some(3), "x" -> "b"),
      r(Some(2), Some(9), "x" -> "c")), 1)))))
    val html = HtmlReport.render("doc-1", doc)
    assert(html.contains("""class="agreement-1""""))
    assert(html.contains("""class="agreement-3""""))
    assert(html.contains("""class="agreement-5"""")) // capped
    assert(!html.contains("agreement-9"))
  }

  test("render: markup in cells and doc ids is escaped; TOC lists every table") {
    val doc = TableDoc(
      List(
        TableData(List(Fragment(List(r(Some(0), None, "x" -> "<script>alert(1)</script> & co")), 1))),
        TableData(List(Fragment(List(r(Some(0), None, "y" -> "ok")), 2)))),
      citation = Cell.Str("Cite <b>me</b>"))
    val html = HtmlReport.render("<doc & id>", doc)
    assert(!html.contains("<script>alert"))
    assert(html.contains("&lt;script&gt;alert(1)&lt;/script&gt; &amp; co"))
    assert(html.contains("&lt;doc &amp; id&gt;"))
    assert(html.contains("Cite &lt;b&gt;me&lt;/b&gt;"))
    assert(html.contains("""<a href="#table-0">Table 1</a>"""))
    assert(html.contains("""<a href="#table-1">Table 2</a>"""))
  }

  test("render: multi-value cells show value (agreement) pairs") {
    val doc = TableDoc(List(TableData(List(Fragment(List(
      RowData(Vector("x" -> Cell.Multi(List(
        ValueWithAgreement("alpha", 2), ValueWithAgreement("beta", 1)))), rowIdx = Some(0))), 1)))))
    val html = HtmlReport.render("d", doc)
    assert(html.contains("alpha (2) | beta (1)"))
  }
}
