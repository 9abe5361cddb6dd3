package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.JVal._

/** Port of the reference viewer suite
  * (/root/reference/tests/test_table2html.py:1-386): fragment rendering,
  * reserved-column ordering, readers/sources columns, empty-row legend,
  * agreement css classes, rowspan computation, citation rendering, metadata
  * tables, and document structure — same scenarios and assertions.
  */
class Table2HtmlSpec extends AnyFunSuite {
  import Table2Html._

  private def row(cols: (String, Cell)*): RowData = RowData(cols.toVector)
  private def s(v: String): Cell = Cell.Str(v)
  private def frag(page: Int, rows: RowData*): Fragment = Fragment(rows.toList, page)
  private def joined(parts: List[String]): String = parts.mkString("\n")

  test("fragment with no rows") {
    val out = joined(buildFragmentHtml(1, frag(3)))
    assert(out.contains("Table 1, page 3"))
    assert(out.contains("No rows"))
    assert(!out.contains("<table"))
  }

  test("fragment renders header and row") {
    val out = joined(buildFragmentHtml(1,
      frag(1, row("species" -> s("Rosa"), "family" -> s("Rosaceae")))))
    assert(out.contains("<th>species</th>"))
    assert(out.contains("<th>family</th>"))
    assert(out.contains("<td>Rosa</td>"))
    assert(out.contains("<td>Rosaceae</td>"))
  }

  test("fragment: readers_ before sources_, both last") {
    val r = RowData(Vector("species" -> s("Rosa")), sources = Some(List("s1")))
    val out = joined(buildFragmentHtml(1, frag(1, r)))
    val headers = out.split("<th>").drop(1).map(_.split("</th>")(0)).toList
    assert(headers.head == "species")
    assert(headers(headers.size - 2) == "readers_")
    assert(headers.last == "sources_")
  }

  test("fragment: agreement_level_ column shown first") {
    val r = RowData(Vector("species" -> s("Rosa")), agreementLevel = Some(2))
    val out = joined(buildFragmentHtml(1, frag(1, r)))
    val headers = out.split("<th>").drop(1).map(_.split("</th>")(0)).toList
    assert(headers.head == "agreement_level_")
    assert(out.contains("<td class='medium'>2</td>"))
  }

  test("fragment: no agreement_level_ column when absent") {
    val out = joined(buildFragmentHtml(1, frag(1, row("species" -> s("Rosa")))))
    assert(!out.contains("agreement_level_"))
  }

  private def nonCommonFragment = frag(1,
    row("species" -> s("Rosa"), "family" -> s("Rosaceae")),
    row("species" -> s("Mentha"), "note" -> s("fragrant")))

  test("fragment: non-common column appears in header") {
    val out = joined(buildFragmentHtml(1, nonCommonFragment))
    assert(out.contains("<th>species</th>"))
    assert(out.contains("<th>family</th>"))
    assert(out.contains("<th>note</th>"))
  }

  test("fragment: common columns precede non-common ones") {
    val out = joined(buildFragmentHtml(1, nonCommonFragment))
    val headers = out.split("<th>").drop(1).map(_.split("</th>")(0)).toList
    assert(headers.head == "species")
    assert(headers.contains("family"))
    assert(headers.contains("note"))
    assert(headers.indexOf("species") < headers.indexOf("family"))
    assert(headers.indexOf("species") < headers.indexOf("note"))
  }

  test("fragment: rows with missing non-common columns still render") {
    val out = joined(buildFragmentHtml(1, nonCommonFragment))
    assert(out.contains("<td>Rosa</td>"))
    assert(out.contains("<td>Mentha</td>"))
  }

  test("fragment: readers_ column shows reader names") {
    val r = RowData(Vector("species" -> s("Rosa")), sources = Some(List("s1", "s2")))
    val out = joined(buildFragmentHtml(1, frag(1, r),
      Map("s1" -> "pdfplumber", "s2" -> "camelot")))
    assert(out.contains("pdfplumber"))
    assert(out.contains("camelot"))
  }

  test("fragment: readers_ column deduplicates") {
    val r = RowData(Vector("species" -> s("Rosa")), sources = Some(List("s1", "s2")))
    val out = joined(buildFragmentHtml(1, frag(1, r),
      Map("s1" -> "pdfplumber", "s2" -> "pdfplumber")))
    assert(out.contains("<td>pdfplumber</td>"))
  }

  test("fragment: list value joined with comma") {
    val r = row("tags" -> Cell.Multi(List(
      ValueWithAgreement("a", 1), ValueWithAgreement("b", 1), ValueWithAgreement("c", 1))))
    val out = joined(buildFragmentHtml(1, frag(1, r)))
    assert(out.contains("<td>a, b, c</td>"))
  }

  test("fragment: agreement css low") {
    val r = RowData(Vector("x" -> s("v")), agreementLevel = Some(1))
    assert(joined(buildFragmentHtml(1, frag(1, r))).contains("class='low'"))
  }

  test("fragment: agreement css medium") {
    val r = RowData(Vector("x" -> s("v")), agreementLevel = Some(2))
    assert(joined(buildFragmentHtml(1, frag(1, r))).contains("class='medium'"))
  }

  test("fragment: agreement css high") {
    val r = RowData(Vector("x" -> s("v")), agreementLevel = Some(3))
    assert(joined(buildFragmentHtml(1, frag(1, r))).contains("class='high'"))
  }

  test("metadata: scalar fields rendered") {
    val out = joined(buildMetadataHtml(JObj(Vector(
      "tool" -> JStr("paper2table"), "version" -> JStr("1.0")))))
    assert(out.contains("<th>tool</th>"))
    assert(out.contains("<td>paper2table</td>"))
  }

  test("metadata: sources table rendered") {
    val meta = JObj(Vector("sources" -> JArr(Vector(JObj(Vector(
      "uuid" -> JStr("abc"), "reader" -> JStr("pdfplumber"), "path" -> JStr("/tmp/a.pdf")))))))
    val out = joined(buildMetadataHtml(meta))
    assert(out.contains("<h3>Sources</h3>"))
    assert(out.contains("abc"))
    assert(out.contains("/tmp/a.pdf"))
  }

  test("metadata: sources preferred column order") {
    val meta = JObj(Vector("sources" -> JArr(Vector(JObj(Vector(
      "uuid" -> JStr("u1"), "reader" -> JStr("camelot"),
      "path" -> JStr("/p"), "extra" -> JStr("e")))))))
    val out = joined(buildMetadataHtml(meta))
    val headers = out.split("<th>").drop(1).map(_.split("</th>")(0)).toList
    assert(headers.take(3) == List("uuid", "reader", "path"))
  }

  test("metadata: no Sources section without sources key") {
    val out = joined(buildMetadataHtml(JObj(Vector("tool" -> JStr("x")))))
    assert(!out.contains("Sources"))
  }

  private val emptyObj = JObj(Vector.empty)

  test("build_html structure") {
    val out = buildHtml(emptyObj, emptyObj, Nil)
    assert(out.contains("<!DOCTYPE html>"))
    assert(out.contains("<title>Paper2Table Viewer</title>"))
    assert(out.contains("</html>"))
  }

  test("build_html appends the TOC scroll-tracking script (__main__.py:335-362,445)") {
    val out = buildHtml(emptyObj, emptyObj, Nil)
    val scriptAt = out.indexOf("<script>(function () {")
    assert(scriptAt >= 0, "TOC script missing")
    assert(scriptAt > out.indexOf("</main>"))
    assert(out.contains("window.addEventListener('scroll', update, { passive: true });"))
    assert(out.contains("e.a.classList.remove('active')"))
  }

  test("flattened values render via Python str(): numbers normalize, nested reprs") {
    val rows = scala.collection.mutable.ListBuffer.empty[(String, String)]
    flattenDict(JObj(Vector(
      "a" -> JNum("4.50"),
      "b" -> JNum("1e3"),
      "c" -> JNum("42"),
      "lst" -> JArr(Vector(
        JObj(Vector("curator" -> JStr("alice"))),
        JNum("2.0"), JBool(true), JNull)))), "", rows)
    assert(rows.toList == List(
      "a" -> "4.5",
      "b" -> "1000.0",
      "c" -> "42",
      "lst" -> "{'curator': 'alice'}, 2.0, True, None"))
    // Python int normalization of the one non-canonical JSON int literal;
    // str() of a bare list string stays raw (reference semantics), while a
    // string nested inside a dict renders via repr with \xNN escaping
    val more = scala.collection.mutable.ListBuffer.empty[(String, String)]
    flattenDict(JObj(Vector(
      "z" -> JNum("-0"),
      "ctl" -> JArr(Vector(JObj(Vector("k" -> JStr("a\u0000b"))))))), "", more)
    assert(more.toList == List("z" -> "0", "ctl" -> "{'k': 'a\\x00b'}"))
  }

  test("build_html: no metadata section when empty") {
    assert(!buildHtml(emptyObj, emptyObj, Nil).contains("<h2>Metadata</h2>"))
  }

  test("build_html includes paper name and citation") {
    val papers = List("mypaper.tables.json" -> TableDoc(Nil, s("Smith 2020")))
    val out = buildHtml(emptyObj, emptyObj, papers)
    assert(out.contains("mypaper.tables.json"))
    assert(out.contains("Smith 2020"))
  }

  test("is_empty row: true when only meta fields") {
    assert(RowData(Vector.empty, agreementLevel = Some(2), sources = Some(List("s1"))).isEmpty)
  }

  test("is_empty row: true when blank content") {
    assert(RowData(Vector("species" -> s("")), agreementLevel = Some(1)).isEmpty)
  }

  test("is_empty row: false when has content") {
    assert(!RowData(Vector("species" -> s("Rosa")), agreementLevel = Some(1)).isEmpty)
  }

  test("fragment skips empty rows and shows legend") {
    val out = joined(buildFragmentHtml(1, frag(1,
      row("species" -> s("Rosa"), "family" -> s("Rosaceae")),
      row("species" -> s(""), "family" -> s("")),
      row("species" -> s(""), "family" -> s("")))))
    assert(out.contains("Rosa"))
    assert(out.contains("(2 empty rows not shown)"))
  }

  test("fragment with only empty rows renders no table") {
    val out = joined(buildFragmentHtml(1, frag(1,
      row("species" -> s("")), row("species" -> s("")))))
    assert(!out.contains("<table"))
    assert(out.contains("(2 empty rows not shown)"))
  }

  test("agreement_css_class boundaries") {
    assert(agreementCssClass(0) == "low")
    assert(agreementCssClass(1) == "low")
    assert(agreementCssClass(2) == "medium")
    assert(agreementCssClass(3) == "high")
  }

  test("build_data_row simple") {
    val out = joined(buildDataRow(
      row("species" -> s("Rosa"), "family" -> s("Rosaceae")), List("species", "family")))
    assert(out.contains("<td>Rosa</td>"))
    assert(out.contains("<td>Rosaceae</td>"))
  }

  test("build_data_row applies css class") {
    val r = RowData(Vector("x" -> s("v")), agreementLevel = Some(2))
    val out = joined(buildDataRow(r, List("x", "agreement_level_")))
    assert(out.contains("class='medium'"))
  }

  test("build_data_row readers column") {
    val r = RowData(Vector("species" -> s("Rosa")), sources = Some(List("s1", "s2")))
    val out = joined(buildDataRow(r, List("species", "readers_"),
      Map("s1" -> "pdfplumber", "s2" -> "camelot")))
    assert(out.contains("pdfplumber"))
    assert(out.contains("camelot"))
  }

  test("build_data_row list value") {
    val r = row("tags" -> Cell.Multi(List(
      ValueWithAgreement("a", 1), ValueWithAgreement("b", 1), ValueWithAgreement("c", 1))))
    val out = joined(buildDataRow(r, List("tags")))
    assert(out.contains("<td>a, b, c</td>"))
  }

  test("css contains body rule") {
    assert(buildCss().mkString("\n").contains("font-family: Arial"))
  }

  test("css contains agreement classes") {
    val css = buildCss().mkString("\n")
    assert(css.contains(".low { background-color: #fdd; }"))
    assert(css.contains(".medium { background-color: #ffd; }"))
    assert(css.contains(".high { background-color: #dfd; }"))
  }

  test("render_citation null") {
    assert(renderCitation(Cell.Null) == "")
  }

  test("render_citation string") {
    assert(renderCitation(s("Smith 2020")) == "Smith 2020")
  }

  test("render_citation list") {
    val c = Cell.Multi(List(
      ValueWithAgreement("Smith 2020", 2), ValueWithAgreement("Smith et al.", 1)))
    assert(renderCitation(c) == "Smith 2020, Smith et al.")
  }

  private def rn(idx: Option[Int], cols: (String, Cell)*): RowData =
    RowData(cols.toVector, rowIdx = idx)

  test("compute_rowspans: no row numbers") {
    val rows = List(row("family" -> s("Apiaceae")), row("family" -> s("Apiaceae")))
    assert(computeRowspans(rows, List("family")) ==
      Vector(Map("family" -> 1), Map("family" -> 1)))
  }

  test("compute_rowspans: different row numbers") {
    val rows = List(rn(Some(0), "family" -> s("Apiaceae")), rn(Some(1), "family" -> s("Apiaceae")))
    assert(computeRowspans(rows, List("family")) ==
      Vector(Map("family" -> 1), Map("family" -> 1)))
  }

  test("compute_rowspans: same row same value") {
    val rows = List(rn(Some(0), "family" -> s("Apiaceae")), rn(Some(0), "family" -> s("Apiaceae")))
    assert(computeRowspans(rows, List("family")) ==
      Vector(Map("family" -> 2), Map("family" -> 0)))
  }

  test("compute_rowspans: same row, per-column values differ") {
    val rows = List(
      rn(Some(0), "family" -> s("Apiaceae"), "species" -> s("Ammi majus")),
      rn(Some(0), "family" -> s("Apiaceae"), "species" -> s("Carum carvi")))
    assert(computeRowspans(rows, List("family", "species")) == Vector(
      Map("family" -> 2, "species" -> 1),
      Map("family" -> 0, "species" -> 1)))
  }

  test("compute_rowspans: three rows same row number") {
    val rows = List(
      rn(Some(0), "family" -> s("Apiaceae")),
      rn(Some(0), "family" -> s("Apiaceae")),
      rn(Some(0), "family" -> s("Apiaceae")))
    assert(computeRowspans(rows, List("family")) == Vector(
      Map("family" -> 3), Map("family" -> 0), Map("family" -> 0)))
  }

  test("fragment html merges the shared column value") {
    val out = joined(buildFragmentHtml(1, frag(1,
      rn(Some(0), "family" -> s("Apiaceae"), "species" -> s("Ammi majus")),
      rn(Some(0), "family" -> s("Apiaceae"), "species" -> s("Carum carvi")))))
    assert(out.contains("rowspan='2'"))
    assert(!out.contains("<td>Apiaceae</td>"))
    assert(out.contains("<td rowspan='2'>Apiaceae</td>"))
    assert(out.contains("<td>Ammi majus</td>"))
    assert(out.contains("<td>Carum carvi</td>"))
  }

  test("compute_rowspans never merges the agreement_level_ column") {
    val rows = List(
      RowData(Vector("family" -> s("Apiaceae")), agreementLevel = Some(2), rowIdx = Some(0)),
      RowData(Vector("family" -> s("Apiaceae")), agreementLevel = Some(2), rowIdx = Some(0)))
    assert(computeRowspans(rows, List("agreement_level_", "family")) == Vector(
      Map("agreement_level_" -> 1, "family" -> 2),
      Map("agreement_level_" -> 1, "family" -> 0)))
  }

  test("fragment html: no merge without row numbers") {
    val out = joined(buildFragmentHtml(1, frag(1,
      row("family" -> s("Apiaceae"), "species" -> s("Ammi majus")),
      row("family" -> s("Apiaceae"), "species" -> s("Carum carvi")))))
    assert(!out.contains("rowspan"))
  }
}
