package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.JVal._
import graft.core.Text.ColType._

/** Port of the reference schema-postprocessor suite
  * (/root/reference/tests/test_schema.py:1-321): filter/order/coerce
  * semantics, empty-column/table drops, doc clone field preservation, and
  * curation detection. Same scenarios, same assertions, over the engine's
  * TableDoc model.
  */
class SchemaPostProcessorSpec extends AnyFunSuite {

  private def row(cols: (String, Cell)*): RowData = RowData(cols.toVector)
  private def s(v: String): Cell = Cell.Str(v)

  private def wrap(rows: List[RowData], page: Int = 1, citation: Cell = Cell.Null): TableDoc =
    TableDoc(tables = List(TableData(List(Fragment(rows, page)))), citation = citation)

  private def wrapTwoTables(rows1: List[RowData], rows2: List[RowData]): TableDoc =
    TableDoc(tables = List(
      TableData(List(Fragment(rows1, 1))),
      TableData(List(Fragment(rows2, 2)))))

  private def rowsOf(doc: TableDoc, table: Int = 0, fragment: Int = 0): List[RowData] =
    doc.tables(table).fragments(fragment).rows

  // --- filter_columns (test_schema.py:43-83) ---

  private val FilterSchema = ColumnSchema(Vector("name" -> TStr, "species" -> TStr))
  private def filterProcessor = new SchemaPostProcessor(FilterSchema, filterColumns = true)

  test("filter keeps table with matching column") {
    val result = filterProcessor.postprocess(wrap(List(row("name" -> s("foo")))))
    assert(result.tables.size == 1)
  }

  test("filter drops table with no matching column") {
    val result = filterProcessor.postprocess(wrap(List(row("color" -> s("red"), "size" -> s("big")))))
    assert(result.tables.isEmpty)
  }

  test("filter keeps table with partial match") {
    val result = filterProcessor.postprocess(
      wrap(List(row("species" -> s("Canis lupus"), "habitat" -> s("forest")))))
    assert(result.tables.size == 1)
  }

  test("filter mixed tables") {
    val doc = wrapTwoTables(List(row("name" -> s("Rosa"))), List(row("color" -> s("red"))))
    val result = filterProcessor.postprocess(doc)
    assert(result.tables.size == 1)
    assert(rowsOf(result).head.get("name").contains(s("Rosa")))
  }

  test("filter preserves citation") {
    val result = filterProcessor.postprocess(
      wrap(List(row("name" -> s("x"))), citation = s("some citation")))
    assert(result.citation == s("some citation"))
  }

  test("filter: all tables dropped returns empty") {
    val doc = wrapTwoTables(List(row("color" -> s("red"))), List(row("size" -> s("big"))))
    assert(filterProcessor.postprocess(doc).tables.isEmpty)
  }

  // --- order_columns (test_schema.py:86-127) ---

  private val OrderSchema = ColumnSchema(Vector("name" -> TStr, "species" -> TStr, "family" -> TStr))
  private def orderProcessor = new SchemaPostProcessor(OrderSchema, orderColumns = true)

  test("order: schema columns come first") {
    val result = orderProcessor.postprocess(
      wrap(List(row("habitat" -> s("forest"), "name" -> s("Rosa"), "family" -> s("Rosaceae")))))
    val cols = rowsOf(result).head.columnNames
    assert(cols.indexOf("name") < cols.indexOf("habitat"))
    assert(cols.indexOf("family") < cols.indexOf("habitat"))
  }

  test("order: schema order respected") {
    val result = orderProcessor.postprocess(
      wrap(List(row("family" -> s("Rosaceae"), "species" -> s("Rosa canina"), "name" -> s("Dog rose")))))
    assert(rowsOf(result).head.columnNames.take(3) == Vector("name", "species", "family"))
  }

  test("order: missing schema columns not inserted") {
    val result = orderProcessor.postprocess(wrap(List(row("name" -> s("Rosa")))))
    assert(rowsOf(result).head.columnNames == Vector("name"))
  }

  test("order preserves metadata") {
    val r = RowData(Vector("name" -> s("Rosa")), agreementLevel = Some(3), sources = Some(List("uuid1")))
    val result = orderProcessor.postprocess(wrap(List(r)))
    val out = rowsOf(result).head
    assert(out.agreementLevel.contains(3))
    assert(out.sources.contains(List("uuid1")))
  }

  test("order preserves row number") {
    val r = RowData(Vector("name" -> s("Rosa")), rowIdx = Some(7))
    val result = orderProcessor.postprocess(wrap(List(r)))
    assert(rowsOf(result).head.rowIdx.contains(7))
  }

  // --- coerce_types (test_schema.py:130-230) ---

  private val CoerceSchema = ColumnSchema(Vector(
    "year" -> TInt, "length" -> TFloat, "active" -> TBool, "label" -> TStr))
  private def coerceProcessor = new SchemaPostProcessor(CoerceSchema, coerceTypes = true)

  private def coerceCols(doc: TableDoc): Map[String, Cell] =
    rowsOf(coerceProcessor.postprocess(doc)).head.columns.toMap

  test("coerce types: int") {
    assert(coerceCols(wrap(List(row("year" -> s("2020.0")))))("year") == s("2020"))
  }

  test("coerce types: float") {
    assert(coerceCols(wrap(List(row("length" -> s("3")))))("length") == s("3.0"))
  }

  test("coerce types: bool true") {
    assert(coerceCols(wrap(List(row("active" -> s("yes")))))("active") == s("True"))
  }

  test("coerce types: bool false") {
    assert(coerceCols(wrap(List(row("active" -> s("no")))))("active") == s("False"))
  }

  test("coerce types: str is a no-op") {
    assert(coerceCols(wrap(List(row("label" -> s("hello")))))("label") == s("hello"))
  }

  test("coerce types: unconvertible left unchanged") {
    assert(coerceCols(wrap(List(row("year" -> s("N/A")))))("year") == s("N/A"))
  }

  test("coerce types: non-schema column untouched") {
    assert(coerceCols(wrap(List(row("color" -> s("red")))))("color") == s("red"))
  }

  test("coerce preserves row number") {
    val r = RowData(Vector("year" -> s("2020")), rowIdx = Some(3))
    val result = coerceProcessor.postprocess(wrap(List(r)))
    assert(rowsOf(result).head.rowIdx.contains(3))
  }

  test("coerce types: value-with-agreement coerces each value, keeps levels") {
    val cell = Cell.Multi(List(
      ValueWithAgreement("2020.0", 2),
      ValueWithAgreement("bad", 1)))
    val out = coerceCols(wrap(List(row("year" -> cell))))("year")
    out match {
      case Cell.Multi(vs) =>
        assert(vs.map(_.value) == List("2020", "bad"))
        assert(vs.head.agreementLevel == 2)
      case other => fail(s"expected Multi, got $other")
    }
  }

  test("coerce types preserves metadata") {
    val r = RowData(Vector("year" -> s("2020")), agreementLevel = Some(2), sources = Some(List("u1")))
    val out = rowsOf(coerceProcessor.postprocess(wrap(List(r)))).head
    assert(out.agreementLevel.contains(2))
    assert(out.sources.contains(List("u1")))
  }

  test("coerce types: null column value left unchanged") {
    assert(coerceCols(wrap(List(row("year" -> Cell.Null))))("year") == Cell.Null)
  }

  // --- drop-empty postprocessors (test_schema.py:233-245, 307-321) ---

  test("drop_empty_columns removes an all-null column") {
    val doc = wrap(List(
      row("0" -> Cell.Null, "family" -> s("Apiaceae")),
      row("0" -> Cell.Null, "family" -> s("Fabaceae"))))
    val result = DropEmptyColumnsPostProcessor.postprocess(doc)
    assert(rowsOf(result) == List(row("family" -> s("Apiaceae")), row("family" -> s("Fabaceae"))))
  }

  test("drop_empty_tables removes the empty table") {
    val doc = wrapTwoTables(List(row("family" -> s("Apiaceae"))), List(row("family" -> s(""))))
    val result = DropEmptyTablesPostProcessor.postprocess(doc)
    assert(result.tables.size == 1)
    assert(rowsOf(result) == List(row("family" -> s("Apiaceae"))))
  }

  // --- doc clone semantics (test_schema.py:248-287); TableDoc.copy is the
  // engine's clone — assert the same override/preserve contract ---

  test("clone overrides tables and preserves other fields") {
    val originalTables = List(TableData(List(Fragment(List(row("name" -> s("Rosa"))), 1))))
    val newTables = List(TableData(List(Fragment(List(row("name" -> s("Canis lupus"))), 2))))
    val meta = JObj(Vector("filename" -> JStr("paper.pdf")))
    val original = TableDoc(originalTables, s("some citation"), Some(meta), Some("abc-123"))
    val result = original.copy(tables = newTables)
    assert(result.tables == newTables)
    assert(result.citation == s("some citation"))
    assert(result.metadata.contains(meta))
    assert(result.uuid.contains("abc-123"))
  }

  test("clone overrides citation and preserves other fields") {
    val tables = List(TableData(List(Fragment(List(row("name" -> s("Rosa"))), 1))))
    val original = TableDoc(tables, s("original citation"), None, Some("xyz-456"))
    val result = original.copy(citation = s("updated citation"))
    assert(result.tables == tables)
    assert(result.citation == s("updated citation"))
    assert(result.uuid.contains("xyz-456"))
  }

  test("clone with no overrides returns an equal instance") {
    val tables = List(TableData(List(Fragment(List(row("name" -> s("Rosa"))), 1))))
    val original = TableDoc(tables, s("citation"), None, Some("abc"))
    assert(original.copy() == original)
  }

  // --- has_curations (test_schema.py:290-304) ---

  test("has_curations false when no metadata") {
    assert(!TableDoc(Nil, s("")).hasCurations)
  }

  test("has_curations true when curations present") {
    val meta = JObj(Vector(
      "filename" -> JNull,
      "curations" -> JArr(Vector(JObj(Vector(
        "curator" -> JStr("alice"), "description" -> JStr("reviewed")))))))
    assert(TableDoc(Nil, s(""), Some(meta)).hasCurations)
  }

  test("has_curations false when curations list is empty") {
    val meta = JObj(Vector("filename" -> JNull, "curations" -> JArr(Vector.empty)))
    assert(!TableDoc(Nil, s(""), Some(meta)).hasCurations)
  }
}
