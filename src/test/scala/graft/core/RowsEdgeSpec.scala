package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's Row value-semantics suite
  * (/root/reference/tests/test_rows.py:1-151): normalize_value sentinel/
  * dash/cid/control-char rules, is_empty_value, and row emptiness with
  * metadata keys ignored.
  */
class RowsEdgeSpec extends AnyFunSuite {

  private def norm(s: String): String = Text.normalizeColumnValue(s)

  test("normalize_value: no-data sentinels map to empty") {
    assert(norm("no data") == "")
    assert(norm("No Data") == "")
    assert(norm("  no  data  ") == "")
    assert(norm("None") == "")
  }

  test("normalize_value: lowercases, collapses whitespace, strips edges") {
    assert(norm("Perez et al. 2020") == "perez et al. 2020")
    assert(norm("Perez  et   al.") == "perez et al.")
    assert(norm("  Perez 2020  ") == "perez 2020")
    assert(norm("Apiaceae") == "apiaceae")
  }

  test("normalize_value: dash family folds to hyphen") {
    assert(norm("Perez–Vílchez 2020") == "perez-vílchez 2020") // en dash
    assert(norm("Perez—Vílchez 2020") == "perez-vílchez 2020") // em dash
    assert(norm("2–5") == "2-5")
    assert(norm("Jan—Feb") == "jan-feb")
    assert(norm("10‒20") == "10-20")                           // figure dash
    assert(norm("A―B") == "a-b")                               // horizontal bar
    assert(norm("−5") == "-5")                                 // minus sign
    assert(norm("A‐B") == "a-b")                               // hyphen
    assert(norm("A‑B") == "a-b")                               // non-breaking hyphen
  }

  test("normalize_value: strips replacement and control characters") {
    assert(norm("hello�world") == "helloworld")
    assert(norm("hello\u0000world\u001fend") == "helloworldend")
    assert(norm("Apiaceae�") == "apiaceae")
  }

  test("normalize_value: (cid:N) repaired inside latin-1, dropped outside") {
    assert(norm("(cid:237)") == "í")
    assert(norm("L(cid:243)pez") == "lópez")
    assert(norm("(cid:42)") == "")
    assert(norm("hello (cid:7) world") == "hello world")
  }

  test("is_empty_value semantics") {
    assert(Cell.Str("no data").isEmptyValue)
    assert(Cell.Str("No Data").isEmptyValue)
    assert(Cell.Null.isEmptyValue)
    assert(Cell.Str("").isEmptyValue)
    assert(Cell.Str("  \t\n").isEmptyValue)
    assert(!Cell.Str("hello").isEmptyValue)
  }

  test("row emptiness: all-empty, whitespace, metadata ignored, data present") {
    assert(RowData(Vector("family" -> Cell.Str(""), "scientific_name" -> Cell.Null)).isEmpty)
    assert(RowData(Vector("family" -> Cell.Str("  "), "scientific_name" -> Cell.Str("\t"))).isEmpty)
    // reserved fields live OUTSIDE columns in this model, mirroring the
    // reference's metadata-key exclusion (schema.py _SPECIAL_FIELDS)
    assert(RowData(Vector("family" -> Cell.Str("")),
      agreementLevel = Some(2), sources = Some(List("uuid"))).isEmpty)
    assert(!RowData(Vector("family" -> Cell.Str("Apiaceae"),
      "scientific_name" -> Cell.Str(""))).isEmpty)
    assert(RowData(Vector("family" ->
      Cell.Multi(List(ValueWithAgreement("", 1))))).isEmpty)
    assert(!RowData(Vector("family" ->
      Cell.Multi(List(ValueWithAgreement("Apiaceae", 1))))).isEmpty)
  }

  test("normalize row: null column values stay null, strings normalize") {
    val row = RowData(Vector("family" -> Cell.Null, "scientific_name" -> Cell.Str("Apiaceae")))
    val n = row.normalize(rowAgreement = false)
    assert(n.columns == Vector("family" -> Cell.Null, "scientific_name" -> Cell.Str("apiaceae")))
  }
}
