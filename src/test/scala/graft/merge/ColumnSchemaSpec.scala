package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Text
import graft.core.Text.ColType._

/** Port of the reference's tests/test_column_schema.py and
  * tests/test_parse_column_names_hints.py (the last small unported
  * suites). The three `parse_pydantic` cases are excluded by design: they
  * build the agent reader's pydantic response model, and the agent reader
  * (S5) is a documented exclusion — the typed `ColType` values plus the
  * scientific_name description live on our side of that boundary.
  */
class ColumnSchemaSpec extends AnyFunSuite {

  private val Schema = ColumnSchema.parse("family:str,count:int,ratio:float,active:bool")

  test("column_names returns the ordered list") {
    assert(Schema.columnNames == List("family", "count", "ratio", "active"))
  }

  test("column_type returns the correct type") {
    assert(Schema.columnType("family") == TStr)
    assert(Schema.columnType("count") == TInt)
    assert(Schema.columnType("ratio") == TFloat)
    assert(Schema.columnType("active") == TBool)
  }

  test("definitions returns name/type pairs in order") {
    assert(Schema.columns == Vector(
      ("family", TStr), ("count", TInt), ("ratio", TFloat), ("active", TBool)))
  }

  test("contains known / not unknown column") {
    assert(Schema.contains("family"))
    assert(!Schema.contains("genus"))
  }

  test("non-empty schema is truthy, empty schema is falsy") {
    assert(Schema.nonEmpty)
    assert(!ColumnSchema(Vector.empty).nonEmpty)
    // column_schema.py:59-63 settings-dict form: empty means "no schema"
    assert(ColumnSchema.fromSettingsDict(Nil).isEmpty)
  }

  test("serialize returns string type names") {
    assert(Schema.serialize == Vector(
      ("family", "str"), ("count", "int"), ("ratio", "float"), ("active", "bool")))
  }

  test("column_type raises for an unknown column (KeyError parity)") {
    intercept[NoSuchElementException] { Schema.columnType("genus") }
    ()
  }

  test("parse and serialize the scientific_name type") {
    val schema = ColumnSchema.parse("species:scientific_name")
    assert(schema.columnType("species") == TScientificName)
    assert(schema.serialize == Vector(("species", "scientific_name")))
  }

  test("parse rejects bad field specifiers and unknown types") {
    intercept[IllegalArgumentException] { ColumnSchema.parse("family") }
    intercept[IllegalArgumentException] { ColumnSchema.parse("family:complex128") }
    ()
  }

  // ---- parse_column_names_hints (test_parse_column_names_hints.py) --------

  test("hints parse: simple comma separated") {
    assert(Text.parseColumnNamesHints("id, name, family") == List("id", "name", "family"))
  }

  test("hints parse: newline and whitespace") {
    assert(Text.parseColumnNamesHints("id \n name   family") == List("id", "name", "family"))
  }

  test("hints parse: extra commas and spaces") {
    assert(Text.parseColumnNamesHints("id, ,  ,   name , family")
      == List("id", "name", "family"))
  }

  test("hints parse: diacritics are transliterated") {
    assert(Text.parseColumnNamesHints("id, nombre_científico")
      == List("id", "nombre_cientifico"))
  }

  test("hints parse: uppercase and mixed case normalize") {
    assert(Text.parseColumnNamesHints("ID, Vernacular_Name, SCIENTIFIC_NAME")
      == List("id", "vernacular_name", "scientific_name"))
  }

  test("hints parse: empty input") {
    assert(Text.parseColumnNamesHints("") == Nil)
  }
}
