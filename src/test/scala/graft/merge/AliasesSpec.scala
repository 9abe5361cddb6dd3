package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.core._

/** S10 alias surface ported from the reference's tests
  * (test_merge.py:1626-1682, aliases.py).
  */
class AliasesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("parse_paper_aliases without / with / mixed offsets (test_parse_paper_aliases_*)") {
    assert(Aliases.parsePaperAliases("old:new") == Map("old" -> PaperAlias("new")))
    assert(Aliases.parsePaperAliases("old:new:5") == Map("old" -> PaperAlias("new", 5)))
    assert(Aliases.parsePaperAliases("a:b, c:d:-2\ne:f:0")
      == Map("a" -> PaperAlias("b"), "c" -> PaperAlias("d", -2), "e" -> PaperAlias("f", 0)))
    // comments stripped by tokenize_schema; bare tokens (no colon) ignored
    assert(Aliases.parsePaperAliases("# comment line\nplain old:new") == Map("old" -> PaperAlias("new")))
    intercept[IllegalArgumentException](Aliases.parsePaperAliases("old:new:xx"))
  }

  test("parse_column_aliases: alias:target tokens, comments stripped") {
    assert(Aliases.parseColumnAliases("familia:family, especie:species # sp")
      == Vector("familia" -> "family", "especie" -> "species"))
    assert(Aliases.parseColumnAliases("noalias").isEmpty)
  }

  test("aliased runs merge into the canonical group with the page offset applied") {
    import spark.implicits._
    def doc(page: Int): String = TableDoc.toJsonString(TableDoc(List(TableData(List(Fragment(List(
      RowData(Vector("family" -> Cell.Str("Apiaceae")))), page))))))
    // run A under the canonical name on page 2; run B under an ALIAS whose
    // fragment sits on page 1 with alias offset +1 -> same cluster key
    val runs = Seq(
      RunDoc("paper-new", "run-a", 0, 0, doc(page = 2)),
      RunDoc("paper-old", "run-b", 1, 0, doc(page = 1))).toDS()
    val aliases = Aliases.parsePaperAliases("paper-old:paper-new:1")
    val merged = MergeJob.mergeRuns(spark,
      Aliases.applyToRuns(spark, runs, aliases), MergeConfig()).collect()
    assert(merged.length == 1)
    assert(merged.head.doc_id == "paper-new")
    assert(merged.head.n_runs == 2)
    val d = TableDoc.fromJsonString(merged.head.merged_json)
    val rows = d.tables.head.fragments.head.rows
    assert(rows.size == 1)
    assert(rows.head.agreementLevel == Some(2), "aliased run merged into the canonical group")
  }
}
