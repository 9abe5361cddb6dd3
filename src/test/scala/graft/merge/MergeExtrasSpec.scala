package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark
import graft.core._
import graft.sinks.HtmlReport

class MergeExtrasSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def runDoc(id: String, uuid: String, idx: Int, curated: Boolean = false): RunDoc = {
    val cur = if (curated)
      """, "metadata": {"filename": "x", "curations": [{"curator": "ana"}]}"""
    else """, "metadata": {"filename": "x"}"""
    RunDoc(id, uuid, idx, 0,
      s"""{"tables": [{"table_fragments": [{"rows": [{"a": "v$id"}], "page": 1}]}], "citation": null$cur}""")
  }

  test("F17 curation guard: curated docs are skipped by the anti-join") {
    import spark.implicits._
    val runs = Seq(runDoc("d1", "u1", 0), runDoc("d2", "u1", 0), runDoc("d3", "u1", 0)).toDS()
    // an existing merged output where d2 carries curations
    val existing = Seq(
      MergedDoc("d2", 1, 1, 1,
        """{"tables": [], "citation": null, "metadata": {"filename": "x", "curations": [{"curator": "ana", "description": null, "timestamp": null}]}, "uuid": null}"""),
      MergedDoc("d3", 1, 1, 1,
        """{"tables": [], "citation": null, "metadata": null, "uuid": null}""")).toDS()
    val curated = MergeJob.curatedDocs(spark, existing)
    assert(curated.collect().toSet == Set("d2"))
    val merged = MergeJob.mergeRunsSkippingCurated(spark, runs, curated, MergeConfig())
    assert(merged.collect().map(_.doc_id).toSet == Set("d1", "d3"))
  }

  test("K7 settings JSON round-trips every MergeConfig field") {
    val cfg = MergeConfig(
      filterTitleRows = false, stripLeadingRowNumbers = true,
      normalizePunctuation = true, splitConjunctionColumns = true,
      fixReversedColumnValues = true, semanticLanguage = "es",
      hints = List("a", "b"), hintsMode = Some("unsafe"),
      aliases = Vector("x" -> "y", "notes" -> "<remove>"),
      useColumnNameSemantic = true, useJaccard = true,
      useColumnValueSemantic = true, threshold = 0.7,
      schemaStr = Some("a:int b:str"), removeHeaderRows = true,
      transformTablesFile = Some("compact-safe"),
      distinctReaders = Some(Map("u1" -> "pdfplumber")),
      columnAgreement = true, filterSchemaColumns = true,
      orderSchemaColumns = true, coerceSchemaColumnTypes = true,
      onlySemanticColumns = true)
    val json = MergeSettingsJson.toJson(cfg)
    assert(MergeSettingsJson.fromJson(json) == cfg)
    // defaults round-trip too
    assert(MergeSettingsJson.fromJson(MergeSettingsJson.toJson(MergeConfig())) == MergeConfig())
  }

  test("K5 HTML report: TOC, rowspan compaction, agreement classes") {
    val doc = TableDoc(
      tables = List(TableData(List(Fragment(List(
        RowData(Vector("name" -> Cell.Str("Lantern Fox"), "status" -> Cell.Str("stable")),
          agreementLevel = Some(2), rowIdx = Some(0)),
        RowData(Vector("name" -> Cell.Str("Lantern Fox"), "status" -> Cell.Str("declining")),
          agreementLevel = Some(1), rowIdx = Some(0)),
        RowData(Vector("name" -> Cell.Str("Glass Frog"), "status" -> Cell.Str("stable")),
          agreementLevel = Some(3), rowIdx = Some(1))
      ), page = 4)))),
      citation = Cell.Str("Atlas & <friends>"))
    val html = HtmlReport.render("doc-1", doc)
    assert(html.contains("""<a href="#table-0">Table 1</a>"""))
    assert(html.contains("""<td rowspan="2">Lantern Fox</td>""")) // W4 compaction
    assert(html.contains("agreement-2") && html.contains("agreement-3"))
    assert(html.contains("Atlas &amp; &lt;friends&gt;")) // escaping
    assert(html.contains("""data-page="4""""))
    // the differing column is NOT compacted
    assert(html.contains("<td>declining</td>"))
  }

  test("rowGroups splits on row_ change and null row_") {
    def r(idx: Option[Int]) = RowData(Vector("a" -> (Cell.Str("x"): Cell)), rowIdx = idx)
    val groups = HtmlReport.rowGroups(List(r(Some(0)), r(Some(0)), r(Some(1)), r(None), r(None)))
    assert(groups.map(_.size) == List(2, 1, 1, 1)) // null row_ never groups
  }
}
