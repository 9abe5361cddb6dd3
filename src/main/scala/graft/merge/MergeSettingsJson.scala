package graft.merge

import graft.core.JVal
import graft.core.JVal._

/** Settings export/import (K7 — the reference's settings.tablemerge.json
  * round-trip, src/tablemerge/settings.py:41-84): a MergeConfig serializes
  * to a stable JSON document and parses back, so a merge run's exact
  * configuration can be persisted beside its output table.
  */
object MergeSettingsJson {

  def toJson(c: MergeConfig): String = {
    def b(v: Boolean): JVal = JBool(v)
    JObj(Vector(
      "filter_title_rows" -> b(c.filterTitleRows),
      "strip_leading_row_numbers" -> b(c.stripLeadingRowNumbers),
      "normalize_punctuation" -> b(c.normalizePunctuation),
      "split_conjunction_columns" -> b(c.splitConjunctionColumns),
      "fix_reversed_column_values" -> b(c.fixReversedColumnValues),
      "semantic_language" -> JStr(c.semanticLanguage),
      "hints" -> JArr(c.hints.toVector.map(JStr(_): JVal)),
      "hints_column_alignment" -> c.hintsMode.map(JStr(_): JVal).getOrElse(JNull),
      "column_aliases" -> JObj(c.aliases.map { case (k, v) => (k, JStr(v): JVal) }),
      "column_name_semantic_alignment" -> b(c.useColumnNameSemantic),
      "jaccard_column_alignment" -> b(c.useJaccard),
      "column_value_semantic_alignment" -> b(c.useColumnValueSemantic),
      "threshold" -> JNum(c.threshold.toString),
      "schema" -> c.schemaStr.map(JStr(_): JVal).getOrElse(JNull),
      "remove_header_rows" -> b(c.removeHeaderRows),
      "transform_tablesfile" -> c.transformTablesFile.map(JStr(_): JVal).getOrElse(JNull),
      "agreement_method" -> JStr(if (c.distinctReaders.nonEmpty) "distinct-readers" else "simple-count"),
      "readers" -> c.distinctReaders.map(m =>
        JObj(m.toVector.sortBy(_._1).map { case (k, v) => (k, JStr(v): JVal) }): JVal).getOrElse(JNull),
      "column_agreement" -> b(c.columnAgreement),
      "filter_schema_columns" -> b(c.filterSchemaColumns),
      "order_schema_columns" -> b(c.orderSchemaColumns),
      "coerce_schema_column_types" -> b(c.coerceSchemaColumnTypes),
      "only_semantic_columns" -> b(c.onlySemanticColumns),
      "drop_empty_columns" -> b(c.dropEmptyColumns),
      "drop_empty_tables" -> b(c.dropEmptyTables)
    )).render
  }

  def fromJson(s: String): MergeConfig = {
    val o = JVal.parse(s) match {
      case x: JObj => x
      case other => throw new IllegalArgumentException(s"bad settings $other")
    }
    def bool(k: String, dflt: Boolean = false): Boolean =
      o.get(k).collect { case JBool(v) => v }.getOrElse(dflt)
    def str(k: String): Option[String] = o.get(k).collect { case JStr(v) => v }
    MergeConfig(
      filterTitleRows = bool("filter_title_rows", dflt = true),
      stripLeadingRowNumbers = bool("strip_leading_row_numbers"),
      normalizePunctuation = bool("normalize_punctuation"),
      splitConjunctionColumns = bool("split_conjunction_columns"),
      fixReversedColumnValues = bool("fix_reversed_column_values"),
      semanticLanguage = str("semantic_language").getOrElse("en"),
      hints = o.get("hints").collect { case JArr(a) => a.toList.collect { case JStr(x) => x } }.getOrElse(Nil),
      hintsMode = str("hints_column_alignment"),
      aliases = o.get("column_aliases").collect {
        case m: JObj => m.fields.collect { case (k, JStr(v)) => (k, v) }
      }.getOrElse(Vector.empty),
      useColumnNameSemantic = bool("column_name_semantic_alignment"),
      useJaccard = bool("jaccard_column_alignment"),
      useColumnValueSemantic = bool("column_value_semantic_alignment"),
      threshold = o.get("threshold").collect { case JNum(v) => v.toDouble }.getOrElse(0.5),
      schemaStr = str("schema"),
      removeHeaderRows = bool("remove_header_rows"),
      transformTablesFile = str("transform_tablesfile"),
      distinctReaders = o.get("readers").collect {
        case m: JObj => m.fields.collect { case (k, JStr(v)) => (k, v) }.toMap
      },
      columnAgreement = bool("column_agreement"),
      filterSchemaColumns = bool("filter_schema_columns"),
      orderSchemaColumns = bool("order_schema_columns"),
      coerceSchemaColumnTypes = bool("coerce_schema_column_types"),
      onlySemanticColumns = bool("only_semantic_columns"),
      dropEmptyColumns = bool("drop_empty_columns", dflt = true),
      dropEmptyTables = bool("drop_empty_tables", dflt = true))
  }
}
