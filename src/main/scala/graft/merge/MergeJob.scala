package graft.merge

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core._
import graft.pipeline.{Convert, STable}

/** One extraction run's output for one document (url). The payload is the
  * raw extraction JSON (flat serializer — see ExtractedPage's scale note).
  */
final case class RunDoc(
    doc_id: String,
    run_uuid: String,
    run_idx: Int,
    page_offset: Int,
    tables_json: String)

/** Merged output row: the reference-parity merged document JSON plus flat
  * metrics (nested access = TableDoc.fromJsonString / from_json).
  */
final case class MergedDoc(
    doc_id: String,
    n_runs: Int,
    n_tables: Int,
    n_rows: Int,
    merged_json: String)

/** One row of the nested merged view: per-row metadata plus the cells map
  * (null value = reference JSON null cell; disagreeing multi-value cells
  * render as their JSON form, same convention as the K4 flatten).
  */
final case class MergedNestedRow(
    row_idx: Int,
    row_ : Option[Int],
    agreement_level_ : Option[Int],
    n_sources: Int,
    cells: Map[String, String])

/** One table fragment of the nested merged view (see nestedMergedTables). */
final case class MergedTableView(
    doc_id: String,
    n_runs: Int,
    table_idx: Int,
    frag_idx: Int,
    page: Int,
    rows: Seq[MergedNestedRow])

/** One flattened merged table row (the relational projection of a merge). */
final case class MergedFlatRow(
    doc_id: String,
    n_runs: Int,
    table_idx: Int,
    frag_idx: Int,
    page: Int,
    row_idx: Int,
    row_ : Option[Int],
    agreement_level_ : Option[Int],
    n_sources: Int)

/** Serializable merge configuration (the Spark-shippable form of
  * MergePipeline.Settings — transformer instances are rebuilt per task).
  */
final case class MergeConfig(
    filterTitleRows: Boolean = true,
    stripLeadingRowNumbers: Boolean = false,
    normalizePunctuation: Boolean = false,
    splitConjunctionColumns: Boolean = false,
    fixReversedColumnValues: Boolean = false,
    semanticLanguage: String = "en",
    hints: List[String] = Nil,
    hintsMode: Option[String] = None,
    aliases: Vector[(String, String)] = Vector.empty,
    useColumnNameSemantic: Boolean = false,
    useJaccard: Boolean = false,
    useColumnValueSemantic: Boolean = false,
    threshold: Double = 0.5,
    schemaStr: Option[String] = None,
    removeHeaderRows: Boolean = false,
    transformTablesFile: Option[String] = None,
    distinctReaders: Option[Map[String, String]] = None,
    columnAgreement: Boolean = false,
    filterSchemaColumns: Boolean = false,
    orderSchemaColumns: Boolean = false,
    coerceSchemaColumnTypes: Boolean = false,
    onlySemanticColumns: Boolean = false,
    dropEmptyColumns: Boolean = true,
    dropEmptyTables: Boolean = true) {

  def toSettings: MergePipeline.Settings =
    MergePipeline.Settings.assemble(
      fixReversedColumnValues = fixReversedColumnValues,
      filterTitleRows = filterTitleRows,
      stripLeadingRowNumbers = stripLeadingRowNumbers,
      normalizePunctuation = normalizePunctuation,
      splitConjunctionColumns = splitConjunctionColumns,
      semanticLanguage = semanticLanguage,
      hints = hints,
      hintsMode = hintsMode,
      aliases = aliases,
      useColumnNameSemantic = useColumnNameSemantic,
      useJaccard = useJaccard,
      useColumnValueSemantic = useColumnValueSemantic,
      threshold = threshold,
      schema = schemaStr.map(ColumnSchema.parse),
      removeHeaderRows = removeHeaderRows,
      transformTablesFile = transformTablesFile,
      agreement = distinctReaders.map(new DistinctReadersAgreement(_)).getOrElse(SimpleCountAgreement),
      filterSchemaColumns = filterSchemaColumns,
      orderSchemaColumns = orderSchemaColumns,
      coerceSchemaColumnTypes = coerceSchemaColumnTypes,
      onlySemanticColumns = onlySemanticColumns,
      dropEmptyColumns = dropEmptyColumns,
      dropEmptyTables = dropEmptyTables
    ).copy(columnAgreement = columnAgreement)
}

/** Distributed N-run merge (SURVEY.md §3.2 Spark equivalent): the ONLY wide
  * edge is the groupByKey shuffle on doc_id; each group (a handful of runs
  * of one document, KBs) merges doc-locally in Scala. At 10^12-doc scale
  * this is shuffle-bound, so RunDoc rows carry only extraction output
  * (never html), and doc_id hashing distributes uniformly; skew would come
  * only from a single doc with a pathological table count, bounded upstream
  * by the extractor.
  */
object MergeJob {

  def mergeRuns(spark: SparkSession, runs: Dataset[RunDoc], cfg: MergeConfig): Dataset[MergedDoc] = {
    import spark.implicits._
    runs.groupByKey(_.doc_id).flatMapGroups { (docId: String, it: Iterator[RunDoc]) =>
      val settings = cfg.toSettings // rebuilt per group; cheap, task-local
      val sorted = it.toList.sortBy(_.run_idx)
      val docs = sorted.map { r =>
        (TableDoc.fromJsonString(r.tables_json).copy(uuid = Some(r.run_uuid)), r.page_offset)
      }
      MergePipeline.mergeGroup(docs, settings).map { merged =>
        MergedDoc(
          doc_id = docId,
          n_runs = sorted.size,
          n_tables = merged.tables.size,
          n_rows = merged.tables.flatMap(_.fragments).map(_.rows.size).sum,
          merged_json = TableDoc.toJsonString(merged))
      }.iterator
    }
  }

  /** Curation guard (F17 — tablemerge __main__.py:64-69,215-220): docs whose
    * EXISTING merged output carries human curations are never re-merged.
    * Distributed form: left-anti join the runs against the curated-doc set.
    */
  def curatedDocs(spark: SparkSession, existingMerged: Dataset[MergedDoc]): Dataset[String] = {
    import spark.implicits._
    existingMerged
      .filter(m => TableDoc.fromJsonString(m.merged_json).hasCurations)
      .map(_.doc_id)
  }

  def mergeRunsSkippingCurated(
      spark: SparkSession,
      runs: Dataset[RunDoc],
      curated: Dataset[String],
      cfg: MergeConfig): Dataset[MergedDoc] = {
    import spark.implicits._
    val pending = runs.join(curated.toDF("doc_id"), Seq("doc_id"), "left_anti").as[RunDoc]
    mergeRuns(spark, pending, cfg)
  }

  /** Flattened merged rows (K4 explode semantics) as a narrow map over the
    * merged docs — the relational projection without a nested column.
    */
  def flattenMerged(spark: SparkSession, merged: Dataset[MergedDoc]): Dataset[MergedFlatRow] = {
    import spark.implicits._
    merged.flatMap { m =>
      val doc = TableDoc.fromJsonString(m.merged_json)
      for {
        (table, ti) <- doc.tables.zipWithIndex
        (frag, fi) <- table.fragments.zipWithIndex
        (row, ri) <- frag.rows.zipWithIndex
      } yield MergedFlatRow(m.doc_id, m.n_runs, ti, fi, frag.page, ri,
        row.rowIdx, row.agreementLevel, row.sources.map(_.size).getOrElse(0))
    }
  }

  /** Nested relational view over merged docs (one row per table fragment,
    * rows + cells as a nested column): the typed parse happens ONCE per doc
    * in this flatMap — a SQL user then explodes the materialized struct
    * column freely, with no from_json re-parse per consuming expression
    * (the measured 46 s CollapseProject trap). Nesting is capped at two
    * levels (rows[].cells{}) deliberately: the round-1 lesson is that a
    * 4-level nested encoder generates a serializer method too large for
    * HotSpot to JIT (tasks run interpreted, 50-100× slower).
    */
  def nestedMergedTables(spark: SparkSession, merged: Dataset[MergedDoc]): Dataset[MergedTableView] = {
    import spark.implicits._
    merged.flatMap { m =>
      val doc = TableDoc.fromJsonString(m.merged_json)
      for {
        (table, ti) <- doc.tables.zipWithIndex
        (frag, fi) <- table.fragments.zipWithIndex
      } yield MergedTableView(m.doc_id, m.n_runs, ti, fi, frag.page,
        frag.rows.zipWithIndex.map { case (r, ri) =>
          MergedNestedRow(ri, r.rowIdx, r.agreementLevel,
            r.sources.map(_.size).getOrElse(0),
            r.columns.map { case (n, c) =>
              n -> (c match {
                case Cell.Null => null
                case Cell.Str(v) => v
                case mc: Cell.Multi => Cell.toJson(mc).render
              })
            }.toMap)
        })
    }
  }

  /** Register the nested view under `name` for spark.sql consumers. */
  def registerNestedView(spark: SparkSession, merged: Dataset[MergedDoc], name: String): Unit =
    nestedMergedTables(spark, merged).createOrReplaceTempView(name)

  /** Deterministic perturbation used to synthesize a "second reader" run
    * from an extraction: case/whitespace jitter that the merge normalizers
    * must fold back together (exercises same_row + agreement).
    */
  def perturbCell(s: String, salt: Long): String = {
    if (s.isEmpty) s
    else (math.floorMod(salt, 3L): @unchecked) match {
      case 0 => s.toUpperCase(java.util.Locale.ROOT)
      case 1 => "  " + s + " "
      case 2 => s
    }
  }

  def perturbRun(run: RunDoc, newUuid: String, runIdx: Int): RunDoc = {
    val seed = run.doc_id.hashCode.toLong
    val doc = TableDoc.fromJsonString(run.tables_json)
    val perturbed = doc.copy(tables = doc.tables.map { t =>
      TableData(t.fragments.map { f =>
        f.copy(rows = f.rows.zipWithIndex.map { case (r, ri) =>
          r.withColumns(r.columns.zipWithIndex.map { case ((name, cell), ci) =>
            (name, cell.mapStrings(perturbCell(_, seed + ri * 7 + ci)))
          })
        })
      }, rowsForm = t.rowsForm)
    })
    run.copy(run_uuid = newUuid, run_idx = runIdx,
      tables_json = TableDoc.toJsonString(perturbed))
  }
}
