package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.html.{ExtractSettings, HtmlExtractor}

/** The flagship extraction pipeline (north rule):
  *
  *   pages table → [resume anti-filter on completed buckets]
  *               → deterministic url-hash bucketing (explicit repartition)
  *               → ONE fused mapPartitions stage
  *                   (tokenize → DOM-lite → boilerplate score → table grids)
  *               → output parquet partitioned by bucket
  *               → per-bucket lineage/metrics table (commit point)
  *
  * Scale design notes:
  *  - The only wide edge is the explicit repartition on `bucket` —
  *    `pmod(xxhash64(url), buckets)` is a pure column expression, so row
  *    placement is deterministic and independent of input split layout
  *    (AQE/skew-join never reshapes it; per-row output stays byte-stable).
  *  - Extraction itself is narrow and codegen-adjacent: one typed
  *    mapPartitions over Dataset[Page]; no intermediate materialization.
  *  - Mega-page skew: url hashing spreads hosts uniformly; a single giant
  *    page is row-atomic by nature, so the lever is bucket count — size
  *    buckets so the p99 bucket fits an executor core's budget.
  *  - Resume: lineage is written AFTER the output parquet commit; a killed
  *    run leaves missing/uncommitted lineage rows and dynamic partition
  *    overwrite re-extracts exactly those buckets (anti-join on lineage).
  */
object ExtractJob {

  /** Stamped into every lineage row; version-aware resume re-extracts any
    * bucket whose stamp differs. MUST be bumped whenever a change can alter
    * extraction output bytes — 0.2.0: byte-level tokenizer (malformed-UTF-8
    * replacement differs from the old JDK-decoder path) + ASCII-only
    * raw-text close-tag folding. */
  val ExtractorVersion = "graft-extract-0.2.0"

  final case class Config(
      buckets: Int = 32,
      resume: Boolean = true,
      settings: ExtractSettings = ExtractSettings(),
      /** Resume policy for buckets whose lineage was written by a DIFFERENT
        * extractor version. Default false: stale buckets are re-extracted so
        * a finished corpus is uniformly at [[ExtractorVersion]] (the
        * north rule's byte-identical-per-url contract is per-version — a
        * silent old/new mix would break it unreproducibly). Set true to
        * accept mixed-version output, e.g. when a version bump is known not
        * to change extraction bytes. */
      acceptStaleVersions: Boolean = false)

  /** `pagesProcessed` is derived from the COMMITTED output (sum of this
    * run's lineage `rows_out`), not from an accumulator — map-stage
    * accumulators double-count under task retry/speculation, so this is the
    * number a reader of the output will actually see, exactly-once. */
  final case class RunStats(pagesProcessed: Long, bucketsSkipped: Int, bucketsPlanned: Int)

  def bucketOf(urlCol: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(urlCol), lit(buckets.toLong)).cast("int")

  /** Pure per-page extraction — the unit the fused stage applies. */
  def extractPage(p: Page, bucket: Int, cfg: Config): ExtractedPage = {
    try {
      val ex = HtmlExtractor.extractBytes(p.html, cfg.settings)
      ExtractedPage(
        url = p.url,
        bucket = bucket,
        lang = p.lang,
        main_text = ex.mainText,
        n_tables = ex.tables.size,
        n_table_rows = ex.tables.map(_.fragment.rows.size).sum,
        tables_json = HtmlExtractor.toRawJson(fileNameOf(p.url), ex),
        spans = Convert.spans(ex),
        citation = ex.citation,
        status = ex.status,
        html_bytes = p.html.length.toLong)
    } catch {
      case e: Exception =>
        ExtractedPage(p.url, bucket, p.lang, "", 0, 0, "", Seq.empty, None,
          s"error:${e.getClass.getSimpleName}", p.html.length.toLong)
    }
  }

  def fileNameOf(url: String): String = {
    val i = url.lastIndexOf('/')
    if (i >= 0 && i < url.length - 1) url.substring(i + 1) else url
  }

  /** Transform-only form (no sinks) — used by SparkEntry queries and the
    * bench. Deliberately NARROW: the bucket id is computed as a column but
    * the raw html payload is never shuffled (at 100 TB, repartitioning the
    * page bytes is the single worst move available — extraction runs on the
    * scan tasks and only the much smaller extraction output ever shuffles).
    */
  def extract(spark: SparkSession, pagesDs: Dataset[Page], cfg: Config = Config()): Dataset[ExtractedPage] = {
    import spark.implicits._
    val withBucket = pagesDs
      .withColumn("bucket", bucketOf(col("url"), cfg.buckets))
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
    withBucket.mapPartitions { it =>
      it.map { case (url, ts, html, text, lang, bucket) =>
        extractPage(Page(url, ts, html, text, lang), bucket, cfg)
      }
    }
  }

  /** Hybrid-mode extraction (J6/S6 — readers/hybrid.py:68-108): a SMALL
    * url→mapping sidecar table drives which pages/columns are read. The
    * mapping map is broadcast (classic broadcast hash join of a dimension
    * into a narrow map stage — the 100 TB page table never shuffles).
    *
    * TEST/DEMO ONLY at scale: this variant ships a DRIVER-BUILT
    * `Map[String, TablesMapping]`, so building the argument is O(sidecar)
    * on the driver. For corpus-scale sidecars use [[extractMappedJoin]],
    * which broadcast-joins the sidecar as a DataFrame with no driver-side
    * collect anywhere — it is what the registered `extract_mapped` query
    * and the bench run.
    */
  def extractMapped(
      spark: SparkSession,
      pagesDs: Dataset[Page],
      mappings: Map[String, graft.html.TablesMapping],
      cfg: Config = Config()): Dataset[ExtractedPage] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(mappings)
    val withBucket = pagesDs
      .withColumn("bucket", bucketOf(col("url"), cfg.buckets))
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
    withBucket.mapPartitions { it =>
      val m = bc.value
      it.map { case (url, ts, html, text, lang, bucket) =>
        val pageCfg = m.get(url) match {
          case Some(tm) => cfg.copy(settings = cfg.settings.copy(mapping = Some(tm)))
          case None => cfg
        }
        extractPage(Page(url, ts, html, text, lang), bucket, pageCfg)
      }
    }
  }

  /** Hybrid-mode extraction at scale: the url→mapping sidecar arrives as a
    * DataFrame `(url, mapping_json)` BROADCAST-joined into the page scan —
    * no driver-side collect anywhere (round 1 collected ~1/6 of all doc ids
    * into a Map, linear in corpus size). Mapping JSON parses once per
    * distinct mapping per task (tiny cache), matching the reference's
    * small `.mapping.json` sidecar contract (readers/hybrid.py:77-107).
    */
  def extractMappedJoin(
      spark: SparkSession,
      pagesDs: Dataset[Page],
      sidecar: DataFrame,
      cfg: Config = Config()): Dataset[ExtractedPage] = {
    import spark.implicits._
    val withBucket = pagesDs.withColumn("bucket", bucketOf(col("url"), cfg.buckets))
    val joined = withBucket
      .join(broadcast(sidecar.select(col("url").as("m_url"), col("mapping_json"))),
        col("url") === col("m_url"), "left")
      .select(col("url"), col("warc_ts"), col("html"), col("text"), col("lang"),
        col("bucket"), col("mapping_json"))
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int, Option[String])]
    joined.mapPartitions { it =>
      val cache = scala.collection.mutable.HashMap.empty[String, graft.html.TablesMapping]
      it.map { case (url, ts, html, text, lang, bucket, mj) =>
        val pageCfg = mj match {
          case Some(j) => cfg.copy(settings = cfg.settings.copy(mapping =
            Some(cache.getOrElseUpdate(j, graft.html.TablesMapping.fromJsonString(j)))))
          case None => cfg
        }
        extractPage(Page(url, ts, html, text, lang), bucket, pageCfg)
      }
    }
  }

  /** Full job with output + lineage + resume. Returns run stats.
    *
    * Resume cost is O(pending work), never O(corpus):
    *  - the pages table is filtered by a BROADCAST ANTI-JOIN against the
    *    lineage table (one tiny row per completed bucket) — no literal
    *    `isin` list baked into the plan, no driver round-trip on the
    *    filter path;
    *  - this run's lineage rows are aggregated from ONLY the partition
    *    directories this run actually WROTE — tracked by a bounded
    *    set-accumulator in the extraction stage, so a bucket dir left on
    *    disk by an older run but absent from this run's input is neither
    *    scanned nor re-stamped (its lineage row, current or stale, is
    *    carried over verbatim). Completed buckets' parquet files are never
    *    opened, which `ExtractJobSpec`'s corruption gate proves;
    *  - the lineage table itself is partitioned by bucket and written with
    *    dynamic partition overwrite, so completed buckets' lineage rows are
    *    carried over untouched instead of being recomputed and rewritten.
    *
    * The only driver-side state is two bucket-id sets (completed, written
    * this run) — O(buckets) ints, bounded by `cfg.buckets` regardless of
    * corpus size — used solely to pick this run's partition dirs for the
    * lineage scan.
    *
    * Resume is extractor-version-aware: a bucket is skipped only when its
    * lineage row carries the CURRENT [[ExtractorVersion]] (this is what the
    * version column in the lineage schema is for — `BASELINE.json`'s
    * `(partition id, url range, rows, bytes, extractor version)`). After an
    * extractor upgrade, a resume run re-extracts exactly the stale buckets,
    * converging the corpus to one version; `cfg.acceptStaleVersions` opts
    * out when mixed versions are acceptable.
    */
  def run(spark: SparkSession, pagesDs: Dataset[Page], outDir: String, cfg: Config = Config()): RunStats = {
    import spark.implicits._
    val lineagePath = s"$outDir/_lineage"
    val outputPath = s"$outDir/extracted"

    // Heal any layout work a killed run left behind, resume or not: an
    // interrupted atomic swap is rolled forward/back first, then a
    // pre-O(pending) FLAT layout is migrated — also on --no-resume runs,
    // where this run's partitioned lineage write would otherwise land NEXT
    // TO the old root-level files (a mixed layout partition discovery
    // rejects for every later reader).
    recoverInterruptedMigration(spark, lineagePath)
    if (pathExists(spark, lineagePath)) migrateFlatLineage(spark, lineagePath)

    // A lineage row marks a bucket skippable only if its extractor version
    // is current (or the caller opted into mixed versions) — a stale row's
    // bucket is re-extracted and its lineage dynamically overwritten.
    val lineageOld: Option[DataFrame] =
      if (cfg.resume && pathExists(spark, lineagePath)) {
        val all = spark.read.parquet(lineagePath)
        Some(
          if (cfg.acceptStaleVersions) all
          else all.filter(col("extractor_version") === lit(ExtractorVersion)))
      } else None
    val completed: Set[Int] = lineageOld match {
      case Some(df) => df.select(col("bucket").cast("int")).as[Int].collect().toSet
      case None => Set.empty
    }

    val withBucket = pagesDs.withColumn("bucket", bucketOf(col("url"), cfg.buckets))
    val pending = lineageOld match {
      case Some(df) if completed.nonEmpty =>
        withBucket
          .join(broadcast(df.select(col("bucket").cast("int").as("bucket"))),
            Seq("bucket"), "left_anti")
          // pin the column order the typed mapPartitions below depends on
          // (a using-column join may move the key column)
          .select(col("url"), col("warc_ts"), col("html"), col("text"),
            col("lang"), col("bucket"))
      case _ => withBucket
    }

    // Which buckets this run actually writes — the lineage scan below must
    // cover exactly these dirs, not every bucket dir on disk (dirs from
    // older runs whose pages are absent from this input must keep their
    // existing lineage rows, stale version and all). Bounded: each task
    // contributes each bucket id at most once, so the driver-side value is
    // O(tasks × buckets) ids worst case and O(buckets) distinct.
    val writtenAcc = spark.sparkContext.collectionAccumulator[Int]("graft.bucketsWritten")

    // Extraction stays on the scan tasks (narrow); ONLY the extracted output
    // (no html) shuffles into its bucket before the partitioned write — one
    // file per bucket, deterministic layout, cheap resume overwrites.
    val extracted = pending
      .as[(String, java.sql.Timestamp, Array[Byte], String, String, Int)]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[Int]()
        it.map { case (url, ts, html, text, lang, bucket) =>
          if (seen.add(bucket)) writtenAcc.add(bucket)
          extractPage(Page(url, ts, html, text, lang), bucket, cfg)
        }
      }
      .repartition(cfg.buckets, col("bucket"))

    // dynamic partition overwrite: only the buckets present in this run are
    // replaced; completed buckets' files are untouched. The session conf is
    // scoped: saved and restored even if the write fails.
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prevMode = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    var pagesWritten = 0L
    try {
      extracted.write
        .mode("overwrite")
        .partitionBy("bucket")
        .parquet(outputPath)

      // Lineage for THIS RUN only, read back from the committed output so
      // the lineage reflects exactly what a reader will see (commit point).
      // Only the partition dirs this run WROTE (accumulator-tracked) are
      // listed and scanned — never completed buckets, and never leftover
      // dirs from older runs whose pages were absent from this input (those
      // keep their existing lineage rows and version stamps).
      val writtenBuckets: Set[Int] = {
        val it = writtenAcc.value.iterator()
        val s = Set.newBuilder[Int]
        while (it.hasNext) s += it.next()
        s.result()
      }
      val runDirs = bucketPartitionDirs(spark, outputPath)
        .filter { case (b, _) => writtenBuckets(b) }
      if (runDirs.nonEmpty) {
        // Collected to the driver before the write: O(written buckets)
        // rows, bounded by cfg.buckets — the same bound as `completed`.
        // This both (a) makes RunStats.pagesProcessed exactly-once (the
        // committed row count, immune to task-retry double-counting) and
        // (b) writes the lineage from one tiny task instead of a shuffle.
        val newLineage: Array[LineageRow] = spark.read
          .option("basePath", outputPath)
          .parquet(runDirs.map(_._2): _*)
          .groupBy(col("bucket"))
          .agg(
            countDistinct(col("url")).as("urls"),
            count(lit(1)).as("rows_out"),
            sum(col("n_tables")).cast("long").as("tables_out"),
            sum(col("html_bytes")).as("html_bytes"),
            min(col("url")).as("url_min"),
            max(col("url")).as("url_max"))
          .withColumn("extractor_version", lit(ExtractorVersion))
          .select(col("urls"), col("rows_out"), col("tables_out"),
            col("html_bytes"), col("url_min"), col("url_max"),
            col("extractor_version"), col("bucket").cast("int").as("bucket"))
          // typed gate: the encoder (by-name) is the schema check on the
          // lineage table — column drift fails here, not at resume time
          .as[LineageRow]
          .collect()
        pagesWritten = newLineage.iterator.map(_.rows_out).sum
        spark.createDataset(newLineage.toIndexedSeq)
          .coalesce(1)
          .write
          .mode("overwrite")
          .partitionBy("bucket")
          .parquet(lineagePath)
      }
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set(modeKey, m)
        case None => spark.conf.unset(modeKey)
      }
    }

    RunStats(pagesWritten, completed.size, cfg.buckets)
  }

  /** One-time upgrade of a lineage table written by the pre-O(pending)
    * code, which stored it FLAT (whole-table overwrite, `bucket` as a data
    * column at the directory root). Writing this run's partitioned
    * carry-over next to those root-level files would leave a mixed layout
    * Spark's partition discovery rejects — so if root-level data files
    * exist, rewrite the table partitioned by bucket (O(buckets) rows) into
    * a sibling temp dir and swap it in. If bucket=N dirs ALSO already exist
    * (a run of the new code against an unmigrated dir), the partitioned
    * rows are the newer write and win per bucket.
    *
    * The swap is crash-safe: write `<p>.migrating` fully, rename the
    * original aside to `<p>.premigrate`, rename the new table into place,
    * then drop the original — at every kill point either the original or
    * the complete migrated table is recoverable, and
    * [[recoverInterruptedMigration]] (run unconditionally first) rolls the
    * swap forward or back. A delete-before-rename would instead leave a
    * WINDOW with no lineage dir at all, which a concurrent crash turns
    * into a silent full-corpus re-extract on the next run.
    */
  private def migrateFlatLineage(spark: SparkSession, lineagePath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(lineagePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    val rootFiles = entries.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    if (rootFiles.isEmpty) return
    val partDirs = entries.filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
    val flat = spark.read
      .parquet(rootFiles.map(_.getPath.toString).toIndexedSeq: _*)
      .withColumn("bucket", col("bucket").cast("int"))
    val merged =
      if (partDirs.isEmpty) flat
      else {
        val parted = spark.read.option("basePath", lineagePath)
          .parquet(partDirs.map(_.getPath.toString).toIndexedSeq: _*)
          .withColumn("bucket", col("bucket").cast("int"))
        flat.join(parted.select("bucket").distinct(), Seq("bucket"), "left_anti")
          .unionByName(parted)
      }
    val tmp = new org.apache.hadoop.fs.Path(lineagePath + MigratingSuffix)
    val old = new org.apache.hadoop.fs.Path(lineagePath + PremigrateSuffix)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    import spark.implicits._
    merged.as[LineageRow].write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    // Completeness marker for [[recoverInterruptedMigration]], written by
    // hand: whether the committer leaves a root _SUCCESS depends on session
    // conf (dynamic partitionOverwriteMode suppresses it), and a missing
    // marker silently downgrades every interrupted swap to a roll-back +
    // re-migration. Only reached when the write above returned, so the
    // marker truthfully means "tmp is the complete table".
    fs.createNewFile(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"lineage migration rename failed: $p -> $old")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"lineage migration rename failed: $tmp -> $p")
    fs.delete(old, true)
  }

  private[pipeline] val MigratingSuffix = ".migrating"
  private[pipeline] val PremigrateSuffix = ".premigrate"

  /** Roll an interrupted [[migrateFlatLineage]] swap forward or back. Cheap
    * no-op (two existence checks) unless a kill hit the swap window.
    *
    * Kill-point inventory, given the swap order (write tmp → rename p→old
    * → rename tmp→p → delete old):
    *  - during the tmp write: p untouched → drop the partial tmp; the
    *    migration simply reruns;
    *  - between the renames: p missing but tmp is the COMPLETE migrated
    *    table (the p→old rename only runs after the tmp write returned) →
    *    roll forward: tmp→p, drop old;
    *  - after the second rename: p is authoritative → drop the leftovers;
    *  - defensively, if p is missing and tmp is absent/incomplete but the
    *    original survives at old → roll back: old→p.
    */
  private[pipeline] def recoverInterruptedMigration(spark: SparkSession, lineagePath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(lineagePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(lineagePath + MigratingSuffix)
    val old = new org.apache.hadoop.fs.Path(lineagePath + PremigrateSuffix)
    val haveTmp = fs.exists(tmp)
    val haveOld = fs.exists(old)
    if (!haveTmp && !haveOld) return
    if (fs.exists(p)) {
      // p is authoritative: either the swap never started destructive work
      // (partial tmp) or it fully completed (old not yet deleted)
      if (haveTmp) fs.delete(tmp, true)
      if (haveOld) fs.delete(old, true)
    } else if (haveTmp && fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
      if (!fs.rename(tmp, p))
        throw new java.io.IOException(s"lineage migration roll-forward failed: $tmp -> $p")
      if (haveOld) fs.delete(old, true)
    } else if (haveOld) {
      if (haveTmp) fs.delete(tmp, true)
      if (!fs.rename(old, p))
        throw new java.io.IOException(s"lineage migration roll-back failed: $old -> $p")
    } else {
      fs.delete(tmp, true) // incomplete tmp and no original to restore
      ()
    }
  }

  /** List `bucket=N` partition directories under `path` — an O(buckets)
    * filesystem listing, independent of data volume.
    */
  private def bucketPartitionDirs(spark: SparkSession, path: String): Seq[(Int, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("bucket=") =>
        (st.getPath.getName.stripPrefix("bucket=").toInt, st.getPath.toString)
    }
  }

  def readOutput(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/extracted")

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
