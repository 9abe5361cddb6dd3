package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SharedSpark
import graft.pages.SyntheticPages

class ExtractJobSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  test("synthetic corpus is deterministic and covers the fixture variants") {
    import spark.implicits._
    val p1 = SyntheticPages.pages(spark, sfDir).collect().sortBy(_.url)
    val p2 = SyntheticPages.pages(spark, sfDir).collect().sortBy(_.url)
    assert(p1.length == 500)
    assert(p1.map(_.url).sameElements(p2.map(_.url)))
    assert(p1.zip(p2).forall { case (a, b) => java.util.Arrays.equals(a.html, b.html) })
    val htmls = p1.map(p => new String(p.html, "UTF-8"))
    assert(htmls.exists(_.contains("<th>Common name</th>")), "th tables present")
    assert(htmls.exists(_.contains("<pre>")), "pre tables present")
    assert(htmls.exists(_.contains("rowspan")), "rowspan tables present")
    assert(htmls.exists(_.contains("data-page=\"2\"")), "multi-page docs present")
    val sizes = htmls.map(_.length)
    assert(sizes.max > 10 * sizes.min, "mega page (skew) present")
  }

  test("extraction: one row per url, all ok, tables found") {
    import spark.implicits._
    val out = ExtractJob.extract(spark, SyntheticPages.pages(spark, sfDir), ExtractJob.Config(buckets = 8))
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.status == "ok"))
    assert(rows.count(_.n_tables > 0) > 150)
    assert(rows.forall(r => r.main_text.nonEmpty))
    // boilerplate stripped everywhere
    assert(rows.forall(r => !r.main_text.contains("Login portal")))
    // table spans reported alongside tables
    assert(rows.filter(_.n_tables > 0).forall(_.spans.nonEmpty))
    // tables_json is the byte-stable raw writer format
    assert(rows.forall(r => r.tables_json.startsWith("{\"tables\": ")))
  }

  test("per-url output is byte-identical across different bucket counts (partition independence)") {
    import spark.implicits._
    def snapshot(buckets: Int): Map[String, (String, String)] =
      ExtractJob.extract(spark, SyntheticPages.pages(spark, sfDir), ExtractJob.Config(buckets = buckets))
        .collect().map(r => r.url -> ((r.main_text, r.tables_json))).toMap
    val a = snapshot(4)
    val b = snapshot(16)
    assert(a.keySet == b.keySet)
    a.foreach { case (url, payload) => assert(b(url) == payload, s"mismatch at $url") }
  }

  test("run + lineage + resume: killed run restarts only unfinished buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-extract").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)

    val full = ExtractJob.run(spark, pages, dir, cfg)
    assert(full.pagesProcessed == 500)
    assert(full.bucketsSkipped == 0)
    val fullOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text", "tables_json").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)

    val lineage = spark.read.parquet(s"$dir/_lineage")
    assert(lineage.count() == 8)
    assert(lineage.select("extractor_version").distinct().collect().head.getString(0) == ExtractJob.ExtractorVersion)

    // simulate a kill after 6 of 8 buckets committed: drop 2 buckets'
    // lineage partitions + their output partitions (the lineage table is
    // partitioned by bucket, so a crash leaves exactly this shape)
    for (b <- 6 to 7; root <- Seq("extracted", "_lineage")) {
      val p = new java.io.File(s"$dir/$root/bucket=$b")
      if (p.exists()) { p.listFiles().foreach(_.delete()); p.delete() }
    }

    val expectedPending = {
      val pending = pages.withColumn("bucket", ExtractJob.bucketOf(col("url"), 8))
        .filter(col("bucket") >= 6)
      pending.count()
    }

    val resumed = ExtractJob.run(spark, pages, dir, cfg)
    assert(resumed.bucketsSkipped == 6)
    assert(resumed.pagesProcessed == expectedPending, "only unfinished buckets re-extracted")

    val resumedOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text", "tables_json").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(resumedOut.length == fullOut.length)
    assert(resumedOut.sameElements(fullOut), "resumed output identical to uninterrupted run")
  }

  test("resume re-extracts buckets whose lineage carries a stale extractor version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-extract-version").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)
    val fullOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)

    def rewriteDir(path: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val df = f(spark.read.parquet(path)).localCheckpoint()
      rmrf(new java.io.File(path))
      df.write.parquet(path)
    }
    // age bucket 3: stamp its lineage with an older extractor version and
    // tamper its output so re-extraction (or the lack of it) is observable
    rewriteDir(s"$dir/_lineage/bucket=3")(
      _.withColumn("extractor_version", lit("graft-extract-0.0.0")))
    rewriteDir(s"$dir/extracted/bucket=3")(
      _.withColumn("main_text", lit("TAMPERED")))

    // opt-out accepts the stale bucket: nothing re-extracted, tamper survives
    val accepted = ExtractJob.run(spark, pages, dir, cfg.copy(acceptStaleVersions = true))
    assert(accepted.bucketsSkipped == 8)
    assert(accepted.pagesProcessed == 0)
    assert(ExtractJob.readOutput(spark, dir).filter(col("main_text") === "TAMPERED").count() > 0)

    // default re-extracts exactly the stale bucket and converges the version
    val expectedPending = pages.withColumn("bucket", ExtractJob.bucketOf(col("url"), 8))
      .filter(col("bucket") === 3).count()
    val resumed = ExtractJob.run(spark, pages, dir, cfg)
    assert(resumed.bucketsSkipped == 7)
    assert(resumed.pagesProcessed == expectedPending)
    val lineage = spark.read.parquet(s"$dir/_lineage")
    assert(lineage.count() == 8)
    assert(lineage.select("extractor_version").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(ExtractJob.ExtractorVersion))
    val resumedOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(resumedOut.sameElements(fullOut), "stale bucket re-extracted to current-version bytes")
  }

  test("resume migrates a pre-O(pending) FLAT lineage layout before writing partitioned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-extract-migrate").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)
    val fullOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)

    // rewrite the lineage in the OLD layout (whole-table overwrite, bucket
    // as a data column at the root), minus bucket 7 (killed mid-run), and
    // drop bucket 7's output — the exact on-disk state an upgraded binary
    // inherits from a pre-round-6 run
    val flat = spark.read.parquet(s"$dir/_lineage")
      .withColumn("bucket", col("bucket").cast("int"))
      .filter(col("bucket") =!= 7)
      .localCheckpoint() // sever from the files about to be deleted
    rmrf(new java.io.File(s"$dir/_lineage"))
    flat.write.parquet(s"$dir/_lineage")
    rmrf(new java.io.File(s"$dir/extracted/bucket=7"))

    val resumed = ExtractJob.run(spark, pages, dir, cfg)
    assert(resumed.bucketsSkipped == 7)

    // the mixed flat+partitioned layout never forms: after the run the
    // lineage dir is purely partitioned and loads cleanly
    val rootNames = new java.io.File(s"$dir/_lineage").listFiles().map(_.getName)
    assert(rootNames.count(_.startsWith("bucket=")) == 8)
    assert(!rootNames.exists(_.endsWith(".parquet")), s"flat files remain: ${rootNames.mkString(",")}")
    val lineage = spark.read.parquet(s"$dir/_lineage")
    assert(lineage.count() == 8)

    val resumedOut = ExtractJob.readOutput(spark, dir)
      .select("url", "main_text").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(resumedOut.sameElements(fullOut), "output identical after migration + resume")
  }

  test("resume is O(pending): completed-bucket output and lineage are never read or rewritten") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-extract-opending").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)

    ExtractJob.run(spark, pages, dir, cfg)

    // drop buckets 6-7 (simulated kill), then CORRUPT every committed
    // parquet data file in the completed buckets 0-5 — both output and
    // lineage. If any resume code path opened them (the old implementation
    // re-aggregated the ENTIRE output for lineage and rewrote the whole
    // lineage table), the run would throw on the garbage footers.
    for (b <- 6 to 7; root <- Seq("extracted", "_lineage")) {
      val p = new java.io.File(s"$dir/$root/bucket=$b")
      if (p.exists()) { p.listFiles().foreach(_.delete()); p.delete() }
    }
    val garbage = "not a parquet file".getBytes("UTF-8")
    var corrupted = 0
    for (b <- 0 to 5; root <- Seq("extracted", "_lineage")) {
      val p = new java.io.File(s"$dir/$root/bucket=$b")
      assert(p.exists(), s"$root/bucket=$b missing after full run")
      for (f <- p.listFiles() if f.getName.endsWith(".parquet")) {
        java.nio.file.Files.write(f.toPath, garbage)
        corrupted += 1
      }
    }
    assert(corrupted >= 12, "corruption must cover all completed data files")

    // ... except the lineage BUCKET IDS, which resume legitimately reads to
    // know what is complete. Partition ids live in dir names, but the row
    // payload comes from the files — so restore minimal valid lineage rows
    // for 0-5 (fresh content, marker urls) to prove they are carried over
    // verbatim, not recomputed from output.
    val marker = (0 to 5).map(b =>
      (0L, 0L, 0L, 0L, s"marker-$b", s"marker-$b", "carried-over", b))
      .toDF("urls", "rows_out", "tables_out", "html_bytes", "url_min",
        "url_max", "extractor_version", "bucket")
    for (b <- 0 to 5) {
      val p = new java.io.File(s"$dir/_lineage/bucket=$b")
      p.listFiles().foreach(_.delete())
      marker.filter(col("bucket") === b).drop("bucket")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/_lineage/bucket=$b")
      // spark writes _SUCCESS inside the partition dir here; harmless
    }

    // acceptStaleVersions: the marker rows carry a fake version on purpose,
    // and this test is about resume COST, not the version policy (which has
    // its own test above)
    val resumed = ExtractJob.run(spark, pages, dir, cfg.copy(acceptStaleVersions = true))
    assert(resumed.bucketsSkipped == 6)

    // completed buckets' lineage rows survived untouched (carried over by
    // dynamic partition overwrite, not recomputed); pending rows are fresh
    val after = spark.read.parquet(s"$dir/_lineage")
    val byBucket = after.collect().map(r =>
      r.getAs[Int]("bucket") -> r.getAs[String]("extractor_version")).toMap
    assert(byBucket.size == 8)
    for (b <- 0 to 5) assert(byBucket(b) == "carried-over", s"lineage bucket $b was rewritten")
    for (b <- 6 to 7) assert(byBucket(b) == ExtractJob.ExtractorVersion, s"lineage bucket $b not fresh")

    // the pending buckets' output is genuinely re-extracted and readable
    val pendingOut = spark.read
      .option("basePath", s"$dir/extracted")
      .parquet(s"$dir/extracted/bucket=6", s"$dir/extracted/bucket=7")
    val expectedPending = pages.withColumn("bucket", ExtractJob.bucketOf(col("url"), 8))
      .filter(col("bucket") >= 6).count()
    assert(pendingOut.count() == expectedPending)
  }

  test("interrupted migration: complete .migrating table rolls FORWARD") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-migrate-fwd").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)

    // simulate a kill between the two swap renames: the old FLAT original
    // is parked at .premigrate (plant a marker version in it so we can tell
    // which table won) and the COMPLETE migrated table — written the way
    // migrateFlatLineage writes it, static overwrite + explicit _SUCCESS
    // marker — sits at .migrating
    val lineage = new java.io.File(s"$dir/_lineage")
    val parked = new java.io.File(s"$dir/_lineage${ExtractJob.PremigrateSuffix}")
    val tmp = new java.io.File(s"$dir/_lineage${ExtractJob.MigratingSuffix}")
    val real = spark.read.parquet(lineage.toString)
      .withColumn("bucket", col("bucket").cast("int")).localCheckpoint()
    rmrf(lineage)
    real.withColumn("extractor_version", lit("loser-version"))
      .write.parquet(parked.toString) // flat, as the pre-migration layout was
    real.write.partitionBy("bucket").parquet(tmp.toString)
    assert(new java.io.File(tmp, "_SUCCESS").exists(),
      "test setup must mirror the migration's completeness marker")

    ExtractJob.recoverInterruptedMigration(spark, s"$dir/_lineage")
    assert(lineage.exists() && !parked.exists() && !tmp.exists())
    val versions = spark.read.parquet(s"$dir/_lineage")
      .select("extractor_version").distinct().collect().map(_.getString(0)).toSeq
    assert(versions == Seq(ExtractJob.ExtractorVersion), "migrated table won, not the parked original")

    // and a subsequent resume run sees a healthy, fully-completed corpus
    val resumed = ExtractJob.run(spark, pages, dir, cfg)
    assert(resumed.bucketsSkipped == 8 && resumed.pagesProcessed == 0)
  }

  test("interrupted migration: incomplete .migrating table rolls BACK to the original") {
    val dir = java.nio.file.Files.createTempDirectory("graft-migrate-back").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)

    // simulate a kill DURING the tmp write of a swap whose p→old rename
    // somehow preceded completion (the defensive branch): original parked
    // at .premigrate, .migrating exists but has no _SUCCESS
    val lineage = new java.io.File(s"$dir/_lineage")
    val parked = new java.io.File(s"$dir/_lineage${ExtractJob.PremigrateSuffix}")
    val tmp = new java.io.File(s"$dir/_lineage${ExtractJob.MigratingSuffix}")
    assert(lineage.renameTo(parked))
    tmp.mkdirs()
    java.nio.file.Files.write(new java.io.File(tmp, "part-garbage.parquet").toPath,
      "partial write".getBytes("UTF-8"))

    ExtractJob.recoverInterruptedMigration(spark, s"$dir/_lineage")
    assert(lineage.exists() && !parked.exists() && !tmp.exists())
    val resumed = ExtractJob.run(spark, pages, dir, cfg)
    assert(resumed.bucketsSkipped == 8 && resumed.pagesProcessed == 0)
  }

  test("interrupted migration: leftovers next to an authoritative table are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-migrate-noop").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)

    // a kill after the second rename but before the old copy was deleted:
    // the real table is in place, both suffix dirs linger
    val parked = new java.io.File(s"$dir/_lineage${ExtractJob.PremigrateSuffix}")
    val tmp = new java.io.File(s"$dir/_lineage${ExtractJob.MigratingSuffix}")
    parked.mkdirs(); tmp.mkdirs()
    java.nio.file.Files.write(new java.io.File(parked, "old.parquet").toPath, Array[Byte](1))
    java.nio.file.Files.write(new java.io.File(tmp, "new.parquet").toPath, Array[Byte](2))

    val resumed = ExtractJob.run(spark, pages, dir, cfg) // recovery runs first
    assert(!parked.exists() && !tmp.exists())
    assert(resumed.bucketsSkipped == 8 && resumed.pagesProcessed == 0)
  }

  test("--no-resume run still migrates a FLAT lineage layout (no mixed layout forms)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-migrate-noresume").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)

    // rewrite the lineage in the OLD flat layout (bucket as a data column,
    // files at the table root)
    val flat = spark.read.parquet(s"$dir/_lineage")
      .withColumn("bucket", col("bucket").cast("int"))
      .localCheckpoint()
    rmrf(new java.io.File(s"$dir/_lineage"))
    flat.write.parquet(s"$dir/_lineage")

    // a no-resume run ignores the lineage for SKIPPING but must still
    // migrate the layout, or its partitioned write lands next to the old
    // root-level files and every later reader rejects the mixed layout
    val rerun = ExtractJob.run(spark, pages, dir, cfg.copy(resume = false))
    assert(rerun.pagesProcessed == 500 && rerun.bucketsSkipped == 0)
    val rootNames = new java.io.File(s"$dir/_lineage").listFiles().map(_.getName)
    assert(rootNames.count(_.startsWith("bucket=")) == 8)
    assert(!rootNames.exists(_.endsWith(".parquet")), s"flat files remain: ${rootNames.mkString(",")}")
    assert(spark.read.parquet(s"$dir/_lineage").count() == 8)
  }

  test("lineage stamps only buckets WRITTEN this run: a leftover output dir absent from the input is neither scanned nor re-stamped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-written-only").toString
    val cfg = ExtractJob.Config(buckets = 8)
    val pages = SyntheticPages.pages(spark, sfDir)
    ExtractJob.run(spark, pages, dir, cfg)

    // make buckets 6 and 7 pending (kill their lineage), then CORRUPT
    // bucket 7's leftover output dir — if the lineage scan selected dirs by
    // not-completed (the pre-accumulator logic) instead of written-this-run,
    // it would open these garbage files and throw
    rmrf(new java.io.File(s"$dir/_lineage/bucket=6"))
    rmrf(new java.io.File(s"$dir/_lineage/bucket=7"))
    val b7 = new java.io.File(s"$dir/extracted/bucket=7")
    for (f <- b7.listFiles() if f.getName.endsWith(".parquet"))
      java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes("UTF-8"))

    // the second run's INPUT is missing bucket 7's pages entirely (an older
    // run produced that dir from a feed this run does not carry)
    val inputNo7 = pages
      .withColumn("bucket", ExtractJob.bucketOf(col("url"), 8))
      .filter(col("bucket") =!= 7)
      .select("url", "warc_ts", "html", "text", "lang")
      .as[Page]
    val expected6 = pages.withColumn("bucket", ExtractJob.bucketOf(col("url"), 8))
      .filter(col("bucket") === 6).count()

    val resumed = ExtractJob.run(spark, inputNo7, dir, cfg)
    assert(resumed.bucketsSkipped == 6)
    assert(resumed.pagesProcessed == expected6, "only bucket 6 re-extracted")

    // bucket 7 was not re-stamped: its lineage row stays absent (the dir's
    // provenance is unknown — stamping it current-version would lie)
    val after = spark.read.parquet(s"$dir/_lineage")
    val stamped = after.select(col("bucket").cast("int")).as[Int].collect().toSet
    assert(stamped == Set(0, 1, 2, 3, 4, 5, 6), s"unexpected lineage buckets: $stamped")
  }

  test("SparkEntry.entry smoke: rows > 0") {
    assert(graft.SparkEntry.entry(spark).count() == 500)
  }
}
