package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ExtractJob

class ExtractMainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("arg parsing: flags, defaults, unknowns") {
    val a = ExtractMain.parse(List(
      "--input", "/data/pages", "--out", "/data/run", "--buckets", "512",
      "--no-resume", "--accept-stale-versions"))
    assert(a.input.contains("/data/pages"))
    assert(a.out.contains("/data/run"))
    assert(a.buckets == 512)
    assert(!a.resume)
    assert(a.acceptStaleVersions)
    val d = ExtractMain.parse(List("--out", "/x", "--synthetic", "/root/testdata/sf0.001:3"))
    assert(d.buckets == 4096 && d.resume && !d.acceptStaleVersions)
    assert(d.synthetic.contains("/root/testdata/sf0.001:3"))
    assertThrows[IllegalArgumentException](ExtractMain.parse(List("--bogus")))
  }

  test("--input path: by-name projection tolerates extra columns, fails fast on missing ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-extractmain").toString
    // a pages table with an EXTRA column, as a real Iceberg-style table would have
    graft.pages.SyntheticPages.pages(spark, "/root/testdata/sf0.001")
      .withColumn("crawl_id", lit("cc-2026-33"))
      .write.parquet(s"$dir/pages")
    val pages = spark.read.parquet(s"$dir/pages")
      .select("url", "warc_ts", "html", "text", "lang").as[graft.pipeline.Page]
    val stats = ExtractJob.run(spark, pages, s"$dir/run", ExtractJob.Config(buckets = 4))
    assert(stats.pagesProcessed == 500)
    assert(spark.read.parquet(s"$dir/run/extracted").count() == 500)

    val missing = spark.read.parquet(s"$dir/pages").drop("lang")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      missing.select("url", "warc_ts", "html", "text", "lang")
    }
  }
}
