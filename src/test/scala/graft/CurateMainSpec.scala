package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CurateMainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("arg parsing: flags, defaults, validation") {
    val a = CurateMain.parse(List(
      "--input", "/d/docs", "--out", "/d/run", "--benchmark", "/d/eval",
      "--gram-k", "6", "--line-min-df", "3", "--max-dup-permille", "300",
      "--skip-span-gate"))
    assert(a.input.contains("/d/docs") && a.out.contains("/d/run"))
    assert(a.benchmark.contains("/d/eval"))
    assert(a.gramK == 6 && a.lineMinDf == 3L && a.maxDupPermille == 300)
    assert(a.skipSpanGate && !a.skipLineDedup)
    val d = CurateMain.parse(List("--input", "/x", "--out", "/y"))
    assert(d.gramK == 8 && d.lineMinDf == 2L && d.maxDupPermille == 500)
    assertThrows[IllegalArgumentException](CurateMain.parse(List("--bogus")))
    assertThrows[IllegalArgumentException](
      CurateMain.parse(List("--line-min-df", "1"))) // would strip every line
    assertThrows[IllegalArgumentException](
      CurateMain.parse(List("--max-dup-permille", "1500")))
    assertThrows[IllegalArgumentException](CurateMain.parse(List("--gram-k", "0")))
    // a trailing flag with its value forgotten names the flag, not "unknown"
    val e = intercept[IllegalArgumentException](
      CurateMain.parse(List("--input", "/d", "--out")))
    assert(e.getMessage.contains("--out requires a value"))
    val e2 = intercept[IllegalArgumentException](
      ExtractMain.parse(List("--out", "/d", "--buckets")))
    assert(e2.getMessage.contains("--buckets requires a value"))
  }

  test("null-text rows are dropped at intake on BOTH paths, not NPE'd or silently forked") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1L, "real words in this document body here"),
      Row(2L, null),
      Row(3L, "other real words forming a second document"))
    val df = spark.createDataFrame(rows, schema)
    val (outA, sA) = CurateMain.run(spark, df, None,
      CurateMain.Args(skipLineDedup = true, skipSpanGate = true))
    val (outB, sB) = CurateMain.run(spark, df, None,
      CurateMain.Args(skipSpanGate = true))
    assert(sA.inputDocs == 2 && sB.inputDocs == 2)
    assert(outA.select("doc_id").collect().map(_.getLong(0)).toSet ==
      outB.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("pipeline: gates compose — banner lines stripped, near-dup family span-gated, benchmark overlap dropped") {
    // corpus: base docs + prefix twins (dupCoverage drops the whole planted
    // family) + a banner line on every 5th doc (line strip removes it)
    val toks = split(col("text"), " ")
    val half = floor(size(toks) / 2).cast("int")
    val base = concat_ws("\n",
      array_join(slice(toks, lit(1), half), " "),
      array_join(slice(toks, half + 1, size(toks) - half), " "))
    val lined = docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(lit("visit our sponsor\n"), base))
        .otherwise(base).as("text"))
    val corpus = graft.ops.Dedup.withPlantedNearDups(lined)
    // benchmark: the 12-token question prefix of every 20th doc
    val qtoks = filter(split(lower(trim(col("text"))), "\\s+"), t => t =!= "")
    val benchmark = docs.filter(col("doc_id") % 20 === 0 && size(qtoks) >= 8)
      .select(array_join(slice(qtoks, 1, 12), " ").as("text"))

    val (out, stats) = CurateMain.run(spark, corpus, Some(benchmark), CurateMain.Args())
    val outIds = out.select("doc_id").collect().map(_.getLong(0)).toSet

    assert(stats.inputDocs == corpus.count())
    assert(stats.outputDocs == outIds.size.toLong)
    assert(stats.outputDocs > 0)
    // the planted near-dup family (sources %10==0 and their twins): the
    // LINE strip already eats the halves shared verbatim between source and
    // twin, so a member reaching the span gate with >= 10 surviving tokens
    // still shares an 8-gram with its relative and is dropped; the only
    // legitimate survivors are members whose post-strip remainder is too
    // short to carry any shared 8-gram
    val familySurvivors = out.filter(col("doc_id") >= 1000000L || col("doc_id") % 10 === 0)
    assert(familySurvivors
      .filter(size(filter(split(col("text"), "\\s+"), t => t =!= "")) >= 10)
      .count() == 0)
    val familySize = corpus.filter(col("doc_id") >= 1000000L || col("doc_id") % 10 === 0).count()
    assert(familySurvivors.count() * 5 <= familySize, "span gate should drop the vast majority of the family")
    // no surviving text contains the banner line
    assert(out.filter(col("text").contains("visit our sponsor")).count() == 0)
    // no surviving doc shares an 8-gram with the benchmark
    val contam = graft.ops.Decontaminate
      .contaminationHits(spark, out, benchmark, 8)
    assert(contam.count() == 0)
    // stats line is self-consistent: output <= every keep gate
    assert(stats.outputDocs <= stats.keptQuality)
    assert(stats.outputDocs <= stats.keptSpanGate)
  }

  test("pipeline: skip flags bypass their stages; rerun is deterministic") {
    val corpus = docs.select(col("doc_id"), col("text"))
    val args = CurateMain.Args(skipLineDedup = true, skipSpanGate = true)
    val (out1, s1) = CurateMain.run(spark, corpus, None, args)
    // -1 = stage skipped (incl. decontamination with no --benchmark), so a
    // consumer can tell "never ran" from "ran and matched zero"
    assert(s1.afterLineStrip == -1L && s1.keptSpanGate == -1L && s1.contaminated == -1L)
    // with no planted dups, quality+dedup is the only gate
    assert(s1.outputDocs == s1.keptQuality)
    val (out2, s2) = CurateMain.run(spark, corpus, None, args)
    assert(s1 == s2)
    assert(out1.orderBy("doc_id").collect().toSeq == out2.orderBy("doc_id").collect().toSeq)
  }
}
