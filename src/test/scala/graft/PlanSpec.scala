package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan quality gates: the plans the engine relies on at 100 TB
  * must actually materialize — broadcast joins for dimensions, filter/column
  * pushdown into parquet, no shuffle in the narrow extraction stage, salted
  * two-phase aggregation shape.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("dimension joins broadcast (no shuffle join for nation/customer)") {
    val p = plan("q_join_agg_nation")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("filter pushdown reaches the parquet scan") {
    val p = plan("q_paper_filter")
    assert(p.contains("PushedFilters: [IsNotNull(source)"), p)
    // the rlike itself can't push, but the scan must prune columns
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"), p)
  }

  test("column pruning: token count reads only (doc_id, text)") {
    val p = plan("q_token_count")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("dup spans: shuffle budget — conditional input spread + gram df + doc window; span merge reuses the window exchange") {
    val p = plan("q_dup_spans")
    // Count REAL shuffle exchanges ("Exchange hashpartitioning"), not the
    // raw "Exchange" substring (r6 ADVICE: BroadcastExchange/ReusedExchange
    // made that count brittle). Budget: the conditional small-input spread
    // (appears twice pre-AQE — runtime exchange reuse collapses the copies
    // onto ONE scan, stage-profile-verified), the gram-df groupBy, and the
    // doc window; the span-merge groupBy reuses the window exchange. At
    // corpus scale the spread does not fire and the budget is 2.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 4, p)
    // the flag-back join must stay broadcast (dup grams are the sliver)
    assert(p.contains("BroadcastHashJoin"), p)
    // the spread fires at test scale (tiny input)
    assert(p.contains("REPARTITION_BY_COL"), p)
  }

  test("stratified sampling is a pure narrow filter: zero Exchange") {
    val p = plan("q_stratified_sample")
    assert(!p.contains("Exchange"), p)
  }

  test("token-budget cap: exactly one Exchange (the post-prune window shuffle)") {
    val p = plan("q_token_budget_cap")
    assert(p.split("Exchange").length - 1 == 1, p)
    assert(p.contains("Window"), p)
  }

  test("token-frequency quality: k-bounded vocab broadcast, no text on the wide edge") {
    val p = plan("q_token_freq_quality")
    // the top-k vocab reduces via TakeOrderedAndProject (driver state
    // k-bounded) and enters the per-doc agg as a broadcast hash join
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("extraction stage is narrow: no Exchange in the transform-only plan") {
    import spark.implicits._
    val pages = graft.pages.SyntheticPages.pages(spark, sfDir)
    val p = graft.pipeline.ExtractJob.extract(spark, pages)
      .queryExecution.executedPlan.toString
    // exactly ONE exchange: the deliberate tiny-source repartition inside the
    // synthetic generator; the extraction itself adds none
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("anti-join resumability uses a real anti join") {
    val p = plan("q_anti_join_resume")
    assert(p.contains("LeftAnti"), p)
  }

  test("no single-partition window in any registered query plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans an unpartitioned Window (all rows to ONE partition)")
    }
  }

  test("query construction runs no Spark jobs (no driver-side collects)") {
    // constructing every registered DataFrame must stay lazy; the ONLY
    // allowed action is ivfTopK's k-bounded centroid collect (fixed
    // numCentroids rows via TakeOrderedAndProject — the classic
    // broadcast-centroid IVF shape). q_dup_clusters is an inherently
    // iterative fixpoint (connected components) — its first construction
    // runs the iteration, but the result is memoized per (session, dir),
    // so the measured pass below sees zero jobs from it.
    // warm pass: first-touch parquet footer/schema planning jobs are
    // memoized (Queries.tbl / SyntheticPages.docsDf) — not data reads
    SparkEntry.queries.foreach { case (_, fn) => fn(spark, sfDir) }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries.foreach { case (_, fn) => fn(spark, sfDir) }
      Thread.sleep(2000) // listener bus delivery is async
      assert(jobs.get() <= 1, s"${jobs.get()} Spark jobs ran during query construction")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("curation pass is one corpus scan + one partial-agg shuffle (no window)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = graft.ops.Curation.curate(spark, docs)
      .queryExecution.executedPlan.toString
    assert(p.split("Scan parquet").length - 1 == 1, p) // text read ONCE
    assert(p.split("Exchange").length - 1 == 1, p)     // only the md5 keeper shuffle
    // min_by keeper: partial aggregation BEFORE the exchange (struct-valued
    // min_by plans as SortAggregate) — a hot content hash shuffles one
    // partial row per task, never a window's full row funnel
    assert(p.contains("partial_min_by"), p)
    assert(p.split("Aggregate").length - 1 >= 2, p)
    assert(!p.contains("Window"), p)
  }

  test("extract_mapped broadcast-joins the sidecar (no collect, real BHJ)") {
    val p = plan("extract_mapped")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("salted host stats produce exactly the unsalted result") {
    val salted = SparkEntry.queries("q_host_stats_salted")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val direct = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("host",
        when(col("doc_id") % 3 === 0, lit("mega.example.org"))
          .otherwise(concat(lit("h"), (col("doc_id") % 20).cast("string"), lit(".example.org"))))
      .groupBy("host").agg(count(lit(1)).as("n"), sum("n_chars").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.sameElements(direct))
    // and the plan has the two-phase shape (two aggregate exchanges)
    val p = plan("q_host_stats_salted")
    assert(p.split("HashAggregate").length - 1 >= 4, p) // partial+final x2 levels
  }
}
