package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs the headline extraction pipeline
  * plus representative queries on SPARK_GRAFT_SF_DIR at
  * local[SPARK_GRAFT_CPUS], printing ONE JSON line.
  *
  * The headline metric is the north rule's: documents/sec over the fused
  * extraction stage. Scaling efficiency is evidenced by running this main
  * at two parallelism levels (e.g. SPARK_GRAFT_CPUS=8 vs 32) on the same
  * input — see BENCH.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "20").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // deterministic salting instead of AQE skew rewrites (BASELINE.json:6)
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      // partition counts are sized explicitly; don't let AQE re-coalesce
      // the CPU-bound stages onto fewer cores
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // headline: fused extraction over the replicated corpus.
    // Methodology: the SAME physical plan is executed `warmups` times
    // untimed (HotSpot needs 2-3 full passes before the row pipeline is
    // fully compiled — measured 89s -> 1.9s on identical executions), then
    // `reps` timed runs; report the median.
    val pages = graft.pages.SyntheticPages.pagesReplicated(spark, sfDir, replicate)
    val nDocs = pages.count()
    val extractDf = graft.pipeline.ExtractJob.extract(spark, pages,
      graft.pipeline.ExtractJob.Config(buckets = cpus.toInt * 4))
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "9").toInt
    // adaptive warmup: run a small same-shaped corpus (codegen classes are
    // cache-keyed by source, so plan shape — not size — must match) until
    // the BEST observed time stops improving. The round-1 rule
    // (`t > prev*0.85`) declared convergence on two consecutive SLOW runs,
    // so under the JIT warm-up lottery (BENCH.md) the driver measured the
    // un-warmed path, 14x below steady state. Now convergence requires 3
    // consecutive runs that fail to improve on the best by >5%.
    val warmDf = graft.pipeline.ExtractJob.extract(spark,
      graft.pages.SyntheticPages.pagesReplicated(spark, sfDir, math.max(replicate / 8, 2)),
      graft.pipeline.ExtractJob.Config(buckets = cpus.toInt * 4))
    var best = Double.MaxValue
    var sinceImproved = 0
    var w = 0
    while (w < 15 && sinceImproved < 3) {
      val t = time(warmDf.count())
      if (t < best * 0.95) { best = t; sinceImproved = 0 } else sinceImproved += 1
      w += 1
    }
    val warmState = if (sinceImproved >= 3) "converged" else "CAP REACHED (not converged)"
    System.err.println(f"[bench] warmup $warmState after $w runs (best $best%.2fs)")
    extractDf.count()
    // dedicated back-to-back reps measure the early window; the round-robin
    // passes below add more measurements of the SAME plan spread across the
    // whole bench window, and the headline min draws from both (see the
    // min-of-N rationale at the bottom)
    val times = (1 to reps).map(_ => time(extractDf.count()))
    System.err.println(s"[bench] extract rep times (exec order): ${times.map(t => f"$t%.2f").mkString(", ")}")

    // representative operator timings (forced via toRdd below — every
    // output row materializes); SPARK_GRAFT_BENCH_MODE=extract skips them
    // (scaling-study mode)
    val extractOnly = sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("extract")
    // q_minhash_verify_exact is deliberately absent: the brute-force
    // all-pairs verify is a correctness oracle, quadratic by design
    val queryNames = if (extractOnly) Seq.empty[String] else Seq(
      "extract_pages", "extract_tables_flat", "extract_flat_counts",
      "extract_mapped", "merge_agreement",
      "tablestats_global", "tablestats_per_doc", "q1_agg", "q_window_events",
      "q_anti_join_resume", "q_join_agg_nation", "q_token_count", "q_token_count_bpe",
      "q_quality_score", "q_lang_id", "q_fingerprint_poly",
      "q_fingerprint_winnow", "q_merged_column_agreement",
      "q_repetition_signals", "q_dup_clusters", "q_curation_pipeline",
      "q_url_canonical", "q_host_cap", "q_skew_cap_curation", "extract_main_text",
      "q_stratified_sample", "q_token_budget_cap", "q_token_freq_quality",
      "q_pii_redact", "q_chunk_windows", "q_ivf_cell_stats", "q_multimodal_resize",
      "q_exact_dedup_md5", "q_dedup_incremental", "q_dedup_incremental_bloom",
      "q_decontaminate", "q_dup_spans", "q_dup_span_coverage", "q_span_decontam_chain", "q_curate_replay", "q_extract_curate",
      "q_line_dedup", "q_minhash_dedup", "q_simhash_dedup",
      "q_cosine_near_dup", "q_ann_topk", "q_ann_ivf", "q_multimodal_meta",
      "q_multimodal_ppm")
    // Each query is measured as min across 3 INTERLEAVED passes: the full
    // query list runs round-robin three times (pass 1 absorbs each shape's
    // codegen + JIT compile; steady state is the regime a long-running
    // 100 TB job operates in). Interleaving matters on this box: hypervisor
    // steal episodes last minutes (measured 10+), so 3 back-to-back reps of
    // one query all land inside a single episode and min-of-3 still reports
    // the storm — the round-5 driver window did exactly that (a 101 s
    // reading on a 7 s stressor, with the regression block time-contiguous
    // in execution order). Spreading a query's reps across the whole bench
    // window means one episode can inflate at most one pass of it.
    val stressorThunks: Seq[(String, () => Unit)] = if (extractOnly) Seq.empty else {
      // skew stressor (VERDICT r3 ask #8): the per-host cap + curation
      // chain over a REPLICATED corpus where one planted mega-host carries
      // ~33% of all rows — the measured lock on the round-3 skew-proofing
      // (capPerHost's phase-1 map-side prune + the curation min_by
      // partials). Replication multiplies the row count `replicate`-fold
      // with unique doc_ids, so the hot host's raw row count dwarfs the
      // cap and the prune is what keeps the window shuffle bounded.
      val d = graft.core.DfCache.get(spark, s"$sfDir/documents.parquet")(
        spark.read.parquet(s"$sfDir/documents.parquet"))
      val repl = d.select(col("doc_id"), col("text"))
        .withColumn("rep", explode(sequence(lit(0), lit(replicate - 1))))
        .select((col("doc_id") * replicate + col("rep")).as("doc_id"), col("text"))
      val host = when(col("doc_id") % 3 === 0, lit("mega.example.org"))
        .otherwise(concat(lit("h"), (col("doc_id") % 20).cast("string"), lit(".example.org")))
      val chain = graft.ops.Curation.curate(spark,
        graft.ops.Salting.capPerHost(
          repl.withColumn("host", host), col("host"), col("doc_id"), cap = 100)
          .select(col("doc_id"), col("text")))
      // dedup-family scale stressor (VERDICT r4 ask #2): minhash + simhash
      // over the same replicate-multiplied corpus (sf0.1 × 20 = 100k docs)
      // plus the planted near-dup twins, at the PRODUCTION maxBucket=64
      // (the registered oracle queries deliberately run 1024 for exact
      // recall). Every text appears `replicate` times under distinct ids,
      // so each band bucket is genuinely hot (~replicate members) and the
      // measured cost is the bucketed pairing + skew cap — the at-scale
      // shape — rather than the steal-dominated sf0.1 driver windows.
      val planted = graft.ops.Dedup.withPlantedNearDups(repl)
      val minhash = graft.ops.Dedup.minhashLshPairs(spark, planted)
      val simhash = graft.ops.Dedup.simhashPairs(spark, planted)
      Seq(
        "skew_cap_curation_repl" -> (() => { chain.count(); () }),
        "minhash_dedup_repl" -> (() => { minhash.count(); () }),
        "simhash_dedup_repl" -> (() => { simhash.count(); () }))
    }
    // force via the already-optimized physical plan, NOT .count(): the
    // count rewrite lets Catalyst eliminate outer-join subtrees whose
    // right side has unique (aggregated) keys — row count is provably
    // unchanged, so e.g. q_dup_span_coverage's and q_line_dedup's entire
    // expensive left-hand computation was dropped and the bench measured
    // a token-count's worth of work. toRdd materializes every output row
    // of the plan as registered (and shaves the count agg scaffolding the
    // other queries were paying — numbers move slightly vs rounds <= 6).
    val queryThunks: Seq[(String, () => Unit)] = queryNames.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        name -> (() => { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); () })
      }
    } ++ stressorThunks ++
      // the headline extract shape joins the round-robin too, so its min
      // also draws from measurements spread across the whole window
      Seq("extract" -> (() => { extractDf.count(); () }))

    val passCount = 3
    val vectors = scala.collection.mutable.LinkedHashMap(
      queryThunks.map { case (n, _) => n -> scala.collection.mutable.ArrayBuffer.empty[Double] }: _*)
    for (_ <- 1 to passCount; (name, thunk) <- queryThunks)
      vectors(name) += time(thunk())
    val timings = queryThunks.collect {
      case (name, _) if name != "extract" => name -> vectors(name).min
    }

    // MIN-of-N is the headline: this VM shows hypervisor steal, and
    // identical fully-warm plans measured 1.06s vs 36.07s in ONE JVM —
    // the minimum measures the engine, the median measures the neighbor.
    // The median is still emitted for transparency. The extract vector
    // combines the dedicated reps with the round-robin passes, so the min
    // draws from two separated time windows.
    val allExtract = times ++ vectors.get("extract").map(_.toSeq).getOrElse(Seq.empty)
    val tExtract = allExtract.min
    val tExtractMedian = allExtract.sorted.apply(allExtract.length / 2)
    val docsPerSec = nDocs / tExtract
    // trimmed min: min of the reps EXCLUDING the single best one — robust
    // to one anomalously good window, while min-of-N stays the documented
    // headline under measured hypervisor steal (BENCH.md).
    val tExtractTrimmedMin = if (allExtract.length > 1) allExtract.sorted.apply(1) else allExtract.min

    // Locale.ROOT: the f-interpolator uses the JVM default locale; a
    // comma-decimal locale would make every number invalid JSON.
    def jn(d: Double, prec: Int): String =
      String.format(java.util.Locale.ROOT, "%." + prec + "f", Double.box(d))
    val qs = (Seq("extract_docs_per_sec" -> docsPerSec, "extract_sec" -> tExtract,
      "extract_sec_median" -> tExtractMedian,
      "extract_sec_trimmed_min" -> tExtractTrimmedMin) ++ timings)
      .map { case (k, v) => "\"" + k + "\":" + jn(v, 4) }
      .mkString("{", ",", "}")
    val total = tExtract + timings.map(_._2).sum
    val repsJson = allExtract.map(t => jn(t, 4)).mkString("[", ",", "]")
    // raw per-query pass vectors (execution order = pass order): lets a
    // reader distinguish a genuine regression (all passes slow) from one
    // steal episode (a single inflated pass)
    val qreps = vectors.map { case (n, v) =>
      "\"" + n + "\":" + v.map(t => jn(t, 4)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // SCHEMA STABILITY (round-2 advice): `value` is documents/sec — the
    // round-1 meaning — and `schema` versions the layout so a consumer
    // comparing across rounds can detect format changes instead of
    // silently misreading. min/median/trimmed-min + the raw rep vectors are
    // all emitted explicitly. graft-bench/4 adds `queries_reps` (interleaved
    // round-robin passes) on top of /3.
    val json = s"""{"schema":"graft-bench/4","metric":"documents/sec (extracted pages)","value":${jn(docsPerSec, 2)},"unit":"docs/sec","docs_per_sec":${jn(docsPerSec, 2)},"total_sec":${jn(total, 2)},"extract_reps_sec":$repsJson,"n_docs":$nDocs,"cpus":$cpus,"queries":$qs,"queries_reps":$qreps,"sf":"$sfDir"}"""
    // belt and braces for the driver's parser: the file copy survives any
    // stdout wrapping (round 1's [info]-prefixed line parsed as null)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json + "\n")
    catch { case _: Exception => }
    spark.stop()
    // final raw stdout line (outputStrategy := StdoutOutput keeps it unprefixed)
    println(json)
  }
}
