package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Cli
import graft.ops.{Curation, Decontaminate, DupSpans, LineDedup}

/** spark-submit entrypoint for the corpus-curation pipeline — the
  * training-data hygiene chain composed from the independently-oracled
  * operators, in the order the published recipes run them:
  *
  *  1. repeated-line strip ([[graft.ops.LineDedup]]) — boilerplate lines
  *     removed, text rebuilt; fully-boilerplate docs dropped;
  *  2. quality + repetition gates and exact dedup ([[graft.ops.Curation]]);
  *  3. duplicated-substring coverage gate ([[graft.ops.DupSpans]]) — docs
  *     over `--max-dup-permille` duplicated tokens dropped;
  *  4. benchmark decontamination ([[graft.ops.Decontaminate]]) when
  *     `--benchmark` is given.
  *
  * {{{
  * spark-submit --class graft.CurateMain graft.jar \
  *   --input  /data/documents       # parquet: (doc_id, text, ...extras ok)
  *   --out    /data/curated_run     # output root (curated/ parquet)
  *   [--benchmark /data/eval_items] # parquet with a `text` column
  *   [--gram-k 8]                   # n-gram size for span gate + decontam
  *   [--line-min-df 2]              # line df threshold for the strip
  *   [--max-dup-permille 500]       # span-coverage gate (dup_tokens/n_tokens)
  *   [--skip-line-dedup] [--skip-span-gate]
  * }}}
  *
  * Scale shape: every gate runs on a SCALAR stream — the quality/dedup,
  * span-coverage and contamination stages each reduce to a (doc_id) keep
  * or drop set, those sets intersect as 8-byte-row joins, and the corpus
  * text joins the final keep set exactly once (left semi). The line strip
  * transforms text in place (its own digests shuffle, not the text), so
  * document text crosses the wire at most twice end to end regardless of
  * how many gates are enabled. Per-stage counts in the final stats line
  * cost one scalar job each.
  *
  * Cluster topology belongs to spark-submit flags, not this code; the
  * session is `getOrCreate()` with no master override.
  *
  * Exit code 0 and one final JSON line on stdout:
  * `{"input_docs":N,"after_line_strip":L,"kept_quality":Q,"kept_span_gate":S,"contaminated":C,"output_docs":O,"wall_sec":W}`
  * — a skipped stage reports -1 (never conflated with a stage that ran and
  * matched zero docs); null-text rows are dropped at intake and excluded
  * from input_docs.
  */
object CurateMain {

  final case class Args(
      input: Option[String] = None,
      out: Option[String] = None,
      benchmark: Option[String] = None,
      gramK: Int = 8,
      lineMinDf: Long = 2L,
      maxDupPermille: Int = 500,
      skipLineDedup: Boolean = false,
      skipSpanGate: Boolean = false)

  final case class Stats(
      inputDocs: Long,
      afterLineStrip: Long,
      keptQuality: Long,
      keptSpanGate: Long,
      contaminated: Long,
      outputDocs: Long)

  private val valueFlags = Set(
    "--input", "--out", "--benchmark", "--gram-k", "--line-min-df", "--max-dup-permille")

  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil => acc
    case "--input" :: v :: rest => parse(rest, acc.copy(input = Some(v)))
    case "--out" :: v :: rest => parse(rest, acc.copy(out = Some(v)))
    case "--benchmark" :: v :: rest => parse(rest, acc.copy(benchmark = Some(v)))
    case "--gram-k" :: v :: rest =>
      parse(rest, acc.copy(gramK = Cli.positiveInt("--gram-k", v)))
    case "--line-min-df" :: v :: rest =>
      val d = Cli.positiveInt("--line-min-df", v)
      if (d < 2) throw new IllegalArgumentException(
        s"--line-min-df below 2 would strip every line (df >= 1 always); got: $v")
      parse(rest, acc.copy(lineMinDf = d.toLong))
    case "--max-dup-permille" :: v :: rest =>
      val p = Cli.positiveInt("--max-dup-permille", v)
      if (p > 1000) throw new IllegalArgumentException(
        s"--max-dup-permille is a fraction of 1000, got: $v")
      parse(rest, acc.copy(maxDupPermille = p))
    case "--skip-line-dedup" :: rest => parse(rest, acc.copy(skipLineDedup = true))
    case "--skip-span-gate" :: rest => parse(rest, acc.copy(skipSpanGate = true))
    case flag :: Nil if valueFlags(flag) =>
      throw new IllegalArgumentException(s"$flag requires a value")
    case other :: _ => throw new IllegalArgumentException(s"unknown arg: $other")
  }

  /** The pipeline itself, IO-free for testability: returns the curated
    * (doc_id, text) frame plus per-stage counts. `benchmark` needs a
    * `text` column. With `computeStats = false` the call is construction-
    * pure — no Spark jobs, no persists, all stats -1 — so the chain can be
    * registered as a lazily-built query (the driver's oracle replay).
    *
    * CACHE LIFETIME (computeStats = true): up to 4 intermediate frames are
    * persisted MEMORY_AND_DISK and intentionally NOT unpersisted here —
    * the returned frame still depends on them, so releasing them inside
    * this method would force the caller's write to recompute every stage.
    * The one-shot CLI main frees them with the session; a long-lived
    * session calling run() repeatedly should unpersist after consuming the
    * result (`spark.catalog.clearCache()` or track/unpersist explicitly)
    * or cached blocks accumulate until eviction pressure.
    */
  def run(spark: SparkSession, docs: DataFrame, benchmark: Option[DataFrame],
      args: Args, computeStats: Boolean = true): (DataFrame, Stats) = {
    // null text is dropped at intake (counted out of input_docs) so both
    // the skip-line-dedup path (typed signal pass would NPE) and the strip
    // path (posexplode drops the row silently) see the same corpus
    val input0 = docs.select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    // The strip consumes `input` twice (line-digest side + rebuild join
    // side). When the input is itself an expensive subtree — the
    // end-to-end path feeds the whole extraction pipeline in here — the
    // construction-pure mode pins one exchange above it so both strip
    // sides share a single evaluation; a plain scan passes through
    // (re-scanning is cheaper than shuffling; the ops' own Spread guard
    // owns scan parallelism). The persisted mode needs no pin.
    // The explicit doc_id not-null filter (construction-pure mode only) is
    // a PLAN-SHAPE pin, not a semantic change: rows with a null doc_id can
    // never reach the output anyway (the final keep-set semi-join on
    // doc_id drops them), but without the explicit filter the optimizer
    // infers isnotnull(doc_id) from the keep-set joins on SOME branches of
    // the shared subtree and not others, the branch canonical forms stop
    // matching, and AQE materializes the pinned exchange (and everything
    // under it, including the extraction feed) once per variant instead of
    // once — observed as two full extraction stages per action.
    val input =
      if (computeStats) input0
      else graft.ops.Spread.shareIfComplex(input0.filter(col("doc_id").isNotNull))
    // every gate is a scalar (doc_id) stream; text joins once at the end.
    // Each gate frame (and the stripped corpus feeding them all) is
    // persisted so its subtree executes exactly once — serving both its
    // stat count and the keep-set joins — instead of re-running the
    // strip/span/decontamination shuffles per consumer. MEMORY_AND_DISK:
    // at corpus scale the text spills rather than OOMs (a multi-job
    // production pipeline would write the stripped corpus as an
    // intermediate table instead); blocks are freed with the session — a
    // long-lived session embedding this call should unpersist via
    // spark.catalog.clearCache().
    def cached(df: DataFrame): DataFrame =
      if (computeStats) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    // construction-pure analog of the persist (guide §2.4 "share one
    // exchange"): the stripped corpus feeds FOUR consumers (quality gate,
    // span gate, decontamination, final semi-join). With no persist, each
    // consumer would re-evaluate the whole strip subtree — including the
    // upstream extraction when this chain runs end-to-end — so the
    // computeStats=false path pins one hash exchange on doc_id that
    // exchange reuse collapses the consumers onto: the strip (and
    // everything below it) executes exactly once per action, at the cost
    // of one (doc_id, text) shuffle. The persisted path needs no pin —
    // consumers hit the cached blocks.
    def shared(df: DataFrame): DataFrame =
      if (computeStats) df else df.repartition(col("doc_id"))
    val lined =
      if (args.skipLineDedup) shared(input)
      else shared(cached(LineDedup.stripRepeatedLines(input, args.lineMinDf)
        .filter(col("text") =!= "")))
    val keepQuality = cached(Curation.curate(spark, lined).select(col("doc_id")))
    val keepSpan =
      if (args.skipSpanGate) None
      else Some(cached(DupSpans.dupCoverage(spark, lined, args.gramK)
        .filter(col("dup_tokens") * 1000 <= col("n_tokens") * args.maxDupPermille)
        .select(col("doc_id"))))
    val dropContam = benchmark.map(b =>
      cached(Decontaminate.contaminationHits(spark, lined, b, args.gramK)
        .select(col("doc_id"))))

    val keep = dropContam.foldLeft(
      keepSpan.foldLeft(keepQuality)((k, s) => k.join(s, Seq("doc_id"))))(
      (k, d) => k.join(d, Seq("doc_id"), "left_anti"))
    val out = lined.join(keep, Seq("doc_id"), "left_semi")

    // -1 = stage skipped (vs a legitimate 0 from a stage that ran)
    val stats =
      if (!computeStats) Stats(-1L, -1L, -1L, -1L, -1L, -1L)
      else Stats(
        inputDocs = input.count(),
        afterLineStrip = if (args.skipLineDedup) -1L else lined.count(),
        keptQuality = keepQuality.count(),
        keptSpanGate = keepSpan.map(_.count()).getOrElse(-1L),
        contaminated = dropContam.map(_.count()).getOrElse(-1L),
        outputDocs = out.count())
    (out, stats)
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList)
    val input = args.input.getOrElse(throw new IllegalArgumentException("--input is required"))
    val out = args.out.getOrElse(throw new IllegalArgumentException("--out is required"))

    val spark = SparkSession.builder().appName("graft-curate").getOrCreate()
    // by-name projection: tolerate extra columns, fail fast on missing
    val docs = spark.read.parquet(input).select("doc_id", "text")
    val bench = args.benchmark.map(p => spark.read.parquet(p).select("text"))

    val t0 = System.nanoTime()
    val (curated, stats) = run(spark, docs, bench, args)
    curated.write.mode("overwrite").parquet(s"$out/curated")
    val wallStr = Cli.jsonNum((System.nanoTime() - t0) / 1e9)
    println(
      s"""{"input_docs":${stats.inputDocs},"after_line_strip":${stats.afterLineStrip},"kept_quality":${stats.keptQuality},"kept_span_gate":${stats.keptSpanGate},"contaminated":${stats.contaminated},"output_docs":${stats.outputDocs},"wall_sec":$wallStr}""")
    spark.stop()
  }
}
