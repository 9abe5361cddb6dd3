package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pass — the composition the individual
  * ops exist for: quality gate → repetitiveness gate → exact dedup with a
  * deterministic keeper. A user curating a crawl runs exactly this shape;
  * registering it whole also oracle-checks the ops COMPOSED (join keys,
  * filter order, keeper rule), not just in isolation.
  *
  * Scale notes: every stage input/output is scalar-width (doc_id + a few
  * longs) — the text is read once per signal pass and never shuffles. The
  * doc_id joins and the md5 keeper groupBy are the only wide edges, all on
  * narrow rows; dedup runs AFTER the cheap filters so the shuffle sees only
  * survivors.
  */
object Curation {

  final case class Config(
      /** keep docs with word-bigram repeat mass ≤ this (×1000 scale) */
      maxDupBigramX1000: Long = 100)

  /** Curate (doc_id, text) rows: quality_ok && low-repetition && first
    * (minimum doc_id) occurrence of each exact content hash. Returns
    * (doc_id, n_tokens, n_chars, dup_bigram_x1000) for the kept set.
    */
  def curate(spark: SparkSession, docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs, col("text"))
      .filter(col("quality_ok"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"))
    val rep = TextAnalysis.repetitionSignals(spark, docs)
      .filter(col("dup_bigram_x1000") <= cfg.maxDupBigramX1000)
      .select(col("doc_id"), col("dup_bigram_x1000"))
    val survivors = docs
      .select(col("doc_id"), md5(col("text")).as("content_md5"))
      .join(quality, "doc_id")
      .join(rep, "doc_id")
    // exact dedup among survivors: minimum doc_id per content hash wins
    val keep = survivors.groupBy(col("content_md5")).agg(min(col("doc_id")).as("doc_id"))
    survivors
      .join(keep, Seq("content_md5", "doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"), col("dup_bigram_x1000"))
  }

  /** Deterministic exact-duplicate planting (distinct from
    * [[Dedup.withPlantedNearDups]]'s NEAR dups): every doc with
    * doc_id % 17 == 0 gets a byte-identical twin at id + 2000000, so the
    * dedup stage of [[curate]] has real work on the no-duplicate synthetic
    * corpus. SQL-recomputable (a plain UNION ALL).
    */
  def withPlantedExactDups(docs: DataFrame): DataFrame = {
    val twins = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
    docs.select(col("doc_id"), col("text")).union(twins)
  }
}
