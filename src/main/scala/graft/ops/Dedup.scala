package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * groupBy), MinHash+LSH, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design:
  *  - exact dedup is a single hash-shuffle on md5(text) with map-side
  *    partial aggregation;
  *  - MinHash signatures are computed narrowly (one pass per doc, pure
  *    column expressions — no UDF), then ONLY (band, hash) pairs shuffle:
  *    ~bands×8 bytes per doc instead of the text;
  *  - candidate pairs come from bucket-local self-pairing (collect_list
  *    within an LSH bucket; buckets are tiny by construction), then exact
  *    Jaccard verification joins the shingle sets back by doc id — the
  *    full text is never shuffled.
  */
object Dedup {

  /** Exact dedup (J7/S12 filenorm semantics): group by content hash, keep
    * the minimum key as representative, count members.
    */
  def exactDedup(docs: DataFrame, text: Column, key: Column): DataFrame =
    docs.groupBy(md5(text).as("content_md5"))
      .agg(min(key).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Deterministic 64-bit mix for MinHash permutations (xxhash64 seeded by
    * permutation index via string concat keeps it a pure Column expr).
    */
  private def hashWithSeed(c: Column, seed: Int): Column =
    xxhash64(concat(lit(s"p$seed:"), c))

  /** MinHash signature: array of `numHashes` minima over the shingle set. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i => array_min(transform(shingles, s => hashWithSeed(s, i)))): _*)

  final case class LshConfig(numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3, jaccardThreshold: Double = 0.5)

  /** Word-shingle set per doc (distinct n-grams, lowercased). */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(Shingles.tokenNGrams(split(lower(trim(text)), "\\s+"), n))

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * Input must have columns (doc_id, text). Output: (a, b, jaccard) with
    * a < b, jaccard >= threshold.
    */
  def minhashLshPairs(spark: SparkSession, docs: DataFrame, cfg: LshConfig = LshConfig()): DataFrame = {
    val rowsPerBand = cfg.numHashes / cfg.bands
    val withShingles = docs.select(
      col("doc_id"), shingleSet(col("text"), cfg.shingleSize).as("shingles"))
    val withSig = withShingles.select(
      col("doc_id"), col("shingles"),
      minhashSignature(col("shingles"), cfg.numHashes).as("sig"))

    // explode into (band, bandHash) — the ONLY shuffled payload
    val banded = withSig.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(cfg.bands - 1)), b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b.cast("string"))))
      ).as(Seq("band", "band_hash")))

    // bucket-local candidate pairing (buckets are small by construction)
    val candidates = banded
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsOf(col("ids"))).as("pair"))
      .select(col("pair._1").as("a"), col("pair._2").as("b"))
      .distinct()

    // exact verification: join shingle sets back by id, compute true Jaccard
    val sa = withShingles.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = withShingles.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** All ordered pairs (x,y) x<y from an id array, as a Column expression. */
  private def pairsOf(ids: Column): Column = {
    val sorted = array_sort(ids)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y => struct(x.as("_1"), y.as("_2")))))
  }

  /** SimHash: 64-bit signature where bit k is the sign of the sum over
    * token-hash bits — expressed with bit ops over the token array.
    * Documents within small hamming distance are near-duplicates.
    */
  def simhash(text: Column): Column = {
    val tokens = array_distinct(split(lower(trim(text)), "\\s+"))
    val hashes = transform(tokens, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidates at hamming distance <= 3 via the 4-band
    * exact-match trick (any pair within distance 3 shares at least one of
    * 4 16-bit bands).
    */
  def simhashPairs(docs: DataFrame, text: Column): DataFrame = {
    val sigs = docs.select(col("doc_id"), simhash(text).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "band_val")))
    val candidates = banded.groupBy(col("band"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(memberPairs(col("members"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.sig_a").as("sig_a"), col("p.sig_b").as("sig_b"))
      .distinct()
    candidates
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("a"), col("b"), col("hamming"))
  }

  private def memberPairs(members: Column): Column = {
    val sorted = array_sort(members)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y =>
        struct(
          x.getField("doc_id").as("a"), y.getField("doc_id").as("b"),
          x.getField("sig").as("sig_a"), y.getField("sig").as("sig_b")))))
  }

  /** Deterministic near-duplicate corpus: every doc with doc_id % 10 == 0
    * gets a twin (id + 1000000) whose text drops the last 2 tokens — used
    * by the dedup demo queries so candidate sets are non-empty.
    */
  def withPlantedNearDups(docs: DataFrame): DataFrame = {
    val twins = docs.filter(col("doc_id") % 10 === 0).select(
      (col("doc_id") + 1000000).as("doc_id"),
      array_join(slice(split(col("text"), " "), lit(1),
        greatest(size(split(col("text"), " ")) - 2, lit(1))), " ").as("text"))
    docs.select(col("doc_id"), col("text")).union(twins)
  }
}
