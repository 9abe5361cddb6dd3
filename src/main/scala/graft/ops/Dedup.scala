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

  /** maxBucket caps LSH bucket size: buckets above it are degenerate
    * (boilerplate/low-information members) and would otherwise enumerate
    * O(n²) pairs — the standard skew guard for LSH dedup at scale.
    */
  final case class LshConfig(numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      jaccardThreshold: Double = 0.5, maxBucket: Int = 64)

  /** Word-shingle set per doc (distinct n-grams, lowercased) as a Column.
    *
    * WARNING (measured, thread-dump verified): Catalyst higher-order
    * functions re-evaluate INLINED child expressions once per array
    * element — `split(text)` inside the transform lambda makes this
    * quadratic in token count, and any computed `text` column nests
    * further. Use the typed `shingleRows` for anything hot; this stays for
    * small-column use and as the semantic reference.
    */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(Shingles.tokenNGrams(split(lower(trim(text)), "\\s+"), n))

  /** Typed (doc_id, shingles) — one linear pass per document. Input is
    * [[Spread.spread]]-guarded (a tiny input otherwise runs this CPU-heavy
    * pass on 1-2 scan tasks); note the spread projection matches
    * [[bandHashRows]]', so minhashLshPairs' two passes over the same docs
    * share one reused exchange when it fires.
    */
  def shingleRows(spark: SparkSession, docs: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    Spread.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, shinglesOf(text, n)) })
      .toDF("doc_id", "shingles")
  }

  // ---- typed fast path: one Scala pass per doc computes all band hashes.
  // Measured: the pure-Column formulation (32 min-aggregates as HOFs) is
  // 10-100x slower because higher-order functions are interpreted and
  // CollapseProject duplicates the shingle build into every aggregate —
  // this is the documented case for dropping to mapPartitions.

  /** Deterministic 64-bit string hash (FNV-1a then avalanche) — plain Scala. */
  def hash64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h ^= (h >>> 32); h *= 0xd6e8feb86659fd93L; h ^= (h >>> 32)
    h
  }

  /** Streamed [[hash64]] over the gram `tokens(from until from+len)` joined
    * by a single space — byte-for-byte the same char sequence as hashing
    * the materialized `mkString(" ")` gram, with zero gram-string
    * allocation (the same streaming trick as DupSpans.gramDigestRows).
    */
  private def gramHash64(tokens: Array[String], from: Int, len: Int, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var t = from
    val end = from + len
    while (t < end) {
      if (t > from) { h ^= ' '.toLong; h *= 0x100000001b3L }
      val s = tokens(t)
      var i = 0
      while (i < s.length) {
        h ^= s.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      t += 1
    }
    h ^= (h >>> 32); h *= 0xd6e8feb86659fd93L; h ^= (h >>> 32)
    h
  }

  /** The normalized token array [[shinglesOf]] shingles over (SQL-trim,
    * ROOT lowercase, whitespace split, empties dropped).
    */
  private def shingleTokens(text: String): Array[String] =
    TextAnalysis.sqlTrim(text).toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)

  /** Scala-side shingle set (must mirror shingleSet's Column semantics).
    * Trims with SQL-trim (spaces ONLY — Java String.trim also strips control
    * chars ≤ U+0020, which neither Spark SQL `trim` nor the DuckDB oracles
    * do; on a text starting with '\n' the Java-trim variant hash-diverged
    * from every cross-engine shingle oracle).
    */
  def shinglesOf(text: String, n: Int): Array[String] =
    shinglesOfTokens(shingleTokens(text), n)

  /** [[shinglesOf]] over already-normalized (trimmed, lowercased,
    * whitespace-split) tokens — for callers that computed the token array
    * anyway (avoids re-normalizing the raw text on hot paths).
    */
  def shinglesOfTokens(tokens: Array[String], n: Int): Array[String] = {
    val grams =
      if (tokens.length < n) Array(tokens.mkString(" "))
      else Array.tabulate(tokens.length - n + 1)(i => tokens.slice(i, i + n).mkString(" "))
    grams.distinct
  }

  /** (doc_id, band, band_hash) rows via a single fused pass per document.
    *
    * Signature values are EXACTLY `hash64(gram, i * phi)` for every
    * permutation i — the hash family is effectively frozen by the
    * scale-pinned recall==exact oracles (q_minhash_dedup,
    * q_near_dup_keeper): a "one base hash + cheap per-permutation mix"
    * rewrite was tried and dropped ONE true pair at the driver's sf0.01
    * verify scale (80 vs 81 oracle rows), so the per-gram cost floor is the
    * numHashes re-seeded char folds. What this pass does save, value-
    * identically: the gram strings are never materialized (the
    * `numHashes` FNV states stream the window's token chars directly —
    * same char sequence as the mkString'd gram, like DupSpans'
    * digest pass), and the former `.distinct` is dropped outright (min
    * over a multiset equals min over its set, so duplicate grams cannot
    * change a signature).
    */
  def bandHashRows(spark: SparkSession, docs: DataFrame, cfg: LshConfig): DataFrame = {
    import spark.implicits._
    val rowsPerBand = cfg.numHashes / cfg.bands
    Spread.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { it =>
      val numH = cfg.numHashes
      val states = new Array[Long](numH)
      it.flatMap { case (docId, text) =>
        val tokens = shingleTokens(text)
        val n = cfg.shingleSize
        val mins = Array.fill(numH)(Long.MaxValue)
        // fold the gram tokens(from until from+len) joined by ' ' into all
        // numH seeded FNV states, then avalanche + min-update each
        @inline def vote(from: Int, len: Int): Unit = {
          var i = 0
          while (i < numH) { states(i) = 0xcbf29ce484222325L ^ (i * 0x9E3779B97F4A7C15L); i += 1 }
          val end = from + len
          var t = from
          while (t < end) {
            if (t > from) {
              var j = 0
              while (j < numH) { states(j) = (states(j) ^ ' '.toLong) * 0x100000001b3L; j += 1 }
            }
            val s = tokens(t)
            var ci = 0
            while (ci < s.length) {
              val c = s.charAt(ci).toLong
              var j = 0
              while (j < numH) { states(j) = (states(j) ^ c) * 0x100000001b3L; j += 1 }
              ci += 1
            }
            t += 1
          }
          var k = 0
          while (k < numH) {
            var h = states(k)
            h ^= (h >>> 32); h *= 0xd6e8feb86659fd93L; h ^= (h >>> 32)
            if (h < mins(k)) mins(k) = h
            k += 1
          }
        }
        if (tokens.length < n) vote(0, tokens.length)
        else {
          var st = 0
          val last = tokens.length - n
          while (st <= last) { vote(st, n); st += 1 }
        }
        (0 until cfg.bands).iterator.map { b =>
          var h = 0xcbf29ce484222325L ^ b.toLong
          var i = b * rowsPerBand
          while (i < (b + 1) * rowsPerBand) {
            h ^= mins(i); h *= 0x100000001b3L
            i += 1
          }
          (docId, b, h)
        }
      }
    }.toDF("doc_id", "band", "band_hash")
  }

  /** Candidate pairs from LSH buckets (bucket-local pairing + skew cap).
    * Pair emission is a typed flatMap over the bucket id lists — the former
    * Column form (array_sort + nested transform + flatten) ran INTERPRETED
    * per bucket element (HOFs don't participate in whole-stage codegen),
    * which at the replicated-corpus scale emits millions of pair structs
    * through lambda evaluation. Same pair set: ids sorted ascending, all
    * i<j pairs.
    */
  def candidatesOf(banded: DataFrame, cfg: LshConfig): DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= cfg.maxBucket)
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val s = ids.toArray
        java.util.Arrays.sort(s)
        for {
          i <- s.indices.iterator.take(s.length - 1)
          j <- (i + 1 until s.length).iterator
        } yield (s(i), s(j))
      }
      .toDF("a", "b")
      .distinct()
  }

  /** Exact-Jaccard verification: join shingle sets back by doc id. */
  def verifyPairs(withShingles: DataFrame, candidates: DataFrame, cfg: LshConfig): DataFrame = {
    val sa = withShingles.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = withShingles.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    candidates.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** Typed (doc_id, shingle 64-bit hashes) — the verify-stage twin of
    * [[shingleRows]] (guide §2.3 "shuffle keys and metadata instead of
    * payloads"): the exact-Jaccard join only needs set intersection/union
    * SIZES, which are preserved under an injective-in-practice 64-bit hash
    * of each distinct shingle — 8 bytes per gram cross the verify shuffles
    * instead of the gram text (~2.5× fewer bytes, and long comparisons
    * instead of string). A Jaccard value could shift only on a 64-bit
    * collision INSIDE one pair's union (≲ 10³ grams → P ≈ 10⁶/2⁶⁵ per
    * pair); the corpus-scale expectation stays ≪ 1 pair.
    */
  def shingleHashRows(spark: SparkSession, docs: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    Spread.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // Streamed [[gramHash64]] produces byte-identical values to
        // hash64(gram.mkString, seed) with zero gram-string allocation;
        // dedup is by hash value (sorted) instead of by gram string —
        // exactly equivalent downstream, because the verify join consumes
        // these arrays only through array_intersect/array_union SIZES
        // (set semantics: order- and duplicate-insensitive).
        val tokens = shingleTokens(text)
        val hs =
          if (tokens.length < n) Array(gramHash64(tokens, 0, tokens.length, 0x5EED5EED5EEDL))
          else {
            val out = new Array[Long](tokens.length - n + 1)
            var st = 0
            while (st < out.length) {
              out(st) = gramHash64(tokens, st, n, 0x5EED5EED5EEDL)
              st += 1
            }
            java.util.Arrays.sort(out)
            var w = 0
            var r = 1
            while (r < out.length) {
              if (out(r) != out(w)) { w += 1; out(w) = out(r) }
              r += 1
            }
            if (w + 1 == out.length) out else java.util.Arrays.copyOf(out, w + 1)
          }
        (id, hs)
      })
      .toDF("doc_id", "shingles")
  }

  /** MinHash+LSH near-duplicate pairs with exact Jaccard verification.
    * Input must have columns (doc_id, text). Output: (a, b, jaccard) with
    * a < b, jaccard >= threshold. Only (doc_id, band, hash) triples, the
    * candidate ids and 8-byte shingle hashes ever shuffle — never the text.
    */
  def minhashLshPairs(spark: SparkSession, docs: DataFrame, cfg: LshConfig = LshConfig()): DataFrame = {
    val banded = bandHashRows(spark, docs, cfg)
    val candidates = candidatesOf(banded, cfg)
    verifyPairs(shingleHashRows(spark, docs, cfg.shingleSize), candidates, cfg)
  }

  /** 62-bit SimHash token hash from two independent polynomial codepoint
    * hashes: h = scramble(p1) | (scramble(p2) << 31). Chosen over xxhash64
    * so an independent engine recomputes the whole signature exactly
    * (DuckDB: list_reduce over unicode codepoints) — giving SimHash a
    * cross-engine oracle; 62 bits also keeps every shift below the BIGINT
    * sign bit on both engines.
    *
    * Diffusion matters here (measured at sf0.01): the naive `acc*31+cp`
    * poly hash leaves the last characters in the low bits only — token
    * pairs like singular/plural get near-identical hashes, signature bits
    * correlate across documents, and hamming<=3 pair count exploded 1.5k →
    * 16k. Large LCG multipliers (1103515245 / 1566083941, products stay
    * under 2^63) plus a final quadratic scramble (p*p%m+p)%m restore
    * mixing: 1.2k pairs, on par with xxhash64's 1.9k.
    */
  def polyHash64(s: String): Long = {
    def scramble(p: Long, mod: Long): Long = (p * p % mod + p) % mod
    scramble(graft.ops.TextAnalysis.polyHashSeeded(s, 7L, 2147483647L, 1103515245L), 2147483647L) |
      (scramble(graft.ops.TextAnalysis.polyHashSeeded(s, 13L, 2147483629L, 1566083941L), 2147483629L) << 31)
  }

  /** SimHash bit width (bits 0..61 — see polyHash64). */
  val SimhashBits = 62

  /** Typed single-pass SimHash signatures over distinct lowercase tokens
    * (the round-1 lesson applies: 62 HOF bit-vote aggregates would be
    * interpreted and duplicated by projection collapse — plain Scala is a
    * single O(tokens*62) pass). Bit k of the signature is the sign of the
    * vote sum over token-hash bit k.
    */
  def simhashRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    Spread.spread(docs.select(col("doc_id"), col("text"))).as[(Long, String)].mapPartitions { it =>
      it.map { case (docId, text) =>
        val tokens = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).distinct
        val votes = new Array[Int](SimhashBits)
        var ti = 0
        while (ti < tokens.length) {
          val h = polyHash64(tokens(ti))
          var bit = 0
          while (bit < SimhashBits) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
          ti += 1
        }
        var sig = 0L
        var bit = 0
        while (bit < SimhashBits) {
          if (votes(bit) > 0) sig |= (1L << bit)
          bit += 1
        }
        (docId, sig)
      }
    }.toDF("doc_id", "sig")
  }

  /** SimHash near-dup pairs at hamming distance <= 3 via the 4-band
    * exact-match trick: the 62 signature bits split into 4 disjoint 16-bit
    * bands (band 3 carries 14 live bits), and by pigeonhole any pair within
    * distance 3 agrees on at least one whole band — so recall is EXACT, not
    * probabilistic; the only divergence from brute-force all-pairs hamming
    * is the maxBucket skew cap discarding degenerate buckets (boilerplate
    * signatures). The DuckDB oracle recomputes all-pairs hamming exactly.
    */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxBucket: Int = 64): DataFrame = {
    import spark.implicits._
    val sigs = simhashRows(spark, docs)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "band_val")))
    // Typed bucket pairing (same interpreted-HOF rationale as
    // [[candidatesOf]]), with the hamming cut applied INSIDE the pass:
    // hamming is a pure function of the pair, so filtering before the
    // distinct is result-identical (sig is functionally determined by
    // doc_id, hence distinct(a,b,hamming) ≡ the old
    // distinct(a,b,sig_a,sig_b) + filter) while the dedup exchange sees
    // only the ≤3-distance sliver instead of every bucket pair.
    banded.groupBy(col("band"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("members"))
      .filter(size(col("members")) > 1 && size(col("members")) <= maxBucket)
      .select(col("members")).as[Seq[(Long, Long)]]
      .flatMap { ms =>
        val s = ms.toArray
        java.util.Arrays.sort(s, Ordering[(Long, Long)])
        for {
          i <- s.indices.iterator.take(s.length - 1)
          j <- (i + 1 until s.length).iterator
          h = java.lang.Long.bitCount(s(i)._2 ^ s(j)._2)
          if h <= 3
        } yield (s(i)._1, s(j)._1, h)
      }
      .toDF("a", "b", "hamming")
      .distinct()
  }

  /** Incremental (append-mode) exact dedup — the at-scale pattern for a
    * growing crawl: a persistent LEDGER of content hashes already accepted
    * is joined against, so each new batch costs O(batch) + one hash
    * anti-join instead of re-deduplicating the whole corpus. Returns ONLY
    * the accepted (content_md5, doc_id) keys — hash not in ledger, minimum
    * doc_id wins within the batch — never the text, so the shuffle moves
    * 16-byte digests at any corpus size; union the accepted hashes back
    * into the ledger afterwards. Use [[incrementalExactDedupRows]] when the
    * caller needs the full accepted rows back.
    */
  def incrementalExactDedup(incoming: DataFrame, ledger: DataFrame): DataFrame = {
    val inBatchKeep = incoming
      .withColumn("content_md5", md5(col("text")))
      .groupBy(col("content_md5")).agg(min(col("doc_id")).as("doc_id"))
    inBatchKeep.join(
      ledger.select(col("content_md5")), Seq("content_md5"), "left_anti")
  }

  /** The ledger after accepting a batch: previous ledger ∪ the accepted
    * batch's content hashes — completes the append-mode loop
    * (accepted = incrementalExactDedup(batch, ledger);
    *  ledger' = advanceLedger(ledger, accepted)). Pure union of 16-byte
    * digests (dedup within the union is unnecessary: accepted hashes are
    * anti-joined against the ledger by construction, so the two sides are
    * disjoint — and within-batch winners are already one row per hash).
    * Re-running the SAME batch against the advanced ledger accepts nothing
    * (idempotence — the crash-retry safety a growing crawl needs); persist
    * the result (e.g. parquet) between batches.
    */
  def advanceLedger(ledger: DataFrame, accepted: DataFrame): DataFrame =
    ledger.select(col("content_md5"))
      .union(accepted.select(col("content_md5")))

  /** A ledger's Bloom filter plus the parameters it was sized with.
    * The parameters travel with the filter because
    * [[advanceLedgerBloom]] must build a COMPATIBLE filter over the
    * accepted batch to merge in (Spark's `BloomFilter.mergeInPlace`
    * requires identical bit size and hash count, both of which derive
    * deterministically from `(expectedItems, fpp)`). Size `expectedItems`
    * for the ledger's TARGET cardinality, not its current one — the
    * filter is built once and advanced per batch, never rebuilt.
    */
  final case class LedgerBloom(
      filter: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long,
      fpp: Double)

  /** One distributed pass over the ledger's digests (tree-aggregated
    * per-partition filters; nothing but the ~`1.2 * expectedItems` bytes
    * of bits reaches the driver). 1B digests at fpp 0.01 is ~1.2 GB —
    * broadcastable; at 10B move to fpp 0.03 or shard the ledger.
    */
  def ledgerBloom(ledger: DataFrame, expectedItems: Long, fpp: Double = 0.01): LedgerBloom =
    LedgerBloom(
      ledger.stat.bloomFilter("content_md5", math.max(expectedItems, 1L), fpp),
      math.max(expectedItems, 1L), fpp)

  /** The filter after accepting a batch: digests of `accepted` folded in —
    * O(batch) work on the executors (a compatible filter is tree-built
    * over the accepted digests and OR-merged), never a rescan of the
    * ledger. Mirrors [[advanceLedger]]; call both after each batch.
    * NOTE: `mergeInPlace` mutates the receiving filter — callers must
    * treat the input `lb` as consumed.
    */
  def advanceLedgerBloom(lb: LedgerBloom, accepted: DataFrame): LedgerBloom = {
    val add = accepted.stat.bloomFilter("content_md5", lb.expectedItems, lb.fpp)
    LedgerBloom(lb.filter.mergeInPlace(add), lb.expectedItems, lb.fpp)
  }

  /** Bloom-pruned incremental exact dedup — bit-identical result to
    * [[incrementalExactDedup]], built for the append loop at corpus scale,
    * where the ledger dwarfs every batch and the batch is mostly new.
    * The batch's within-batch winners split on `lb.filter` membership:
    *
    *   - mightContain = false → DEFINITELY absent from the ledger (Bloom
    *     filters have no false negatives) → accepted with NO join at all;
    *   - mightContain = true → true duplicate OR false positive (rate
    *     `lb.fpp`) → verified by the exact ledger anti-join.
    *
    * Only the ~(batch-dup-rate + fpp) candidate slice of the batch reaches
    * the shuffle, so the anti-join's batch side shrinks by ~100× for a
    * 1%-dup crawl batch at fpp 0.01 — and the ledger side can be skipped
    * entirely when `candidates` is empty. Exactness is unconditional:
    * the negative side is exact by Bloom construction, the positive side
    * is re-verified row by row.
    *
    * The membership test is a Scala UDF over an explicit broadcast (one
    * filter copy per executor, not per task). A UDF is acceptable here —
    * it runs on the batch winners' 32-char digests AFTER the map-side
    * combine, never on page payloads, and it exists to delete a shuffle
    * that costs orders of magnitude more than the non-codegen call.
    */
  def incrementalExactDedupBloom(incoming: DataFrame, ledger: DataFrame,
      lb: LedgerBloom): DataFrame = {
    val spark = incoming.sparkSession
    val bc = spark.sparkContext.broadcast(lb.filter)
    // null-safe: a null digest (null text) is "definitely new", matching
    // the exact path where a null key never matches the anti-join
    val might = udf((h: String) => h != null && bc.value.mightContainString(h))
    val inBatchKeep = incoming
      .withColumn("content_md5", md5(col("text")))
      .groupBy(col("content_md5")).agg(min(col("doc_id")).as("doc_id"))
    val definitelyNew = inBatchKeep.filter(!might(col("content_md5")))
    val candidates = inBatchKeep.filter(might(col("content_md5")))
    val verifiedNew = candidates.join(
      ledger.select(col("content_md5")), Seq("content_md5"), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }

  /** incrementalExactDedup returning the FULL accepted rows of `incoming`
    * (all original columns plus content_md5): the digest-only keep set is
    * computed first, then joined back on (content_md5, doc_id) — the
    * second shuffle is what the digest-only variant exists to avoid, so
    * prefer it when downstream only needs keys.
    */
  def incrementalExactDedupRows(incoming: DataFrame, ledger: DataFrame): DataFrame = {
    val withHash = incoming.withColumn("content_md5", md5(col("text")))
    val keep = incrementalExactDedup(incoming, ledger)
    withHash.join(keep, Seq("content_md5", "doc_id"))
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
