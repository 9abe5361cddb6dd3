package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the exact baseline, and an
  * IVF (inverted-file) variant as the scale path.
  *
  * All math stays in Catalyst (`zip_with` + `aggregate` in float64) — no
  * UDFs, so the cross join and re-rank are whole-stage codegen'd.
  */
object Similarity {

  /** Float64 dot product of two array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, window-rank by (score desc, id asc). At 100 TB the corpus side
    * stays partitioned; only queries broadcast.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** IVF top-k (the scale path): centroids = every Nth corpus vector
    * (deterministic); vectors are assigned to their nearest centroid once
    * (narrow after a broadcast of centroids); queries probe `nProbe`
    * nearest centroids and re-rank exactly within those cells only.
    * Returns the same schema as bruteForceTopK.
    */
  def ivfTopK(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      k: Int, nCells: Int, nProbe: Int): DataFrame = {
    val centroids = corpus
      .withColumn("rn", row_number().over(Window.orderBy(col("vec_id"))))
      .withColumn("step", greatest(lit(1),
        (count(lit(1)).over(Window.partitionBy()) / nCells).cast("int")))
      .filter(col("rn") % col("step") === 0)
      .limit(nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))

    val assignW = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell_id").asc)
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine(col("embedding"), col("centroid")))
      .withColumn("r", row_number().over(assignW))
      .filter(col("r") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("cell_id"))

    val probeW = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cell_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine(col("embedding"), col("centroid")))
      .withColumn("r", row_number().over(probeW))
      .filter(col("r") <= nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell_id"))

    val scored = assigned.join(probes, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs above a similarity
    * threshold, via LSH-style random-hyperplane bucketing (sign bits of
    * projections onto deterministic pseudo-random planes) + exact verify.
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double, planes: Int = 8): DataFrame = {
    // deterministic pseudo-random plane p: component j = hash(p, j) mapped to [-1, 1]
    def planeSig(emb: Column): Column = {
      (0 until planes).map { p =>
        val proj = aggregate(
          zip_with(emb, sequence(lit(0), size(emb) - 1), (x, j) => {
            val h = xxhash64(concat(lit(s"plane$p:"), j.cast("string")))
            x.cast("double") * (h.cast("double") / lit(Long.MaxValue.toDouble))
          }),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }
    val sigs = corpus.select(col("vec_id"), col("embedding"), planeSig(col("embedding")).as("sig"))
    val buckets = sigs.groupBy(col("sig"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
      .filter(size(col("members")) > 1)
    val pairs = buckets.select(explode(pairStructs(col("members"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("p.emb_a").as("emb_a"), col("p.emb_b").as("emb_b"))
    pairs.withColumn("score", cosine(col("emb_a"), col("emb_b")))
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), col("score"))
  }

  private def pairStructs(members: Column): Column = {
    val sorted = array_sort(members)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, size(sorted)), y =>
        struct(
          x.getField("vec_id").as("a"), y.getField("vec_id").as("b"),
          x.getField("embedding").as("emb_a"), y.getField("embedding").as("emb_b")))))
  }
}
