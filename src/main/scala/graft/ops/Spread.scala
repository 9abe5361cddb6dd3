package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Scan-parallelism guard for CPU-heavy typed passes (guide §2.5 "input
  * skew" / §6 input-split sizing): a small parquet input produces only one
  * or two scan splits (`maxPartitionBytes` default 128 MB), so a narrow
  * tokenize/hash/shingle pass downstream runs on 1-2 cores while the rest
  * of the cluster idles — measured on the bench corpus: the dup-spans gram
  * pass ran 2 tasks × ~600 ms on a 32-core session. [[spread]] inserts a
  * deterministic hash repartition ONLY when the optimizer's size estimate
  * says the whole input is small; a corpus-scale input already splits into
  * thousands of scan tasks and is passed through untouched, preserving the
  * "document text never shuffles" design at 100 TB.
  *
  * This is the same pattern the synthetic page generator already applies
  * ("the source table is tiny but the render+extract downstream is
  * CPU-bound" — SyntheticPages.pagesReplicated), made conditional so ops
  * can apply it unconditionally at any scale.
  *
  * A second benefit: two passes over the same small input (e.g. the
  * band-hash and shingle passes of MinHash, or the line-digest and rebuild
  * sides of the repeated-line strip) land on IDENTICAL repartition
  * subtrees, which exchange reuse collapses into one physical scan.
  *
  * The threshold is parameterised (`spark.graft.spreadMaxBytesPerCore`,
  * default 8 MB/core): inputs estimated under `cores × threshold` bytes
  * repartition; the one-off shuffle of ≤ 8 MB/core of text costs far less
  * than leaving the cluster idle through a CPU-bound pass. Reading plan
  * statistics runs no Spark jobs, keeping query construction lazy.
  */
object Spread {

  private def maxBytes(df: DataFrame): BigInt = {
    val spark = df.sparkSession
    val perCore = spark.conf.getOption("spark.graft.spreadMaxBytesPerCore")
      .orElse(sys.env.get("SPARK_GRAFT_SPREAD_MAX_BYTES_PER_CORE"))
      .map(_.toLong).getOrElse(8L * 1024 * 1024)
    BigInt(spark.sparkContext.defaultParallelism) * perCore
  }

  /** `df` hash-repartitioned on `by` when its estimated size is small
    * (see object doc); unchanged otherwise. Hash partitioning on a unique
    * id is deterministic under retry (guide §2.5's rand-repartition trap
    * does not apply) and row placement never changes results.
    */
  def spread(df: DataFrame, by: Column = col("doc_id")): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes(df))
      df.repartition(by)
    else df
}
