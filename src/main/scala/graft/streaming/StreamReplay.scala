package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.Page

/** Deterministic batch-query replays of the stateful streaming components,
  * so the TTL dedup state machine and the watermarked window aggregation are
  * driver-visible (oracle-checkable) instead of spec-only.
  *
  * Pattern (same as `q_warc_stream_batches`): plant a micro-batch schedule
  * from doc_id arithmetic over the `documents` table, run the REAL streaming
  * component (MemoryStream → flatMapGroupsWithState / watermark+window →
  * memory sink), and return the accepted rows as a static DataFrame whose
  * content is a closed-form function of doc_id — recomputable by the SQL
  * oracle.
  *
  * Both replays pin `spark.sql.streaming.noDataMicroBatches.enabled=false`
  * (scoped, restored after) so triggers happen exactly once per planted
  * batch: with no-data batches enabled the engine may run an extra
  * watermark-only batch at an unspecified point after `processAllAvailable`
  * returns, which would make the eviction boundary race-dependent.
  */
object StreamReplay {

  private val T0 = 1735689600000L // 2025-01-01T00:00:00Z

  /** Replays [[StreamingExtract.dedupStreamTtl]] across 8 planted
    * micro-batches and returns the accepted (first-emitted) rows.
    *
    * Schedule: content keys k = doc_id % 10; a document belongs to batch
    * b = (doc_id / 10) % 8; batch b carries event time T0 + b minutes. A
    * (k, b) cell is PRESENT iff bit b of the key's 8-bit presence pattern
    * is set, where pattern(0) = 255 (sentinel key keeping every batch
    * non-empty, so all 8 triggers fire) and pattern(k) = (k*37 + 11) % 256.
    *
    * With watermark delay 0, 60 s batch spacing and TTL 90 s, the sliding
    * TTL semantics reduce to a closed form over the presence sequence: a
    * present cell (k, b) emits its min doc_id iff k has no previous present
    * batch p, or b - p >= 4. (Eviction of the state planted at p needs a
    * trigger e with no data for k where watermark(e) = ts(e-1) exceeds
    * ts(p) + 90 s — i.e. e >= p+3 — so a sighting at p+3 or earlier finds
    * the state alive and is suppressed WHILE extending the clock; the first
    * re-emittable sighting is p+4. The 1.5-batch TTL fraction keeps the
    * comparison away from any </<= boundary.) That closed form is the SQL
    * oracle; the gap-3 suppressions (keys 4 and 8) distinguish genuine
    * sliding-TTL state from a naive "expired → re-emit" model.
    */
  def ttlDedupReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: SQLContext = spark.sqlContext

    val ids: Array[Long] = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).where(col("doc_id") < 500)
      .as[Long].collect().sorted
    def pattern(k: Long): Int = if (k == 0L) 255 else ((k * 37 + 11) % 256).toInt
    val byBatch: IndexedSeq[Seq[(Long, String, java.sql.Timestamp)]] =
      (0 until 8).map { b =>
        ids.toSeq
          .filter(id => (id / 10) % 8 == b && ((pattern(id % 10) >> b) & 1) == 1)
          .map(id => (id, s"key-${id % 10}", new java.sql.Timestamp(T0 + b * 60000L)))
      }

    withoutNoDataBatches(spark) {
      val input = MemoryStream[(Long, String, java.sql.Timestamp)]
      val sink = s"graft_ttl_replay_${Integer.toHexString(dir.hashCode)}"
      val ck = java.nio.file.Files.createTempDirectory("graft-ttl-replay")
      try {
        val q = StreamingExtract.dedupStreamTtl(spark, input.toDS(),
            watermarkDelay = "0 seconds", ttlMillis = 90000L)
          .toDF("doc_id", "text")
          .writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(sink)
          .option("checkpointLocation", s"$ck/ck")
          .start()
        try {
          byBatch.foreach { rows => input.addData(rows); q.processAllAvailable() }
        } finally q.stop()
        val accepted = spark.table(sink).as[(Long, String)].collect().map(_._1).sorted
        accepted.toSeq.map(id => (id, id % 10, (id / 10) % 8))
          .toDF("doc_id", "content_key", "batch")
      } finally cleanupReplay(spark, sink, ck)
    }
  }

  /** Replays [[StreamingExtract.pageRateAgg]] (watermark + 5-minute tumbling
    * window + per-lang agg, append mode) over a planted page stream and
    * returns the FLUSHED windows.
    *
    * Schedule: each document becomes one page at event time
    * T0 + (doc_id % 24) * 150 s (24 steps, 2.5 min apart — two steps per
    * window, 12 windows) with lang = "l" + (doc_id % 5); pages stream in
    * four quartile batches in event-time order, then one far-future
    * sentinel page advances the watermark. In append mode a window emits
    * only once the watermark passes its end: the final watermark is
    * maxRealTs - 10 min = T0 + 47.5 min, so exactly the windows ending at
    * 5..45 min flush (steps 0..17) and the last three windows are withheld
    * — the oracle recomputes both the per-window sums and the gating cut.
    */
  def rateAggReplay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: SQLContext = spark.sqlContext

    val docRows: Array[(Long, String)] = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("doc_id") < 500)
      .as[(Long, String)].collect()
    def page(id: Long, text: String): Page = Page(
      url = s"stream://doc/$id",
      warc_ts = new java.sql.Timestamp(T0 + (id % 24) * 150000L),
      html = Array.emptyByteArray,
      text = text,
      lang = s"l${id % 5}")
    val batches: IndexedSeq[Seq[Page]] = (0 until 4).map { qt =>
      docRows.toSeq.filter { case (id, _) => (id % 24) / 6 == qt }
        .map { case (id, text) => page(id, text) }
    }
    val sentinel = Page("stream://sentinel",
      new java.sql.Timestamp(T0 + 7200000L), Array.emptyByteArray, "", "zz")

    withoutNoDataBatches(spark) {
      val input = MemoryStream[Page]
      val sink = s"graft_rate_replay_${Integer.toHexString(dir.hashCode)}"
      val ck = java.nio.file.Files.createTempDirectory("graft-rate-replay")
      try {
        val q = StreamingExtract.pageRateAgg(input.toDS())
          .writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName(sink)
          .option("checkpointLocation", s"$ck/ck")
          .start()
        try {
          batches.foreach { rows => input.addData(rows); q.processAllAvailable() }
          input.addData(Seq(sentinel)); q.processAllAvailable()
        } finally q.stop()
        val flushed = spark.table(sink)
          .select(unix_millis(col("window.start")).as("window_start_ms"),
            col("lang"), col("pages"), col("text_chars"))
          .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
        flushed.toSeq.toDF("window_start_ms", "lang", "pages", "text_chars")
      } finally cleanupReplay(spark, sink, ck)
    }
  }

  /** Drops the replay's memory-sink temp view and deletes its temp
    * checkpoint dir. Each replay otherwise leaks a registered table into
    * the long-lived session and a checkpoint tree into /tmp — Verify and
    * the test JVM run several replays per JVM, and the DfCache memo means
    * the sink table would otherwise shadow a later same-dir replay's sink
    * only silently. Cleanup is best-effort: a failed delete must not mask
    * the replay's result (or its primary exception).
    */
  private def cleanupReplay(
      spark: SparkSession, sink: String, ck: java.nio.file.Path): Unit = {
    try spark.catalog.dropTempView(sink) catch { case _: Exception => () }
    try {
      import java.nio.file.{Files, Path}
      if (Files.exists(ck)) {
        val walk = Files.walk(ck)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () }
  }

  private def withoutNoDataBatches[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
