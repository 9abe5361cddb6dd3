package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The decode/feature steps
  * run as batched per-partition transforms (the Scala analog of
  * `mapInPandas`): one iterator pass, schema declared up front, rows
  * processed in Arrow-sized batches.
  *
  * The actual codec is STUBBED (no image/audio libraries ship in this
  * container): `decodeStub` derives deterministic fake metadata from the
  * bytes. The Spark-side plumbing — binary column, batch shape, schema,
  * partitioning — is real and tested; swap `decodeStub` for a real decoder
  * on a cluster with codecs installed.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decoder — deterministic fake: replace with a real codec.
    * Metadata is a pure function of the payload bytes so tests and oracles
    * stay byte-stable.
    */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Int) = {
    val n = payload.length
    val format = if (n == 0) "empty" else (n % 3) match {
      case 0 => "img" case 1 => "audio" case _ => "video"
    }
    val width = n % 1024
    val height = (n / 1024) % 1024
    val frames = if (format == "video") n % 30 + 1 else 1
    (format, width, height, frames)
  }

  /** Synthesize the binary payload column from the documents table (the
    * container has no real media; payload = UTF-8 bytes of the text).
    * Source read memoized per session (core.DfCache) so query construction
    * stays free of footer/schema planning jobs.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.core.DfCache.get(spark, s"$sfDir/documents.parquet")(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode: mapPartitions with an explicit batch size — the
    * mapInPandas-shaped seam where a real decoder would amortize codec
    * setup per batch.
    */
  def decodeBatched(spark: SparkSession, media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would go here (codec contexts, buffers)
        batch.iterator.map { m =>
          val (format, w, h, frames) = decodeStub(m.payload)
          MediaMeta(m.doc_id, m.payload.length.toLong, format, w, h, frames)
        }
      }
    }
  }

  /** The full metadata query (oracle-checkable: every output column is a
    * deterministic integer/string function of octet_length(text)).
    */
  def mediaMetaQuery(spark: SparkSession, sfDir: String): DataFrame =
    decodeBatched(spark, mediaTable(spark, sfDir)).toDF()
}
