package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500 — the Common-Crawl container format) read
  * support as a DataSourceV2 file source:
  *
  * {{{
  *   spark.read.format("warc").load("/crawl/segment")   // dir, file, or glob
  *     // => (url: string, warc_ts: timestamp, html: binary)
  * }}}
  *
  * emits one row per `response`/`resource` record (request/metadata/
  * warcinfo records are skipped), with the HTTP envelope stripped from
  * response payloads — exactly the page-table shape the extraction
  * pipeline consumes (`BASELINE.json` input_hint; text/lang are derived
  * downstream).
  *
  * Scale notes: one input partition per WARC file — the standard parallel
  * unit for a crawl (Common Crawl ships ~1 GB files, tens of thousands per
  * snapshot, so file-level parallelism saturates any cluster; per-record
  * gzip members would be decoded inside the partition reader on a real
  * deployment). Records stream through a bounded parser — only one
  * record's payload is resident per row.
  */
class WarcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true)))

  /** The active session's Hadoop configuration (carries `spark.hadoop.*`
    * overrides — S3/ABFS credentials, endpoints, custom FS impls; the
    * round-3 source built a default `Configuration()` and silently dropped
    * them, so it only worked on default-reachable filesystems). Falls back
    * to a bare conf when no session is active (direct parser tests).
    */
  def sessionHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** Resolve the option paths to concrete file paths (glob-aware). */
  def resolvePaths(props: Map[String, String],
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val raw = props.get("paths")
      .map(p => graft.core.JVal.parse(p) match {
        case graft.core.JVal.JArr(items) => items.collect { case graft.core.JVal.JStr(s) => s }.toList
        case _ => Nil
      })
      .getOrElse(props.get("path").toList)
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Nil)
      val statuses = if (matched.nonEmpty) matched else Seq(fs.getFileStatus(path))
      statuses.flatMap { st =>
        // skip _SUCCESS / _tmp-* / .hidden metadata files (the Hadoop
        // FileInputFormat convention) so a committed WarcWriter directory
        // reads back as exactly its data files
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
          .map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.distinct.sorted
  }

  def resolvePaths(props: Map[String, String]): Seq[String] =
    resolvePaths(props, sessionHadoopConf())
}

/** Java-serializable Hadoop Configuration carrier (Configuration itself is
  * Writable, not Serializable; Spark's own wrapper is private[spark]) —
  * resolved once on the driver from the session state, shipped to the
  * partition readers so executor-side FS opens see the same
  * `spark.hadoop.*` settings as planning did.
  */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

final class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${props.getOrElse("path", props.getOrElse("paths", ""))})"
  override def schema(): StructType = WarcSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {
      // column pruning (Catalyst pushes the projection into the scan): a
      // metadata-only query — `SELECT url FROM warc` over a 100 TB crawl —
      // must not allocate or copy any page body; the reader skips payload
      // bytes it won't emit (the gzip members still stream through, but
      // nothing is buffered or envelope-stripped)
      private var required: StructType = WarcSource.Schema
      override def pruneColumns(requiredSchema: StructType): Unit = { required = requiredSchema }
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val conf = WarcSource.sessionHadoopConf()
        val shipped = new SerializableHadoopConf(conf)
        WarcSource.resolvePaths(props, conf)
          .map(WarcFilePartition(_, shipped): InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new WarcReaderFactory(required)
      override def toMicroBatchStream(checkpointLocation: String):
          org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new WarcMicroBatchStream(props, required)
    }
}

/** Micro-batch streaming over a growing crawl directory
  * (`spark.readStream.format("warc").load(dir)`): each batch reads the
  * WARC files that appeared since the last committed offset — the
  * continuous-ingestion half of a crawl pipeline (segments land as
  * immutable `.warc.gz` files; Common Crawl publishes them exactly so).
  *
  * Offsets are the SET of already-seen file paths, serialized as a JSON
  * array — explicit rather than a high-watermark because crawl segment
  * names need not arrive in lexicographic order. At Common-Crawl scale
  * (~10^4-10^5 files per snapshot) the offset is a few MB of checkpoint
  * state, the same order as the built-in FileStreamSource's seen-files
  * log. Files must be immutable once visible (the standard crawl-segment
  * contract); one input partition per new file, same reader (and column
  * pruning) as the batch path.
  */
final class WarcMicroBatchStream(props: Map[String, String], required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}

  private val conf = WarcSource.sessionHadoopConf()
  private val shipped = new SerializableHadoopConf(conf)

  override def initialOffset(): SOffset = WarcStreamOffset(Vector.empty)

  override def latestOffset(): SOffset =
    WarcStreamOffset(
      try WarcSource.resolvePaths(props, conf).toVector
      catch { case _: java.io.FileNotFoundException => Vector.empty }) // dir not created yet

  override def deserializeOffset(json: String): SOffset =
    WarcStreamOffset(graft.core.JVal.parse(json) match {
      case graft.core.JVal.JArr(items) =>
        items.collect { case graft.core.JVal.JStr(s) => s }.toVector
      case other => throw new IllegalArgumentException(s"bad WARC offset: $other")
    })

  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcStreamOffset].files.toSet
    end.asInstanceOf[WarcStreamOffset].files
      .filterNot(seen)
      .map(WarcFilePartition(_, shipped): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new WarcReaderFactory(required)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

final case class WarcStreamOffset(files: Vector[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.map(graft.core.JVal.quote).mkString("[", ",", "]")
}

final case class WarcFilePartition(path: String, conf: SerializableHadoopConf)
    extends InputPartition

final class WarcReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[WarcFilePartition]
    new WarcPartitionReader(p.path, p.conf.value, required)
  }
}

/** Streaming WARC record parser over one file, emitting only the pruned
  * `required` columns (in the pruned order).
  */
final class WarcPartitionReader(path: String,
    hadoopConf: org.apache.hadoop.conf.Configuration,
    required: StructType = WarcSource.Schema) extends PartitionReader[InternalRow] {
  private val wantHtml = required.fieldNames.contains("html")
  private val in = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val raw = new java.io.BufferedInputStream(fs.open(p))
    // Common Crawl ships .warc.gz: per-record gzip MEMBERS concatenated
    // into one file. commons-compress with decompressConcatenated=true has
    // EXPLICIT multi-member support — java.util.zip.GZIPInputStream's
    // member-boundary heuristic peeks `available()`, which remote FS
    // streams legitimately report as 0 mid-file, silently truncating the
    // record stream at the first member on e.g. S3.
    if (path.endsWith(".gz"))
      new java.io.BufferedInputStream(
        new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(raw, true))
    else raw
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      WarcParse.readRecord(in, wantPayload = wantHtml) match {
        case None => return false
        case Some((headers, payload)) =>
          val recType = headers.getOrElse("warc-type", "")
          if (recType == "response" || recType == "resource") {
            val values = required.fieldNames.map {
              case "url" =>
                UTF8String.fromString(headers.getOrElse("warc-target-uri", "")): Any
              // no/unparseable WARC-Date => null (the schema is nullable; a
              // 0L default would be indistinguishable from a real epoch ts)
              case "warc_ts" =>
                headers.get("warc-date").flatMap(WarcParse.isoMicros).map(Long.box).orNull: Any
              case "html" =>
                (if (recType == "response") WarcParse.stripHttpEnvelope(payload)
                 else payload): Any
              case other => throw new IllegalArgumentException(s"unknown WARC column $other")
            }
            current = new GenericInternalRow(values.toArray[Any])
          }
      }
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

private[sources] object WarcParse {

  /** Read one record: header block up to a blank line, then Content-Length
    * payload bytes, then the record separator CRLFs. None at EOF.
    * With `wantPayload = false` the payload bytes are skipped, not
    * buffered (column-pruned scans never materialize page bodies); the
    * returned payload is then empty.
    */
  def readRecord(in: java.io.InputStream,
      wantPayload: Boolean = true): Option[(Map[String, String], Array[Byte])] = {
    val headerLines = scala.collection.mutable.ArrayBuffer.empty[String]
    var line = readLine(in)
    // skip inter-record blank lines
    while (line.exists(_.isEmpty)) line = readLine(in)
    if (line.isEmpty) return None
    if (!line.get.startsWith("WARC/"))
      throw new java.io.IOException(s"not a WARC record header: '${line.get.take(40)}'")
    line = readLine(in)
    while (line.exists(_.nonEmpty)) {
      headerLines += line.get
      line = readLine(in)
    }
    val headers = headerLines.iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val len = headers.get("content-length").flatMap(_.toLongOption).getOrElse(0L)
    if (len > Int.MaxValue) throw new java.io.IOException(s"record too large: $len")
    if (!wantPayload) {
      var remaining = len
      while (remaining > 0) {
        val n = in.skip(remaining)
        if (n <= 0) {
          // skip() can legitimately return 0 on a ready stream; fall back
          // to a read to distinguish stall from EOF
          if (in.read() < 0)
            throw new java.io.EOFException(s"truncated WARC record (want $len bytes)")
          remaining -= 1
        } else remaining -= n
      }
      return Some((headers, Array.emptyByteArray))
    }
    val payload = new Array[Byte](len.toInt)
    var off = 0
    while (off < payload.length) {
      val n = in.read(payload, off, payload.length - off)
      if (n < 0) throw new java.io.EOFException(s"truncated WARC record (want $len bytes)")
      off += n
    }
    Some((headers, payload))
  }

  /** One CRLF/LF-terminated ASCII line; None at EOF before any byte. */
  private def readLine(in: java.io.InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(64)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    Some(sb.toString)
  }

  /** Drop the HTTP response envelope (status line + headers + blank line)
    * from a `response` record payload; payloads without one pass through.
    */
  def stripHttpEnvelope(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 5 ||
        !(payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' && payload(3) == 'P')) {
      return payload
    }
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') {
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      }
      i += 1
    }
    payload
  }

  /** WARC-Date (ISO-8601 instant) to epoch micros. */
  def isoMicros(s: String): Option[Long] =
    try {
      val inst = java.time.Instant.parse(s)
      Some(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    } catch { case _: java.time.format.DateTimeParseException => None }
}
