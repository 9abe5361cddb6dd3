package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.pipeline.Page

/** WARC (ISO 28500) corpus writer — the sink twin of [[WarcSource]], in the
  * Common Crawl layout: one `.warc.gz` file per input partition, each WARC
  * record compressed as its OWN gzip member and the members concatenated
  * (the layout that lets a reader skip to any record boundary; also what
  * exercises the source's explicit multi-member decode).
  *
  * Per file: one `warcinfo` record, then per page a `request` record
  * followed by the `response` record carrying the HTTP envelope + html
  * payload — a conforming reader must surface ONLY the response bodies, so
  * a round-trip through [[WarcSource]] checks the skip logic end to end.
  *
  * Scale shape: a narrow `mapPartitions` — each task streams its rows into
  * one file through bounded buffers (one record resident at a time), no
  * shuffle, no driver collection beyond the per-file (path, count) summary.
  * File handles honor the session Hadoop configuration (object stores work
  * the same as local disk).
  */
object WarcWriter {

  /** Write `pages` under `outDir` (deleted first — idempotent), one
    * `part-NNNNN.warc.gz` per partition. Returns (path, records) per file;
    * this is an ACTION.
    */
  def writeCorpus(spark: SparkSession, pages: Dataset[Page], outDir: String): Seq[(String, Long)] = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    pages.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val part = TaskContext.getPartitionId()
        val path = new Path(outDir, f"part-$part%05d.warc.gz")
        val stream = path.getFileSystem(conf.value).create(path, true)
        var records = 0L
        try {
          stream.write(gzipMember(warcinfoRecord()))
          records += 1
          it.foreach { p =>
            stream.write(gzipMember(requestRecord(p)))
            stream.write(gzipMember(responseRecord(p)))
            records += 2
          }
        } finally stream.close()
        Iterator.single((path.toString, records))
      }
    }.collect().toSeq.sortBy(_._1)
  }

  /** One WARC record as bytes: version line + headers + CRLF + payload +
    * the two record-separator CRLFs.
    */
  private[sources] def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val outBytes = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, outBytes, 0, head.length)
    System.arraycopy(payload, 0, outBytes, head.length, payload.length)
    outBytes(outBytes.length - 4) = '\r'; outBytes(outBytes.length - 3) = '\n'
    outBytes(outBytes.length - 2) = '\r'; outBytes(outBytes.length - 1) = '\n'
    outBytes
  }

  private def isoDate(ts: java.sql.Timestamp): String =
    java.time.Instant.ofEpochMilli(ts.getTime).toString

  /** Deterministic record id from the url (no RNG — byte-stable reruns). */
  private def recordId(seed: String): String =
    "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(seed.getBytes(UTF_8)) + ">"

  private def warcinfoRecord(): Array[Byte] =
    record(
      Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> recordId("warcinfo"),
        "Content-Type" -> "application/warc-fields"),
      "software: graft-warc-writer/1.0\r\nformat: WARC File Format 1.0\r\n".getBytes(UTF_8))

  private def requestRecord(p: Page): Array[Byte] = {
    val uri = java.net.URI.create(p.url)
    val host = Option(uri.getHost).getOrElse("")
    val pathPart = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val http = s"GET $pathPart HTTP/1.1\r\nHost: $host\r\nUser-Agent: graft\r\n\r\n"
    record(
      Seq(
        "WARC-Type" -> "request",
        "WARC-Record-ID" -> recordId("request:" + p.url),
        "WARC-Date" -> isoDate(p.warc_ts),
        "WARC-Target-URI" -> p.url,
        "Content-Type" -> "application/http; msgtype=request"),
      http.getBytes(UTF_8))
  }

  private def responseRecord(p: Page): Array[Byte] = {
    val envelope =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n" +
        s"Content-Length: ${p.html.length}\r\n\r\n").getBytes(UTF_8)
    val payload = new Array[Byte](envelope.length + p.html.length)
    System.arraycopy(envelope, 0, payload, 0, envelope.length)
    System.arraycopy(p.html, 0, payload, envelope.length, p.html.length)
    record(
      Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> recordId("response:" + p.url),
        "WARC-Date" -> isoDate(p.warc_ts),
        "WARC-Target-URI" -> p.url,
        "Content-Type" -> "application/http; msgtype=response"),
      payload)
  }

  /** One gzip member per record (Common Crawl layout). */
  private[sources] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val buf = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(buf)
    gz.write(bytes)
    gz.close()
    buf.toByteArray
  }
}
