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
    *
    * Commit protocol: each task attempt streams into its OWN
    * `_tmp-part-NNNNN-<attemptId>` file and renames to the final name on
    * task success — a retried or speculative attempt can never interleave
    * bytes with the winner, and a task that dies mid-write leaves only an
    * underscore-prefixed temp that readers skip ([[WarcSource]] filters
    * `_`/`.`-prefixed files, the Hadoop convention). The rename loser
    * deletes its temp and reports the winner's (identical, deterministic)
    * file; a store whose rename REPLACES an existing destination (POSIX)
    * converges on identical bytes the same way, and the driver-side
    * `distinct` collapses the duplicate (path, count) report. After all
    * tasks commit, a `_SUCCESS` marker is written — its absence means a
    * partial directory (a job that died after some tasks committed), which
    * [[verifySuccess]] lets a reader reject instead of silently reading a
    * truncated corpus.
    */
  def writeCorpus(spark: SparkSession, pages: Dataset[Page], outDir: String): Seq[(String, Long)] = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val files = pages.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val part = TaskContext.getPartitionId()
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val taskFs = new Path(outDir).getFileSystem(conf.value)
        val tmp = new Path(outDir, f"_tmp-part-$part%05d-$attempt")
        val dst = new Path(outDir, f"part-$part%05d.warc.gz")
        val stream = taskFs.create(tmp, true)
        var records = 0L
        var ok = false
        try {
          stream.write(gzipMember(warcinfoRecord()))
          records += 1
          it.foreach { p =>
            stream.write(gzipMember(requestRecord(p)))
            stream.write(gzipMember(responseRecord(p)))
            records += 2
          }
          ok = true
        } finally {
          stream.close()
          if (!ok) taskFs.delete(tmp, false)
        }
        if (taskFs.rename(tmp, dst)) Iterator.single((dst.toString, records))
        else {
          // a sibling attempt already committed (stores with rename-fails-
          // if-exists semantics, e.g. HDFS). The partition's content is
          // deterministic, so this attempt's count describes the winner's
          // file too — REPORT it anyway (the winning attempt's task may
          // have died after its rename, making this retry the only
          // reporter); the driver-side distinct collapses duplicates. A
          // failed rename with NO committed file is a real commit error.
          taskFs.delete(tmp, false)
          if (!taskFs.exists(dst))
            throw new java.io.IOException(s"WARC commit failed: rename to $dst lost with no winner")
          Iterator.single((dst.toString, records))
        }
      }
    }.collect().toSeq.distinct.sortBy(_._1)
    fs.create(new Path(out, "_SUCCESS"), true).close()
    files
  }

  /** True iff `dir` carries the `_SUCCESS` marker [[writeCorpus]] writes
    * after every task committed — reject directories without it (a job
    * that died mid-write reads back as a valid but truncated corpus).
    */
  def verifySuccess(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
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
