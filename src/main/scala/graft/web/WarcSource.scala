package graft.web

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC ingest — the Common-Crawl container format (ISO 28500, a public spec):
  * concatenated records of `WARC/1.0\r\n` + `Name: value` header lines + blank line
  * + `Content-Length` payload bytes + `\r\n\r\n`. Response records carry a full HTTP
  * response as payload (status line + headers + blank line + body).
  *
  * Read shape: `binaryFile` loads each shard as ONE whole-file row, so parallelism
  * is per-shard — exactly how Common Crawl distributes (thousands of shards per
  * crawl, one task each). The reader is NOT split-inside-a-shard: CC's
  * record-level gzip members would allow that with a custom Hadoop InputFormat,
  * which is deliberately out of scope — shard-level parallelism already yields
  * tens of thousands of tasks on a real crawl. Multi-member gzip (CC's layout:
  * one gzip member per record) decompresses transparently — JDK `GZIPInputStream`
  * reads concatenated members. HONEST LIMIT: the whole-shard buffer caps a shard
  * at 2 GB DECOMPRESSED (JVM array bound); a full-size CC shard (~1 GB gz ≈ 4 GB
  * raw) must be re-sharded upstream or read uncompressed under the bound — the
  * record parser itself is position-based and would port unchanged onto a
  * streaming InputFormat.
  *
  * Malformed records (truncated payload, missing mandatory headers, non-numeric
  * Content-Length) are SKIPPED, never fatal: on a 100-TB crawl a poison record
  * must cost one record, not one shard. [[records]] preserves everything parseable;
  * [[pages]] lowers response records to the engine's page schema
  * `(url, warc_ts, html)` ready for [[WebFeatures]].
  */
object WarcSource {

  /** One parsed WARC record. `body` is the HTTP payload body for response records
    * (bytes after the HTTP header block) and the raw WARC payload otherwise.
    */
  final case class WarcRecord(
      path: String,
      url: String,
      warc_ts: java.sql.Timestamp,
      record_type: String,
      content_type: String,
      http_status: Int,
      body: Array[Byte])

  /** Decompress a gzipped shard; on a TRUNCATED/corrupt tail (a crawl upload cut
    * mid-member — common at fleet scale), salvage every byte decompressed so far
    * and let the record parser skip the torn tail record, instead of failing the
    * task and with it the shard's thousands of good records.
    */
  private def gunzipIfNeeded(path: String, bytes: Array[Byte]): Array[Byte] =
    if (!path.endsWith(".gz") &&
      !(bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte)) bytes
    else {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 64 * 1024)
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } catch { case _: java.io.IOException => /* keep the salvaged prefix */ }
      out.toByteArray
    }

  // NOT named indexOf: inside the anonymous Iterator below, an unqualified
  // 3-arg indexOf call auto-tuples into scala.collection.Iterator#indexOf(elem)
  // (enclosing members shadow outer scopes), silently scanning the iterator
  // itself instead of the byte array
  private def bytesIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val crlfCrlf = "\r\n\r\n".getBytes("ISO-8859-1")
  private val warcMagic = "WARC/".getBytes("ISO-8859-1")

  /** Parse every well-formed record out of one (decompressed) shard. Iterative
    * scan: find the next `WARC/` magic, read the header block up to the blank
    * line, take `Content-Length` payload bytes, emit, continue after the payload.
    */
  private[web] def parseShard(path: String, raw: Array[Byte]): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var pos = 0
      private var nextRec: WarcRecord = null
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && pos >= 0 && pos < raw.length) {
          val start = bytesIndexOf(raw, warcMagic, pos)
          if (start < 0) { pos = raw.length; return }
          val headerEnd = bytesIndexOf(raw, crlfCrlf, start)
          if (headerEnd < 0) { pos = raw.length; return }
          val headerText = new String(raw, start, headerEnd - start, "ISO-8859-1")
          val headers: Map[String, String] = headerText.split("\r\n").iterator
            .drop(1) // the WARC/1.x version line
            .flatMap { line =>
              val i = line.indexOf(':')
              if (i <= 0) None else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
            }.toMap
          val payloadStart = headerEnd + 4
          headers.get("content-length").flatMap(_.toIntOption) match {
            case Some(len) if len >= 0 && payloadStart + len <= raw.length =>
              pos = payloadStart + len // resume after this record regardless of validity
              val rec = toRecord(path, headers, raw, payloadStart, len)
              if (rec != null) nextRec = rec // else: malformed — skip, keep scanning
            case _ =>
              // missing/bad/truncating length: skip past the magic and rescan
              pos = start + warcMagic.length
          }
        }
      }
      private def toRecord(path: String, h: Map[String, String],
          raw: Array[Byte], payloadStart: Int, len: Int): WarcRecord = {
        val ts = h.get("warc-date").flatMap { s =>
          try Some(java.sql.Timestamp.from(java.time.Instant.parse(s)))
          catch { case _: Exception => None }
        }.orNull
        val recType = h.getOrElse("warc-type", "")
        if (ts == null || recType.isEmpty) return null
        val url = h.getOrElse("warc-target-uri", "")
        var status = 0
        var bodyStart = payloadStart
        var bodyLen = len
        // the WARC-level Content-Type of a response record is the envelope
        // ("application/http; msgtype=response"); the curation-relevant type is the
        // HTTP header's, parsed below for responses
        var contentType = h.getOrElse("content-type", "")
        if (recType == "response") {
          // HTTP header block ends at the first \r\n\r\n inside the payload
          val httpEnd = bytesIndexOf(raw, crlfCrlf, payloadStart)
          if (httpEnd >= 0 && httpEnd < payloadStart + len) {
            val httpHead = new String(raw, payloadStart, httpEnd - payloadStart, "ISO-8859-1")
            val httpLines = httpHead.split("\r\n")
            status = httpLines.head.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(0)
            httpLines.iterator.drop(1)
              .map(_.split(":", 2))
              .collectFirst { case Array(k, v) if k.trim.equalsIgnoreCase("content-type") => v.trim }
              .foreach(contentType = _)
            bodyStart = httpEnd + 4
            bodyLen = payloadStart + len - bodyStart
          }
        }
        WarcRecord(path, url, ts, recType, contentType, status,
          java.util.Arrays.copyOfRange(raw, bodyStart, bodyStart + math.max(bodyLen, 0)))
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = { val r = nextRec; advance(); r }
    }

  /** All parseable records under `pathGlob` (plain or gzipped WARC shards). */
  def records(spark: SparkSession, pathGlob: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseShard(path, gunzipIfNeeded(path, bytes)) }
  }

  /** Response records lowered to the engine's page schema: `(url, warc_ts, html)`
    * (+ http_status, content_type), ready for `WebFeatures.htmlText` / the
    * point-in-time feature job. Non-2xx and empty-url records are dropped.
    */
  def pages(records: Dataset[WarcRecord]): DataFrame =
    records.toDF()
      .where(col("record_type") === "response" && length(col("url")) > 0 &&
        col("http_status") >= 200 && col("http_status") < 300)
      .select(col("url"), col("warc_ts"), col("body").as("html"),
        col("http_status"), col("content_type"))
}
