package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) container ingest — the Common Crawl shape: a
  * crawl file is a sequence of records (`WARC/1.0` + headers +
  * `Content-Length`-framed payload), each record its OWN gzip member,
  * members concatenated into one `.warc.gz`. This module writes
  * spec-shaped files from corpus rows (the synth side an oracle can
  * replay) and parses real ones back — record split, header parse,
  * HTTP status/body split for `response` records.
  *
  * Scale shape: one file per row (`spark.read.format("binaryFile")`
  * delivers exactly that), so record demux is embarrassingly parallel
  * across files — the actual 100 TB crawl-processing layout, where
  * file counts (not file sizes) carry the parallelism. Parsing
  * streams each blob once; nothing shuffles until the caller
  * aggregates records.
  */
object Warc {

  private val CRLF = "\r\n"
  private val DATE = "2026-01-01T00:00:00Z"
  private val INFO_BODY = "software: graft-synth\n"

  /** One record, parsed. `uri`/`httpStatus`/`body` are null for
    * non-response records (e.g. warcinfo). */
  final case class Record(warcType: String, uri: String,
                          contentLength: Long, httpStatus: Integer,
                          body: String)

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Payload bytes. WARC payloads (HTTP bodies) are UTF-8 on the wire
    * — `parseWarc` decodes them as UTF-8, so the writer must match or
    * non-ASCII text corrupts on round-trip. Only the WARC/HTTP header
    * block stays ISO-8859-1 (its grammar is octet-oriented ASCII).
    * Oracle note: the q484-class DuckDB oracles predict
    * Content-Length as a fixed header size + `length(html)`
    * CODEPOINTS, which equals the UTF-8 BYTE length only on ASCII
    * corpora — the synth fixtures are ASCII-only by construction
    * (same regime `HtmlExtract` documents). */
  private def utf8(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** One WARC record as bytes (headers + framed payload + the
    * mandated trailing blank lines). */
  private def record(headers: Seq[(String, String)],
                     payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) =>
      h.append(k).append(": ").append(v).append(CRLF) }
    h.append("Content-Length: ").append(payload.length).append(CRLF)
    h.append(CRLF)
    val head = ascii(h.toString)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bo)
    gz.write(bytes); gz.close()
    bo.toByteArray
  }

  /** Deterministic `.warc.gz` files from corpus rows: documents are
    * dealt `recordsPerFile` per file by `id div recordsPerFile`, each
    * file opens with a `warcinfo` record and then one `response`
    * record per document — target URI `http://example.org/doc/<id>`,
    * payload a minimal HTTP/1.1 response whose body is the
    * [[Html.synthHtml]] page for that row (so a WARC → demux → HTML
    * extraction funnel is fully closed-form). Per-record gzip
    * members, the Common Crawl layout. Output: (file_id, warc). */
  def synthWarc(df: DataFrame, id: Column, text: Column,
                recordsPerFile: Int = 20): DataFrame = {
    require(recordsPerFile >= 1,
      s"synthWarc: recordsPerFile $recordsPerFile < 1")
    val pages = Html.synthHtml(df, id, text)
      .withColumn("file_id", expr(s"page_id div $recordsPerFile"))
      .groupBy("file_id")
      .agg(sort_array(collect_list(struct(col("page_id"), col("html"))))
        .as("recs"))
    val spark = pages.sparkSession
    val outSchema = StructType(Seq(
      StructField("file_id", LongType),
      StructField("warc", BinaryType)))
    val rdd = pages.rdd.mapPartitions { rows =>
      rows.map { r =>
        val fileId = r.getLong(r.fieldIndex("file_id"))
        val recs = r.getSeq[Row](r.fieldIndex("recs"))
        val bo = new ByteArrayOutputStream()
        bo.write(gzipMember(record(
          Seq("WARC-Type" -> "warcinfo", "WARC-Date" -> DATE),
          utf8(INFO_BODY))))
        recs.foreach { rec =>
          val docId = rec.getLong(0)
          val html = rec.getString(1)
          val http = "HTTP/1.1 200 OK" + CRLF +
            "Content-Type: text/html" + CRLF + CRLF + html
          bo.write(gzipMember(record(
            Seq("WARC-Type" -> "response",
              "WARC-Target-URI" -> s"http://example.org/doc/$docId",
              "WARC-Date" -> DATE),
            utf8(http))))
        }
        Row(fileId, bo.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Parse one WARC file (gzip multi-member — magic 1f 8b — or plain
    * concatenated records). Bounds-checked: truncation, a missing
    * header terminator, a bad or lying Content-Length all throw
    * IllegalArgumentException (a curation pass quarantines, it never
    * mis-parses silently). */
  def parseWarc(blob: Array[Byte]): Seq[Record] = {
    val bytes =
      if (blob.length >= 2 && (blob(0) & 0xff) == 0x1f &&
          (blob(1) & 0xff) == 0x8b) {
        val in = new GZIPInputStream(new ByteArrayInputStream(blob))
        val bo = new ByteArrayOutputStream(blob.length * 4)
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bo.write(buf, 0, n); n = in.read(buf) }
        bo.toByteArray
      } else blob
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var i = 0
    val n = bytes.length
    def find(target: String, from: Int): Int = {
      val t = ascii(target)
      var p = from
      while (p + t.length <= n) {
        var j = 0
        while (j < t.length && bytes(p + j) == t(j)) j += 1
        if (j == t.length) return p
        p += 1
      }
      -1
    }
    while (i < n) {
      // skip inter-record blank lines
      while (i + 1 < n && bytes(i) == '\r' && bytes(i + 1) == '\n')
        i += 2
      if (i >= n) return out.toSeq
      val headEnd = find(CRLF + CRLF, i)
      require(headEnd >= 0, s"warc: no header terminator after $i")
      val head = new String(bytes, i, headEnd - i,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val lines = head.split("\r\n", -1)
      require(lines.nonEmpty && lines(0).startsWith("WARC/"),
        s"warc: bad version line at $i: '${lines.headOption.getOrElse("")}'")
      var warcType: String = null
      var uri: String = null
      var len = -1L
      lines.drop(1).foreach { ln =>
        val c = ln.indexOf(':')
        require(c > 0, s"warc: malformed header line '$ln'")
        val k = ln.substring(0, c).trim.toLowerCase
        val v = ln.substring(c + 1).trim
        k match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v
          case "content-length" =>
            len = try v.toLong catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"warc: bad Content-Length '$v'")
            }
          case _ => ()
        }
      }
      require(warcType != null, s"warc: record at $i lacks WARC-Type")
      require(len >= 0, s"warc: record at $i lacks Content-Length")
      val payloadStart = headEnd + 4
      require(payloadStart + len <= n,
        s"warc: truncated payload at $payloadStart (need $len)")
      var status: Integer = null
      var body: String = null
      if (warcType == "response") {
        val p = new String(bytes, payloadStart, len.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
        val statusLine = p.takeWhile(_ != '\r')
        val parts = statusLine.split(" ")
        require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
          s"warc: bad HTTP status line '$statusLine'")
        status = try Integer.valueOf(parts(1)) catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"warc: bad HTTP status '${parts(1)}'")
        }
        val sep = p.indexOf(CRLF + CRLF)
        body = if (sep < 0) "" else p.substring(sep + 4)
      }
      out += Record(warcType, uri, len, status, body)
      i = payloadStart + len.toInt
    }
    out.toSeq
  }

  /** Record-level demux over (fileId, blob) rows: one output row per
    * WARC record — (file_id, rec_idx, warc_type, uri, content_length,
    * http_status, body). Null blob yields no rows. */
  def readWarcRecords(df: DataFrame, fileIdName: String,
                      blobName: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("file_id", LongType),
      StructField("rec_idx", IntegerType, nullable = false),
      StructField("warc_type", StringType),
      StructField("uri", StringType),
      StructField("content_length", LongType),
      StructField("http_status", IntegerType),
      StructField("body", StringType)))
    val fIdx = df.schema.fieldIndex(fileIdName)
    val bIdx = df.schema.fieldIndex(blobName)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val blob = r.getAs[Array[Byte]](bIdx)
        if (blob == null) Iterator.empty
        else {
          val fileId = r.getLong(fIdx)
          parseWarc(blob).iterator.zipWithIndex.map { case (rec, k) =>
            Row(fileId, k, rec.warcType, rec.uri, rec.contentLength,
              rec.httpStatus, rec.body)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
