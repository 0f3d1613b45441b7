package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Warc

/** WARC container writer/parser: round trip, plain-vs-gzip
  * transparency, and the malformed-input failure contract (a curation
  * pass quarantines bad files — it never mis-parses silently). */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docsDf(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"alpha beta gamma doc $i word"))
      .toDF("doc_id", "text")
  }

  test("round trip: files, record counts, order, uris, status") {
    val warcs = Warc.synthWarc(docsDf(45), col("doc_id"), col("text"),
      recordsPerFile = 20)
    assert(warcs.count() == 3) // 20 + 20 + 5
    val recs = Warc.readWarcRecords(warcs, "file_id", "warc")
      .orderBy("file_id", "rec_idx").collect()
    assert(recs.length == 3 + 45) // warcinfo per file + one per doc
    val first = recs(0)
    assert(first.getAs[String]("warc_type") == "warcinfo")
    assert(first.isNullAt(first.fieldIndex("uri")))
    assert(first.getAs[Long]("content_length") == 22)
    val r1 = recs(1)
    assert(r1.getAs[String]("warc_type") == "response")
    assert(r1.getAs[String]("uri") == "http://example.org/doc/0")
    assert(r1.getAs[Int]("http_status") == 200)
    assert(r1.getAs[String]("body").contains("<h1>Doc &amp; 0</h1>"))
    // content frames exactly: header bytes (44) + body
    assert(r1.getAs[Long]("content_length") ==
      44 + r1.getAs[String]("body").length)
    // last file carries the tail 5 docs
    assert(recs.count(_.getAs[Long]("file_id") == 2L) == 6)
  }

  test("non-ASCII corpus text round-trips intact (UTF-8 payloads)") {
    import spark.implicits._
    val txt = "café über naïve — résumé"
    val warcs = Warc.synthWarc(Seq((0L, txt)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), recordsPerFile = 10)
    val recs = Warc.readWarcRecords(warcs, "file_id", "warc")
      .orderBy("rec_idx").collect()
    val body = recs(1).getAs[String]("body")
    assert(body.contains("café") && body.contains("—"))
    assert(!body.contains("�") && !body.contains("?ber"))
    // Content-Length counts UTF-8 BYTES of the (44-byte-header) body
    val utf8Len = body.getBytes("UTF-8").length
    assert(recs(1).getAs[Long]("content_length") == 44 + utf8Len)
    assert(utf8Len > body.length) // the multi-byte chars are real
  }

  test("plain (uncompressed) record streams parse identically") {
    val warcs = Warc.synthWarc(docsDf(3), col("doc_id"), col("text"),
      recordsPerFile = 10).collect()
    val gz = warcs(0).getAs[Array[Byte]]("warc")
    val recs = Warc.parseWarc(gz)
    // rebuild the plain concatenation from the parsed records and
    // re-parse: same record list
    val plain = new java.io.ByteArrayOutputStream()
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(gz))
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n >= 0) { plain.write(buf, 0, n); n = in.read(buf) }
    assert(Warc.parseWarc(plain.toByteArray) == recs)
    assert(recs.length == 4)
  }

  test("truncated payload and missing terminator throw") {
    val good = Warc.parseWarc(buildRecord("response", 30,
      "HTTP/1.1 200 OK\r\n\r\nbody here!!"))
    assert(good.head.body == "body here!!")
    intercept[IllegalArgumentException] { // payload cut short
      Warc.parseWarc(buildRecord("response", 500,
        "HTTP/1.1 200 OK\r\n\r\nbody"))
    }
    intercept[IllegalArgumentException] { // no \r\n\r\n header end
      Warc.parseWarc("WARC/1.0\r\nWARC-Type: response\r\n".getBytes)
    }
  }

  test("a lying (short) Content-Length surfaces as a framing error") {
    // declared 10 < actual 30: the next 'record' starts mid-payload
    intercept[IllegalArgumentException] {
      Warc.parseWarc(buildRecord("response", 10,
        "HTTP/1.1 200 OK\r\n\r\nbody that is much longer"))
    }
  }

  test("bad content-length and bad status line throw") {
    intercept[IllegalArgumentException] {
      Warc.parseWarc(("WARC/1.0\r\nWARC-Type: x\r\n" +
        "Content-Length: abc\r\n\r\n").getBytes)
    }
    intercept[IllegalArgumentException] {
      Warc.parseWarc(buildRecord("response", 9, "NOT-HTTP!"))
    }
  }

  private def buildRecord(warcType: String, declaredLen: Int,
                          payload: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"Content-Length: $declaredLen\r\n\r\n" + payload + "\r\n\r\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
}
