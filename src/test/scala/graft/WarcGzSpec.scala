package graft

import org.apache.spark.sql.functions._
import graft.io.WarcGz
import graft.functions.expr.HttpMessage

/** The compressed binary WARC path: RFC 1952 member codec exactness and
  * loudness, HTTP envelope decoding (chunked + Content-Encoding), record
  * framing arbitration, and the distributed write/read roundtrip. */
class WarcGzSpec extends SparkSpec {
  import spark.implicits._

  private def gunzipAll(b: Array[Byte]): Seq[Array[Byte]] =
    WarcGz.memberIterator(new java.io.ByteArrayInputStream(b), "<bytes>").toSeq

  test("gzip member roundtrip is exact and deterministic; members concatenate") {
    val a = "hello crawl".getBytes("UTF-8")
    val b = Array.tabulate(100000)(i => (i % 251).toByte)
    val ga = WarcGz.gzipMember(a)
    assert(java.util.Arrays.equals(ga, WarcGz.gzipMember(a)),
      "same input must compress to identical bytes (retry twins)")
    val back = gunzipAll(ga ++ WarcGz.gzipMember(b))
    assert(back.size == 2)
    assert(java.util.Arrays.equals(back(0), a))
    assert(java.util.Arrays.equals(back(1), b))
    // JDK interop: java.util.zip.GZIPInputStream reads our member
    val jdk = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(ga)).readAllBytes()
    assert(java.util.Arrays.equals(jdk, a))
    // and we read a JDK-written member (with its own header fields)
    val bos = new java.io.ByteArrayOutputStream()
    val gos = new java.util.zip.GZIPOutputStream(bos)
    gos.write(a); gos.close()
    assert(java.util.Arrays.equals(gunzipAll(bos.toByteArray).head, a))
  }

  test("corrupt gzip members raise instead of silently dropping records") {
    val g = WarcGz.gzipMember("payload bytes here".getBytes("UTF-8"))
    // flipped payload byte -> CRC mismatch (or a deflate error, both loud)
    val flip = g.clone(); flip(12) = (flip(12) ^ 0x01).toByte
    val e = intercept[Exception] { gunzipAll(flip) }
    assert(e.getMessage.contains("<bytes>") || e.getMessage.nonEmpty)
    // truncated mid-deflate -> loud
    val cut = java.util.Arrays.copyOfRange(g, 0, g.length - 12)
    val e2 = intercept[IllegalArgumentException] { gunzipAll(cut) }
    assert(e2.getMessage.contains("truncated") || e2.getMessage.contains("corrupt"),
      e2.getMessage)
    // wrong magic -> loud, names the source
    val e3 = intercept[IllegalArgumentException] {
      gunzipAll("not gzip at all".getBytes("UTF-8"))
    }
    assert(e3.getMessage.contains("not a gzip member"), e3.getMessage)
  }

  test("http body: plain, chunked, gzip, and chunked extensions decode at the byte level") {
    def msg(hdrs: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\n$hdrs\r\n").getBytes("ISO-8859-1") ++ body
    val body = "the quick brown body".getBytes("UTF-8")
    assert(java.util.Arrays.equals(
      HttpMessage.body(msg("Content-Type: text/html\r\n", body)), body))
    // chunked: two chunks + an ignored chunk extension + trailer dropped
    val chunked = ("5;ext=1\r\n" + "the q" + "\r\n" +
      Integer.toHexString(body.length - 5) + "\r\n").getBytes("ISO-8859-1") ++
      java.util.Arrays.copyOfRange(body, 5, body.length) ++
      "\r\n0\r\nX-Trailer: t\r\n\r\n".getBytes("ISO-8859-1")
    assert(java.util.Arrays.equals(
      HttpMessage.body(msg("Transfer-Encoding: chunked\r\n", chunked)), body))
    // gzip content-encoding
    assert(java.util.Arrays.equals(
      HttpMessage.body(msg("Content-Encoding: gzip\r\n",
        WarcGz.gzipMember(body))), body))
    // chunked THEN gzip (transfer framing first, representation second)
    val gz = WarcGz.gzipMember(body)
    val chunkedGz = (Integer.toHexString(gz.length) + "\r\n")
      .getBytes("ISO-8859-1") ++ gz ++ "\r\n0\r\n\r\n".getBytes("ISO-8859-1")
    assert(java.util.Arrays.equals(
      HttpMessage.body(msg(
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chunkedGz)), body))
    // torn chunk framing raises; unsupported encodings raise by name
    intercept[IllegalArgumentException] {
      HttpMessage.body(msg("Transfer-Encoding: chunked\r\n",
        "ff\r\nshort".getBytes("ISO-8859-1")))
    }
    val e = intercept[IllegalArgumentException] {
      HttpMessage.body(msg("Content-Encoding: br\r\n", body))
    }
    assert(e.getMessage.contains("br"), e.getMessage)
  }

  test("record framing: Content-Length arbitrates; a torn record surfaces clen_ok=false") {
    val p = "exact payload".getBytes("UTF-8")
    val rec = WarcGz.recordBytes(7L, "http://ex.org/7", p)
    val row = WarcGz.parseRecord(rec, "<bytes>")
    assert(row.getLong(0) == 7L && row.getString(1) == "http://ex.org/7")
    assert(row.getBoolean(3), "a clean record verifies its Content-Length")
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]](4), p))
    // a record whose terminator was torn off: raw tail stands, clen_ok false
    val torn = java.util.Arrays.copyOfRange(rec, 0, rec.length - 6)
    val rowT = WarcGz.parseRecord(torn, "<bytes>")
    assert(!rowT.getBoolean(3), "torn framing must surface, never silently pass")
  }

  test("a re-export to the same directory replaces the previous corpus — stale part files never pollute the glob read") {
    val dir = s"/tmp/graft_warcgz_stale_${System.nanoTime()}"
    def corpus(n: Int) = spark.range(0, n)
      .select($"id",
        concat(lit("http://ex.org/"), $"id".cast("string")).as("uri"),
        encode(concat(lit("gen "), $"id".cast("string")), "UTF-8").as("p"))
    WarcGz.write(corpus(40), "id", "uri", "p", dir, 4) // 4 part files
    WarcGz.write(corpus(10), "id", "uri", "p", dir, 2) // re-export, smaller
    val back = WarcGz.read(spark, dir)
    assert(back.count() == 10,
      "the second export must fully replace the first — parts 2..3 gone")
    assert(back.agg(max($"record_id")).head().getLong(0) == 9L)
  }

  test("distributed write/read roundtrip: every record, binary payloads exact, one task per file") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        concat(lit("http://ex.org/doc/"), $"doc_id".cast("string")).as("uri"),
        // payload with bytes INVALID in UTF-8 — the text path would mangle
        // them; the binary path must round-trip exactly
        concat(encode($"text", "UTF-8"),
          lit(Array[Byte](0x93.toByte, 0xFA.toByte, 0x00.toByte))).as("payload"))
    val dir = s"/tmp/graft_warcgz_spec_${System.nanoTime()}"
    WarcGz.write(docs, "doc_id", "uri", "payload", dir, 3)
    val back = WarcGz.read(spark, dir)
    assert(back.count() == docs.count())
    assert(back.filter(!col("clen_ok")).count() == 0)
    val joined = back.select($"record_id".as("doc_id"), $"payload".as("got"))
      .join(docs.select($"doc_id", $"payload".as("want")), "doc_id")
    assert(joined.filter(col("got") =!= col("want")).count() == 0,
      "binary payloads must survive byte-for-byte")
    // file-granularity parallelism: 3 shards -> 3 input partitions
    assert(back.rdd.getNumPartitions == 3)
  }
}
