package graft

import org.apache.spark.sql.functions._
import graft.io.Warc

/** WARC container ingest: record assembly off the splittable text source,
  * header parse, Content-Length verification, HTTP envelope strip — and
  * the loudness of a torn/forged record. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  test("write/read roundtrip: every record, every header, Content-Length verified") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val dir = s"/tmp/graft_warcspec_${System.nanoTime()}"
    Warc.write(docs.repartition(3), "doc_id",
      concat(lit("http://ex.org/doc/"), $"doc_id".cast("string")),
      concat(lit("<p>"), $"text", lit("</p>")), dir)
    val back = Warc.read(spark, dir)
    assert(back.count() == docs.count())
    assert(back.filter(!$"clen_ok").count() == 0,
      "every declared Content-Length must verify")
    assert(back.filter($"record_id".isNull).count() == 0)
    // ids and uris reconstruct exactly
    val idSum = docs.agg(sum($"doc_id")).head().getLong(0)
    assert(back.agg(sum($"record_id")).head().getLong(0) == idSum)
    assert(back.filter($"target_uri" ===
      concat(lit("http://ex.org/doc/"), $"record_id".cast("string"))).count()
      == docs.count())
    // the HTTP envelope strips to exactly the written body
    val bodies = back.select($"record_id".as("doc_id"),
      Warc.httpBody($"payload").as("body"))
    val want = docs.select($"doc_id",
      concat(lit("<p>"), $"text", lit("</p>")).as("body"))
    assert(bodies.exceptAll(want).isEmpty && want.exceptAll(bodies).isEmpty,
      "HTTP body must reproduce the payload byte-for-byte")
  }

  test("payloads ending in CRLFs survive intact — Content-Length arbitrates the terminal-separator trim") {
    // doc 1's body ends with one CRLF, doc 2's with a full blank line —
    // the file-terminal separator must not eat payload bytes (review
    // finding: a blanket trailing-CRLF trim corrupted such payloads)
    val dir = s"/tmp/graft_warcspec_crlf_${System.nanoTime()}"
    Warc.write(Seq((1L, "body one\r\n"), (2L, "body two\r\n\r\n"), (3L, "plain"))
      .toDF("doc_id", "text").repartition(1).sortWithinPartitions("doc_id"),
      "doc_id", concat(lit("u"), $"doc_id"), $"text", dir)
    val back = Warc.read(spark, dir).orderBy("record_id").collect()
    assert(back.length == 3)
    assert(back.forall(_.getBoolean(3)), "every Content-Length must verify")
    val bodies = back.map(_.getString(4).split("\r\n\r\n", 2)(1))
    assert(bodies(0) == "body one\r\n", "a single trailing CRLF survives")
    assert(bodies(1) == "body two\r\n\r\n", "a trailing blank line survives")
    assert(bodies(2) == "plain")
  }

  test("a payload shorter than its declared Content-Length surfaces clen_ok = false, not a silent pass") {
    val dir = s"/tmp/graft_warcspec_torn_${System.nanoTime()}"
    Warc.write(Seq((1L, "intact body text")).toDF("doc_id", "text"), "doc_id",
      lit("http://ex.org/1"), $"text", dir)
    // tear the record: truncate payload bytes behind the declared length
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 8))
    // the out-of-band tamper invalidates Hadoop's local CRC sidecar —
    // remove it so the read exercises OUR Content-Length gate, not the
    // local filesystem's
    new java.io.File(dir, "." + f.getName + ".crc").delete()
    val back = Warc.read(spark, dir)
    assert(back.count() == 1)
    assert(back.filter(!$"clen_ok").count() == 1,
      "the torn record must fail its Content-Length check")
  }

  test("multi-record files split correctly: first record keeps its version line, later ones reassemble") {
    // one partition => one file holding all records, exercising the
    // delimiter-based record assembly within a file
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text").repartition(1)
    val dir = s"/tmp/graft_warcspec_multi_${System.nanoTime()}"
    Warc.write(docs, "doc_id", concat(lit("u"), $"doc_id"), $"text", dir)
    val back = Warc.read(spark, dir).orderBy("record_id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back.forall(_.getBoolean(3)), "all clen_ok")
    assert(back.map(_.getString(4).split("\r\n\r\n", 2)(1)).toSeq ==
      Seq("alpha", "beta", "gamma"))
  }
}
