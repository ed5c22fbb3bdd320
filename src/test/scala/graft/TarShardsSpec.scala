package graft

import org.apache.spark.sql.functions._
import graft.io.TarShards

/** The WebDataset-style tar-shard layout: ustar encode/decode exactness,
  * loud corruption, the distributed write/read roundtrip, and the
  * contiguity contract the shuffle-free sample pivot rides on. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  test("ustar roundtrip is exact; payloads padded; order preserved") {
    val members = Seq(
      "000000000001.txt" -> "hello world".getBytes("UTF-8"),
      "000000000001.cls" -> "en".getBytes("UTF-8"),
      "000000000002.txt" -> Array.tabulate(1024)(i => (i % 251).toByte),
      "000000000002.cls" -> Array.empty[Byte])
    val tar = TarShards.tarBytes(members.iterator)
    // every (header + padded payload) block-aligned, two-block terminator
    assert(tar.length % 512 == 0)
    val back = TarShards.parseTar(tar)
    assert(back.map(_._1) == members.map(_._1), "member order must survive")
    back.zip(members).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want)) }
  }

  test("a flipped byte in a header raises instead of silently skipping the member") {
    val tar = TarShards.tarBytes(Iterator(
      "000000000001.txt" -> "payload".getBytes("UTF-8")))
    tar(124) = '7' // corrupt the size field -> checksum mismatch
    val e = intercept[IllegalArgumentException] { TarShards.parseTar(tar) }
    assert(e.getMessage.contains("checksum"))
  }

  test("distributed write/read roundtrip: every sample, every member, nothing through a join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", encode($"text", "UTF-8").as("txt"),
        encode($"lang", "UTF-8").as("cls"))
    val dir = s"/tmp/graft_tarspec_${System.nanoTime()}"
    val manifest = TarShards.write(docs, "doc_id",
      Seq("txt" -> "txt", "cls" -> "cls"), dir, 4)
    assert(manifest.map(_._2).sum == docs.count())
    // range partitioning: shard key ranges are disjoint and ordered
    manifest.sliding(2).foreach {
      case Seq((_, _, _, hi), (_, _, lo, _)) => assert(hi < lo)
      case _ =>
    }
    val back = TarShards.readSamples(spark, dir, Seq("txt", "cls"))
      .select($"key".as("doc_id"), decode($"txt", "UTF-8").as("text"),
        decode($"cls", "UTF-8").as("lang"))
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "tar roundtrip must reproduce every (doc_id, text, lang) exactly")
    // the sample pivot is map-side: no shuffle in the read plan
    val plan = { back.collect(); back.queryExecution.executedPlan.toString }
    assert(!plan.contains("Exchange"),
      s"sample grouping must ride member contiguity, never a shuffle:\n$plan")
  }

  test("a pre-POSIX NUL typeflag reads as a regular file; other typeflags are skipped") {
    // older tar writers stamp 0x00 (not ASCII '0') for regular files — an
    // externally-produced shard must not have every member silently
    // dropped (r14 ADVICE). A directory typeflag ('5') is still skipped.
    val tar = TarShards.tarBytes(Iterator(
      "000000000001.txt" -> "old-style".getBytes("UTF-8"),
      "000000000002.txt" -> "dir".getBytes("UTF-8"),
      "000000000003.txt" -> "new-style".getBytes("UTF-8")))
    def restamp(block: Int, flag: Byte): Unit = {
      val off = block * 512
      tar(off + 156) = flag
      // re-sign the header checksum the reader verifies
      var sum = 0L
      for (i <- 0 until 512) {
        val b = if (i >= 148 && i < 156) ' '.toByte else tar(off + i)
        sum += (b & 0xff)
      }
      val oct = "%06o".format(sum).getBytes("US-ASCII") :+ 0.toByte :+ ' '.toByte
      System.arraycopy(oct, 0, tar, off + 148, 8)
    }
    restamp(0, 0) // member 1 header is block 0 (payload < 512 -> 1 block)
    restamp(2, '5'.toByte) // member 2 header at block 2
    val back = TarShards.parseTar(tar)
    assert(back.map(_._1) == Seq("000000000001.txt", "000000000003.txt"),
      "NUL typeflag kept, directory skipped")
    assert(new String(back.head._2, "UTF-8") == "old-style")
  }

  test("a >=2 GiB member raises a clear diagnostic, not a negative-length copy") {
    // craft just the header: the size check fires before any payload read
    val h = TarShards.headerBlock("000000000001.bin", 3L << 30)
    val e = intercept[IllegalArgumentException] {
      TarShards.memberIterator(
        new java.io.ByteArrayInputStream(h), "<crafted>").hasNext
    }
    assert(e.getMessage.contains("too large"), e.getMessage)
  }

  test("a truncated member raises instead of silently ending the archive") {
    val tar = TarShards.tarBytes(Iterator(
      "000000000001.txt" -> Array.fill(2000)('x'.toByte)))
    val cut = java.util.Arrays.copyOfRange(tar, 0, 512 + 1000) // mid-payload
    val e = intercept[IllegalArgumentException] { TarShards.parseTar(cut) }
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // torn MID-HEADER (1..511 bytes) is equally loud — it must not read
    // as a clean end-of-archive that silently drops the member
    val tar2 = TarShards.tarBytes(Iterator(
      "000000000001.txt" -> "x".getBytes("UTF-8"),
      "000000000002.txt" -> "y".getBytes("UTF-8")))
    val cut2 = java.util.Arrays.copyOfRange(tar2, 0, 1024 + 200) // mid-header-2
    val e2 = intercept[IllegalArgumentException] { TarShards.parseTar(cut2) }
    assert(e2.getMessage.contains("truncated tar header"), e2.getMessage)
  }

  test("NULL member columns are skipped on write (read surfaces them NULL); an all-NULL sample raises") {
    val dir = s"/tmp/graft_tarspec_skip_${System.nanoTime()}"
    TarShards.write(
      Seq((1L, Some("a".getBytes("UTF-8")), None),
        (2L, None, Some("b".getBytes("UTF-8"))))
        .toDF("doc_id", "txt", "cls"),
      "doc_id", Seq("txt" -> "txt", "cls" -> "cls"), dir, 1)
    val back = TarShards.readSamples(spark, dir, Seq("txt", "cls"))
      .collect().sortBy(_.getLong(0))
    assert(back.length == 2)
    assert(back(0).getAs[Array[Byte]]("txt") != null && back(0).isNullAt(2))
    assert(back(1).isNullAt(1) && back(1).getAs[Array[Byte]]("cls") != null)
    val e = intercept[Exception] {
      TarShards.write(
        Seq((3L, None: Option[Array[Byte]])).toDF("doc_id", "txt"),
        "doc_id", Seq("txt" -> "txt"),
        s"/tmp/graft_tarspec_allnull_${System.nanoTime()}", 1)
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(e).contains("every member"), messages(e))
  }

  test("a missing requested member surfaces NULL, not a dropped sample") {
    val dir = s"/tmp/graft_tarspec_null_${System.nanoTime()}"
    TarShards.write(Seq((1L, "a".getBytes("UTF-8")), (2L, "b".getBytes("UTF-8")))
      .toDF("doc_id", "txt"), "doc_id", Seq("txt" -> "txt"), dir, 1)
    val back = TarShards.readSamples(spark, dir, Seq("txt", "cls"))
    assert(back.count() == 2)
    assert(back.filter(col("cls").isNull).count() == 2)
    assert(back.filter(col("txt").isNull).count() == 0)
  }
}
