package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.StubCodec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "x" * 5000), (2L, "short"), (3L, "y" * 1024)).toDF("doc_id", "text")
  private lazy val media = Multimodal.asMediaTable(
    docs.withColumn("payload", encode(col("text"), "UTF-8")),
    "doc_id", "payload", "video", "mp4")

  test("media contract: payload + typed meta struct with checksum") {
    val r = media.select($"doc_id", $"meta.media_type", $"meta.n_bytes", $"meta.checksum")
      .as[(Long, String, Long, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == "video" && r(1L)._3 == 5000L)
    assert(r(2L)._4.length == 32) // md5 hex
  }

  test("stub decode is deterministic and in-range") {
    val (w, h, c, l) = StubCodec.decodeImage("hello".getBytes)
    assert((w, h, c, l) == StubCodec.decodeImage("hello".getBytes))
    assert(w >= 64 && w < 1024 && h >= 64 && h < 1024)
    assert(c >= 1 && c <= 3 && l >= 0.0 && l <= 1.0)
  }

  test("extractImageFeatures maps every payload through the batched decoder") {
    val f = Multimodal.extractImageFeatures(media, "doc_id")
    assert(f.columns.toSeq == Seq("doc_id", "width", "height", "n_channels", "mean_luma"))
    assert(f.count() == 3)
    val direct = StubCodec.decodeImage(("x" * 5000).getBytes)
    val row = f.filter($"doc_id" === 1L).head()
    assert((row.getInt(1), row.getInt(2), row.getInt(3), row.getDouble(4)) == direct)
  }

  test("sampleFrames yields one row per sampled frame with correct offsets") {
    val fr = Multimodal.sampleFrames(media, "doc_id", everyNth = 4, frameSize = 256)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    // 5000 bytes / (256*4) → offsets 0,1024,2048,3072,4096
    assert(fr(1L).map(_._2).sorted.toSeq == Seq(0L, 1024L, 2048L, 3072L, 4096L))
    val idxByOffset = fr(1L).map(t => (t._2, t._3)).toMap
    assert(idxByOffset(2048L) == 2L) // frame_idx
    assert(fr(2L).map(_._2).toSeq == Seq(0L))
    assert(fr(3L).map(_._2).sorted.toSeq == Seq(0L))
    // the sequence() column form must match the scalar stub spec exactly
    for ((id, n) <- Seq(1L -> 5000L, 2L -> 5L, 3L -> 1024L))
      assert(fr(id).map(_._2).sorted.toSeq ==
        StubCodec.sampleFrameOffsets(n, everyNth = 4, frameSize = 256))
  }

  test("resizePayloads caps bytes and reports the applied scale") {
    val r = Multimodal.resizePayloads(media, "doc_id", 4096)
      .select($"doc_id", length($"payload").cast("long"), $"scale")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L)._1 == 4096L); assertNear(r(1L)._2, 4096.0 / 5000.0)
    assert(r(2L)._1 == 5L); assertNear(r(2L)._2, 1.0)
  }
}
