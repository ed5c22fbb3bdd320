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

  private def pngBytes(rgbByXY: Map[(Int, Int), Int], w: Int, h: Int,
      format: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgbByXY.foreach { case ((x, y), rgb) => img.setRGB(x, y, rgb) }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  test("real PNG payloads decode through ImageIO to exact dims/channels/luma") {
    // white, black, pure red, pure green → Rec.601 lumas 1, 0, .299, .587
    val png = pngBytes(Map((0, 0) -> 0xffffff, (1, 0) -> 0x000000,
      (0, 1) -> 0xff0000, (1, 1) -> 0x00ff00), w = 2, h = 2)
    val (w, h, c, luma) = StubCodec.decodeImage(png)
    assert((w, h, c) == (2, 2, 3))
    assertNear(luma, (1.0 + 0.0 + 0.299 + 0.587) / 4)
  }

  test("real JPEG payloads decode through ImageIO; corrupt images fall back") {
    // a solid-gray JPEG survives lossy compression near-exactly
    val jpg = pngBytes(Map((0, 0) -> 0x808080, (1, 0) -> 0x808080,
      (0, 1) -> 0x808080, (1, 1) -> 0x808080), w = 2, h = 2, format = "jpg")
    val (w, h, c, luma) = StubCodec.decodeImage(jpg)
    assert((w, h, c) == (2, 2, 3))
    assert(math.abs(luma - 128.0 / 255.0) < 0.02, s"gray luma off: $luma")
    // PNG magic followed by garbage: ImageIO returns null → stub path
    val corrupt = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      1, 2, 3)
    assert(StubCodec.decodeImage(corrupt) ==
      StubCodec.decodeImage(corrupt)) // deterministic, no throw
  }

  test("extractImageFeatures decodes real PNG payloads in the Spark path") {
    val png = pngBytes(Map((0, 0) -> 0xffffff, (1, 0) -> 0x000000,
      (0, 1) -> 0xff0000, (1, 1) -> 0x00ff00), w = 2, h = 2)
    val pngMedia = Multimodal.asMediaTable(
      Seq((7L, png)).toDF("doc_id", "payload"), "doc_id", "payload", "image", "png")
    val row = Multimodal.extractImageFeatures(pngMedia, "doc_id").head()
    assert((row.getLong(0), row.getInt(1), row.getInt(2), row.getInt(3)) == ((7L, 2, 2, 3)))
    assertNear(row.getDouble(4), (1.0 + 0.0 + 0.299 + 0.587) / 4)
  }

  test("extractImageFeatures maps every payload through the batched decoder") {
    val f = Multimodal.extractImageFeatures(media, "doc_id")
    assert(f.columns.toSeq == Seq("doc_id", "width", "height", "n_channels", "mean_luma"))
    assert(f.count() == 3)
    val direct = StubCodec.decodeImage(("x" * 5000).getBytes)
    val row = f.filter($"doc_id" === 1L).head()
    assert((row.getInt(1), row.getInt(2), row.getInt(3), row.getDouble(4)) == direct)
  }

  /** One PCM16 mono WAV of a constant amplitude square-ish signal — RMS of a
    * constant-magnitude signal equals that magnitude, so the assertion is
    * exact up to 16-bit quantization. */
  private def wavBytes(sampleRate: Int, nSamples: Int, amp: Short): Array[Byte] = {
    val samples = Array.tabulate(nSamples)(i => if (i % 2 == 0) amp else (-amp).toShort)
    val data = new Array[Byte](nSamples * 2)
    java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV payloads decode through javax.sound.sampled") {
    val wav = wavBytes(sampleRate = 16000, nSamples = 8000, amp = 16384)
    val (rate, ch, dur, rms) = StubCodec.decodeAudio(wav)
    assert((rate, ch) == ((16000, 1)))
    assertNear(dur, 0.5) // 8000 frames at 16 kHz
    assert(math.abs(rms - 0.5) < 1e-4, s"constant-|0.5| signal RMS off: $rms")
    // truncated RIFF header falls back to the stub deterministically
    val corrupt = "RIFFxxxxWAVEgarbage".getBytes
    assert(StubCodec.decodeAudio(corrupt) == StubCodec.decodeAudio(corrupt))
  }

  test("extractAudioFeatures decodes real WAV payloads in the Spark path") {
    val wav = wavBytes(sampleRate = 8000, nSamples = 4000, amp = 8192)
    val audioMedia = Multimodal.asMediaTable(
      Seq((9L, wav)).toDF("doc_id", "payload"), "doc_id", "payload", "audio", "wav")
    val row = Multimodal.extractAudioFeatures(audioMedia, "doc_id").head()
    assert((row.getLong(0), row.getInt(1), row.getInt(2)) == ((9L, 8000, 1)))
    assertNear(row.getDouble(3), 0.5)
    assert(math.abs(row.getDouble(4) - 0.25) < 1e-4)
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

  test("Mp4 round-trips box metadata and refuses non-BMFF payloads") {
    import graft.functions.Mp4
    val bytes = Mp4.build("isom", 90000, 270000, 1920, 1080)
    val m = Mp4.parse(bytes).get
    assert(m.brand == "isom" && m.timescale == 90000L && m.duration == 270000L)
    assert(m.width == 1920 && m.height == 1080)
    assertNear(m.durationSeconds, 3.0)
    // Garbage, truncation mid-box, and empty input all parse to None — the
    // NonFatal-equivalent contract extractVideoMeta nulls rows on.
    assert(Mp4.parse("not a video at all".getBytes("UTF-8")).isEmpty)
    assert(Mp4.parse(bytes.take(bytes.length - 20)).isEmpty)
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    // Hostile size field near Int.MaxValue: `at + size` wraps negative in
    // int arithmetic — the walk must stop, not read out of bounds.
    val hostile = Mp4.build("isom", 1, 1, 1, 1).take(24) ++
      Array[Byte](0x7f, -1, -1, -1) ++ "moov".getBytes("ISO-8859-1")
    assert(Mp4.parse(hostile).isEmpty)
  }

  test("extractVideoMeta parses built payloads and nulls garbage ones") {
    import graft.functions.Mp4
    val rows = Seq(
      (1L, Mp4.build("mp42", 600, 1800, 320, 240)),
      (2L, "junk payload".getBytes("UTF-8")))
    val media = Multimodal.asMediaTable(rows.toDF("id", "payload"),
      "id", "payload", "video", "mp4")
    val out = Multimodal.extractVideoMeta(media, "id")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mp42" && out(0).getLong(2) == 600L &&
      out(0).getLong(3) == 1800L && out(0).getInt(5) == 320 &&
      out(0).getInt(6) == 240)
    assertNear(out(0).getDouble(4), 3.0)
    assert(out(1).isNullAt(1) && out(1).getLong(2) == 0L)
  }
}
