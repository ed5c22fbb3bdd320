package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Multimodal

/** Multimodal plumbing queries (BASELINE.json north star). The binary
  * payloads are documents' UTF-8 bytes standing in for image/video blobs —
  * the schema/partitioning/batched-decode shape is what these check, and
  * because the stub codec is modular arithmetic over payload bytes, even the
  * "decode" replays exactly in the DuckDB oracle (ASCII text ⇒ byte stream
  * == character-code stream).
  */
object MediaQueries extends graft.QueryModule {

  private val FrameSize = 256
  private val EveryNth = 4
  private val MaxBytes = 4096

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.asMediaTable(
      Tables.documents(s, dir).withColumn("payload", encode(col("text"), "UTF-8")),
      "doc_id", "payload", "image", "png")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed metadata contract beside every payload.
    "media_meta" -> ((s, dir) =>
      media(s, dir).select(col("doc_id"),
        col("meta.media_type").as("media_type"),
        col("meta.format").as("format"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.checksum").as("checksum"))),
    // Partition-batched stub decode + feature extraction.
    "media_image_features" -> ((s, dir) =>
      Multimodal.extractImageFeatures(media(s, dir), "doc_id")
        .withColumn("mean_luma", round(col("mean_luma"), 6))),
    // Image near-dup census by perceptual hash (Multimodal.aHash
    // scaladoc): identical aHashes are the first dedup tier; the card
    // pins hash distribution + duplicate-bucket shape so the sampling
    // stride, mean compare, and bit packing are all oracle-gated.
    // Seam guards (ADVICE r8): empty payloads are filtered on BOTH
    // engines (Spark would emit (phash=0, n_samples=0) where the
    // oracle's sample join drops the doc), and the stub codec's
    // byte-stream == character-code-stream identity — true only for
    // ASCII text — is asserted in-plan, so a non-ASCII corpus raises
    // loudly on the Spark side instead of silently splitting from the
    // oracle's character sampling.
    "media_phash_dedup" -> ((s, dir) => {
      val ascii = Tables.documents(s, dir).agg(coalesce(sum(
          when(octet_length(col("text")) =!= length(col("text")), 1L)
            .otherwise(0L)), lit(0L)).as("__non_ascii"))
      val ph = Multimodal.aHash(
        media(s, dir).filter(length(col("payload")) > 0), "doc_id")
      val groups = ph.groupBy("phash").agg(count(lit(1)).as("__g"))
      ph.agg(count(lit(1)).as("n_docs"),
          sum(col("phash")).as("phash_checksum"),
          min(col("n_samples")).as("min_samples"))
        .crossJoin(broadcast(groups.agg(
          count(lit(1)).as("n_distinct_hash"),
          sum(when(col("__g") > 1L, 1L).otherwise(0L)).as("n_dup_groups"),
          sum(when(col("__g") > 1L, col("__g")).otherwise(0L))
            .as("n_dup_docs"))))
        .crossJoin(broadcast(ascii))
        .select(col("n_docs"), col("phash_checksum"), col("min_samples"),
          col("n_distinct_hash"), col("n_dup_groups"), col("n_dup_docs"),
          when(col("__non_ascii") === 0L, lit(true))
            .otherwise(raise_error(concat(
              lit("media_phash_dedup: stub codec requires ASCII text; "),
              col("__non_ascii").cast("string"),
              lit(" docs have UTF-8 bytes != chars")))).as("ascii_ok"))
    }),
    // Batched audio decode: text payloads take the deterministic stub path
    // (real WAV decode is exercised on planted fixtures in MultimodalSpec —
    // the JDK ships no codec for the synthetic corpus's "audio").
    "media_audio_features" -> ((s, dir) =>
      Multimodal.extractAudioFeatures(
        Multimodal.asMediaTable(
          Tables.documents(s, dir).withColumn("payload", encode(col("text"), "UTF-8")),
          "doc_id", "payload", "audio", "wav"), "doc_id")
        .withColumn("duration_s", round(col("duration_s"), 6))
        .withColumn("rms", round(col("rms"), 6))),
    // Frame-sampling contract: one row per sampled frame offset.
    "media_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), "doc_id", EveryNth, FrameSize)),
    // Resize/thumbnail contract: capped payload + applied scale.
    "media_resize" -> ((s, dir) =>
      Multimodal.resizePayloads(media(s, dir), "doc_id", MaxBytes)
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("new_bytes"),
          round(col("scale"), 6).as("scale"))),
    // REAL video metadata parsing (graft.functions.Mp4, ISO BMFF boxes):
    // each doc gets a spec-shaped minimal MP4 whose brand/timescale/
    // duration/track-dims derive from doc_id; the oracle pins what the
    // parser must recover, so the build → box-walk → 16.16-decode round
    // trip is hash-gated end to end. (Frame decode remains out of scope —
    // no pure-JDK codec — but partition/filter-grade metadata is real.)
    "media_video_meta" -> ((s, dir) => {
      import s.implicits._
      val vids = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, graft.functions.Mp4.build("isom", 1000,
            (id % 9000).toInt + 1000,
            320 + (id % 8).toInt * 16, 240 + (id % 6).toInt * 16))
        }).toDF("doc_id", "payload")
      Multimodal.extractVideoMeta(
        Multimodal.asMediaTable(vids, "doc_id", "payload", "video", "mp4"),
        "doc_id")
    }))

  private val stubHashCte =
    """h AS (SELECT doc_id, list_reduce(
      |    list_prepend(CAST(17 AS BIGINT),
      |      list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
      |    (a, b) -> (a*31 + b) % 1000000007) AS h
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "media_meta" ->
      """SELECT doc_id, 'image' AS media_type, 'png' AS format,
        |  CAST(len(text) AS BIGINT) AS n_bytes, md5(text) AS checksum
        |FROM documents""".stripMargin,
    "media_image_features" ->
      s"""WITH $stubHashCte
         |SELECT doc_id,
         |  CAST(64 + h % 960 AS INT) AS width,
         |  CAST(64 + (h // 1024) % 960 AS INT) AS height,
         |  CAST(1 + (h // 1048576) % 3 AS INT) AS n_channels,
         |  round(((h // 4194304) % 256) / 255.0, 6) AS mean_luma
         |FROM h""".stripMargin,
    "media_phash_dedup" ->
      """WITH ms AS (SELECT doc_id, text, CAST(len(text) AS BIGINT) AS n,
        |    greatest(CAST(len(text) AS BIGINT) // 32, 1) AS stride
        |  FROM documents WHERE len(text) > 0),
        |sm AS (SELECT doc_id, i,
        |    CAST(ord(substr(text, CAST(i * stride + 1 AS INT), 1)) AS BIGINT) AS s
        |  FROM (SELECT doc_id, text, n, stride,
        |      unnest(generate_series(0, 31)) AS i FROM ms)
        |  WHERE i * stride < n),
        |tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS cnt FROM sm GROUP BY 1),
        |hs AS (SELECT sm.doc_id,
        |    CAST(coalesce(sum(CASE WHEN sm.s * tot.cnt > tot.total
        |      THEN (CAST(1 AS BIGINT) << CAST(sm.i AS INT)) ELSE 0 END), 0)
        |      AS BIGINT) AS phash,
        |    tot.cnt AS n_samples
        |  FROM sm JOIN tot USING (doc_id) GROUP BY sm.doc_id, tot.cnt),
        |g AS (SELECT phash, count(*) AS gg FROM hs GROUP BY 1)
        |SELECT (SELECT count(*) FROM hs) AS n_docs,
        |  (SELECT CAST(sum(phash) AS BIGINT) FROM hs) AS phash_checksum,
        |  (SELECT min(n_samples) FROM hs) AS min_samples,
        |  (SELECT count(*) FROM g) AS n_distinct_hash,
        |  (SELECT count(*) FROM g WHERE gg > 1) AS n_dup_groups,
        |  CAST((SELECT coalesce(sum(gg), 0) FROM g WHERE gg > 1) AS BIGINT)
        |    AS n_dup_docs,
        |  true AS ascii_ok""".stripMargin,
    // duration divides the PAYLOAD's byte length — octet_length(encode()),
    // not len(): a non-ASCII character would make char count and UTF-8 byte
    // count diverge and split the engines.
    "media_audio_features" ->
      s"""WITH $stubHashCte
         |SELECT h.doc_id,
         |  CAST(([8000, 16000, 22050, 44100])[CAST(h.h % 4 AS INT) + 1] AS INT) AS sample_rate,
         |  CAST(1 + (h.h // 256) % 2 AS INT) AS channels,
         |  round(CAST(octet_length(encode(d.text)) AS BIGINT)
         |    / (([8000, 16000, 22050, 44100])[CAST(h.h % 4 AS INT) + 1]
         |       * (1 + (h.h // 256) % 2) * 2.0), 6) AS duration_s,
         |  round(((h.h // 65536) % 1000) / 1000.0, 6) AS rms
         |FROM h JOIN documents d ON h.doc_id = d.doc_id""".stripMargin,
    "media_frame_sample" ->
      s"""SELECT doc_id, frame_offset,
         |  frame_offset // ${FrameSize * EveryNth} AS frame_idx
         |FROM (SELECT doc_id, unnest(generate_series(0,
         |    CAST(len(text) AS BIGINT) - 1, ${FrameSize * EveryNth})) AS frame_offset
         |  FROM documents)""".stripMargin,
    "media_resize" ->
      s"""SELECT doc_id,
         |  CAST(least(len(text), $MaxBytes) AS BIGINT) AS new_bytes,
         |  round(least(1.0, $MaxBytes / CAST(len(text) AS DOUBLE)), 6) AS scale
         |FROM documents""".stripMargin,
    // SQL can't walk MP4 boxes; pinning the GENERATING arithmetic instead
    // makes the oracle a round-trip gate: the parser must recover exactly
    // the fields the builder encoded for every doc.
    "media_video_meta" ->
      """SELECT doc_id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
        |  CAST(doc_id % 9000 + 1000 AS BIGINT) AS duration_ticks,
        |  (doc_id % 9000 + 1000) / 1000.0 AS duration_s,
        |  CAST(320 + (doc_id % 8) * 16 AS INT) AS width,
        |  CAST(240 + (doc_id % 6) * 16 AS INT) AS height
        |FROM documents""".stripMargin)
}
