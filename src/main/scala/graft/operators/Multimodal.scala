package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` payloads with a typed metadata struct, processed by
  * partition-batched decoders.
  *
  * The Spark-side shape is the real deliverable — schema, partitioning,
  * batched iteration, output contract. The decoders themselves are
  * STUBS: this container has no image/audio codecs, so
  * [[StubCodec.decodeImage]] derives deterministic fake dimensions/features
  * from the payload bytes. Swapping in a real codec (JNI or a library on
  * the executor classpath) changes only that one function — the
  * `mapPartitions` plumbing, amortized per-partition setup, and schemas
  * stay as they are. (In PySpark the same shape is `mapInPandas` with an
  * arrow-batched UDF.)
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. png, wav, mp4
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))    // md5 of payload

  val imageFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** ======= STUB CODEC =======
    * Deterministic fake decode: dimensions and "luma" derive from payload
    * bytes, so tests are stable and the pipeline is end-to-end runnable.
    * Replace with a real decoder to productionize; everything else stands. */
  object StubCodec {
    def decodeImage(payload: Array[Byte]): (Int, Int, Int, Double) = {
      // ??? real codec goes here — fake it deterministically (modular fold,
      // so h stays < 2^30 and the formula replays in any BIGINT engine):
      val h = payload.foldLeft(17L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
      val width = 64 + (h % 960).toInt
      val height = 64 + ((h >> 10) % 960).toInt
      val channels = 1 + ((h >> 20) % 3).toInt
      val meanLuma = ((h >> 22) % 256).toDouble / 255.0
      (width, height, channels, meanLuma)
    }

    /** Fake frame sampler: returns the byte offsets a real sampler would
      * decode, one per sampled frame. */
    def sampleFrameOffsets(nBytes: Long, everyNth: Int, frameSize: Int): Seq[Long] =
      if (nBytes <= 0 || frameSize <= 0) Seq.empty
      else (0L until nBytes by frameSize.toLong).grouped(everyNth).map(_.head).toSeq
  }

  /** Wrap a text/binary-derived column into the media contract:
    * (idCol, payload binary, meta struct). The fixture derives payloads from
    * document text bytes — the contract is what matters, not the pixels. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String, format: String): DataFrame =
    df.select(col(idCol), col(payloadCol).as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        length(col(payloadCol)).cast("long").as("n_bytes"),
        md5(col(payloadCol)).as("checksum")).as("meta"))

  /** Batched image "decode" + feature extraction over payloads.
    * mapPartitions amortizes per-partition codec setup (the reference
    * amortizes its HTTP client the same way, `create_skill_embeddings.py:27-28`);
    * rows stream through without materializing the partition. */
  def extractImageFeatures(media: DataFrame, idCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would happen here (once, not per row)
        it.map { case (id, payload) =>
          val (w, h, c, luma) = StubCodec.decodeImage(payload)
          (id, w, h, c, luma)
        }
      }
      .toDF(idCol, "width", "height", "n_channels", "mean_luma")
  }

  /** "Resize": emit a derived payload capped at maxBytes plus the scale
    * factor applied — the shape of a real thumbnailing pass. */
  def resizePayloads(media: DataFrame, idCol: String, maxBytes: Int): DataFrame =
    media.select(col(idCol),
      substring(col("payload"), 1, maxBytes).as("payload"),
      least(lit(1.0d), lit(maxBytes.toDouble) / col("meta.n_bytes")).as("scale"))

  /** Frame sampling contract over "video" payloads: one row per sampled
    * frame with its byte offset. Pure `sequence()` arithmetic — the sampled
    * offsets 0, step, 2·step … < n_bytes are exactly
    * `sequence(0, n_bytes-1, step)` with step = frameSize·everyNth, so the
    * whole operator stays inside whole-stage codegen (no UDF, no
    * serialization); [[StubCodec.sampleFrameOffsets]] remains the scalar
    * spec the column form is cross-checked against in MultimodalSpec. */
  def sampleFrames(media: DataFrame, idCol: String, everyNth: Int,
      frameSize: Int): DataFrame = {
    require(everyNth > 0 && frameSize > 0,
      s"everyNth $everyNth / frameSize $frameSize must be positive")
    val step = frameSize.toLong * everyNth
    val offsets = when(col("meta.n_bytes") > 0,
      sequence(lit(0L), col("meta.n_bytes") - 1, lit(step)))
      .otherwise(array().cast("array<long>"))
    media.select(col(idCol), explode(offsets).as("frame_offset"))
      .withColumn("frame_idx", (col("frame_offset") / lit(step)).cast("long"))
  }
}
