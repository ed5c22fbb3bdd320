package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{NpySource, Tables}

/** Driver-gated exercise of the distributed matrix sink (SURVEY.md §2.2 K1;
  * the reference's `.npy` export surface, `create_skill_embeddings.py:54-55`).
  * The EXPORT is the scale path — per-partition Hadoop-FS shards, nothing
  * through the driver (`NpySource.writeFloatMatrixSharded`); this query is
  * its round-trip CHECK: write the embeddings table as 4 shards, read them
  * back with the .npy scan, reconstruct global ids from the per-shard min-id
  * manifest (range partitioning keeps the fixture's contiguous `vec_id` runs
  * contiguous per shard), and count element-exact vector mismatches. The
  * oracle pins n_rows to the source table and n_mismatch to zero — a torn
  * shard, dropped row, or lossy value turns the row red.
  */
object IoQueries extends graft.QueryModule {

  private val Shards = 4

  /** The two-version append store behind io_time_travel and
    * io_vacuum_retention: v1 = every doc except the 3-multiples, v2
    * re-delivers the even docs revised. Built once per (session, sfDir). */
  private object TimeTravel {
    def path(s: SparkSession, dir: String): String =
      graft.Layouts.once(s, s"timetravel:$dir") {
        val p = s"/tmp/graft_timetravel/${graft.Layouts.tag(dir)}"
        val docs = Tables.documents(s, dir)
        docs.filter(col("doc_id") % 3 =!= 0).select(col("doc_id"), col("text"),
            lit(1L).as("__v"))
          .write.mode("overwrite").parquet(p)
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" [v2]")).as("text"),
            lit(2L).as("__v"))
          .write.mode("append").parquet(p)
        p
      }
    def store(s: SparkSession, dir: String): DataFrame =
      s.read.schema("doc_id LONG, text STRING, __v LONG")
        .parquet(path(s, dir))
    /** Latest-version-per-key view of any (doc_id, __v) frame. */
    def latest(df: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("__v").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  private object Export {
    /** Export once per (session, sfDir) via [[graft.Layouts]]; returns
      * (outDir, shard summaries). */
    def ensure(s: SparkSession, dir: String): (String, Seq[(Int, Long, Long, Long)]) =
      graft.Layouts.once(s, s"npy:$dir") {
        val out = s"/tmp/graft_npy/${graft.Layouts.tag(dir)}"
        val parts = NpySource.writeFloatMatrixSharded(
          Tables.embeddings(s, dir), "vec_id", "embedding", out, Shards)
        (out, parts)
      }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K4 as a row operator: SCD-1 batched upsert — every 10th doc gets a
    // revised text (update), every 17th spawns a new id (insert), the rest
    // pass through; delta wins per key in ONE keyed shuffle. The oracle
    // recomputes the merge relationally (delta ∪ base-without-delta-twin),
    // pinning per-row winners by content hash. Insert ids are NEGATIVE
    // (-(doc_id+1)) so the two delta halves stay key-disjoint at any corpus
    // size — an additive offset would collide with update keys once doc_ids
    // cross it, making the window tie-break nondeterministic.
    "merge_upsert_docs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val updates = docs.filter(col("doc_id") % 10 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
      val inserts = docs.filter(col("doc_id") % 17 === 0)
        .select((-(col("doc_id") + 1L)).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      val merged = graft.operators.Merge.upsert(
        docs, updates.unionByName(inserts), "doc_id", "doc_id")
      merged.select(col("doc_id"), md5(col("text")).as("content_hash"),
        col("__src").as("src"))
    }),
    // K4 versioned: SCD-2 history over two chained batches. Batch 1 revises
    // every 10th doc, RE-DELIVERS every (10th+5) doc byte-identical (the
    // at-least-once case — must be a no-op, no spurious version), and
    // inserts negative-id docs; batch 2 revises every 20th doc again,
    // closing its batch-1 version. The oracle rebuilds the full version
    // table relationally — a missed close, a phantom version from the
    // redelivery, or a wrong batch stamp turns a row red.
    "merge_scd2_history" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val h0 = graft.operators.Merge.scd2Init(docs)
      val delta1 = docs.filter(col("doc_id") % 10 === 0)
          .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .unionByName(docs.filter(col("doc_id") % 10 === 5))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((-(col("doc_id") + 1L)).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text"),
            col("lang"), col("source"), col("n_chars")))
      val h1 = graft.operators.Merge.scd2Apply(h0, delta1, "doc_id", 1L)
      val delta2 = docs.filter(col("doc_id") % 20 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev3]")))
      val h2 = graft.operators.Merge.scd2Apply(h1, delta2, "doc_id", 2L)
      h2.select(col("doc_id"), md5(col("text")).as("content_hash"),
        col("valid_from"), col("valid_to"))
    }),
    // The delete leg (GDPR-style key removal): every 13th doc's key is
    // "forgotten"; the oracle pins the surviving rows by content hash, so
    // an under- or over-delete turns red row-by-row.
    "merge_delete_docs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val forget = docs.filter(col("doc_id") % 13 === 0).select("doc_id")
      graft.operators.Merge.delete(docs, forget, "doc_id")
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
    }),
    // JSONL sink + source round trip — the interchange format every crawl
    // pipeline ingests and emits. Spark writes the documents table as
    // partitioned JSONL and reads it back under a DECLARED schema (never
    // inference — at 100 TB schema inference is a full extra pass); the
    // gate pins count, id sum, and a whole-text md5-hash sum against the
    // oracle's direct computation from parquet, so a mangled escape,
    // dropped row, or lossy field in either direction turns the row red.
    "io_jsonl_roundtrip" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"jsonl:$dir") {
        val p = s"/tmp/graft_jsonl/${graft.Layouts.tag(dir)}"
        Tables.documents(s, dir).select("doc_id", "lang", "source", "text")
          .write.mode("overwrite").json(p)
        p
      }
      val back = s.read
        .schema("doc_id LONG, lang STRING, source STRING, text STRING")
        .json(path)
      back.agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_sum"),
        sum(graft.functions.TextFunctions.tokenHash(col("text"))).as("text_hash_sum"),
        count_distinct(col("lang")).as("n_langs"))
    }),
    // Quoted-CSV roundtrip — the parser-seam pin the plain report sink
    // (K2) never exercises: text is made ADVERSARIAL for CSV (embedded
    // commas, double quotes, and a literal newline appended per row) so
    // the write must quote/escape and the read must reassemble multi-line
    // records (multiLine=true — without it a quoted newline splits the
    // record and the census reddens). The oracle recomputes the census
    // from the source table OVER THE SAME mutated text, so equality
    // proves escape → parse is lossless.
    "io_csv_quoted_roundtrip" -> ((s, dir) => {
      def mutate(df: DataFrame): DataFrame = df.select(col("doc_id"),
        col("lang"),
        concat(lit("a,\"b\" "), col("text"), lit(",\ntail")).as("text"))
      val path = graft.Layouts.once(s, s"csvq:$dir") {
        val p = s"/tmp/graft_csvq/${graft.Layouts.tag(dir)}"
        mutate(Tables.documents(s, dir))
          .write.mode("overwrite").option("header", "true").csv(p)
        p
      }
      val back = s.read.schema("doc_id LONG, lang STRING, text STRING")
        .option("header", "true").option("multiLine", "true").csv(path)
      back.agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_sum"),
        sum(graft.functions.TextFunctions.tokenHash(col("text")))
          .as("text_hash_sum"),
        sum(length(col("text"))).cast("long").as("n_chars"),
        count_distinct(col("lang")).as("n_langs"))
    }),
    // ORC columnar roundtrip (the other splittable columnar format Spark
    // ships a vectorized reader for): write once per sfDir, read back with
    // a DECLARED schema, pin the content census. The oracle reads the
    // SOURCE parquet — equality proves the ORC write+read is lossless.
    "io_orc_roundtrip" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"orc:$dir") {
        val p = s"/tmp/graft_orc/${graft.Layouts.tag(dir)}"
        Tables.documents(s, dir).select("doc_id", "lang", "source", "text")
          .write.mode("overwrite").orc(p)
        p
      }
      val back = s.read
        .schema("doc_id LONG, lang STRING, source STRING, text STRING")
        .orc(path)
      back.agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_sum"),
        sum(graft.functions.TextFunctions.tokenHash(col("text"))).as("text_hash_sum"),
        count_distinct(col("source")).as("n_sources"))
    }),
    // WET-style multi-record TEXT stream roundtrip — the raw-crawl entry
    // format: one header line + a (possibly multi-line) body per record,
    // records framed by a separator char. The corpus serializes once as a
    // text stream; spark.read.option("lineSep", RS).text does the record
    // assembly (Spark's splittable text source, so a 100 TB dump reads in
    // parallel), a regex pulls the header fields, and the census pins
    // LOSSLESS reconstruction against the oracle's read of the source
    // parquet. Production WET/WARC uses length-prefixed headers — the
    // record-separator framing exercises the same Spark-side plumbing
    // (custom lineSep, multi-line bodies, header parse) without a vendored
    // parser.
    // WebDataset-style tar shards — the de-facto interchange layout for
    // multimodal training corpora (key-stem member grouping inside POSIX
    // tars). The EXPORT is the scale path (per-partition ustar shards via
    // TarShards.write, temp+rename committed, nothing through the
    // driver); this query is its roundtrip CHECK: documents become
    // (key.txt, key.cls) members across 4 shards, the binaryFile read
    // pivots members back to samples map-side (contiguity contract — no
    // shuffle), and the census is pinned against the source table's
    // replay. A torn shard, checksum corruption, dropped member, or
    // key/suffix mix-up turns the row red.
    "io_tar_shards" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"tarshards:$dir") {
        val p = s"/tmp/graft_tarshards/${graft.Layouts.tag(dir)}"
        graft.io.TarShards.write(
          Tables.documents(s, dir).select(col("doc_id"),
            encode(col("text"), "UTF-8").as("txt"),
            encode(col("lang"), "UTF-8").as("cls")),
          "doc_id", Seq("txt" -> "txt", "cls" -> "cls"), p, Shards)
        p
      }
      graft.io.TarShards.readSamples(s, path, Seq("txt", "cls"))
        .select(col("key").as("doc_id"),
          decode(col("txt"), "UTF-8").as("text"),
          decode(col("cls"), "UTF-8").as("lang"))
        .agg(count(lit(1)).as("n_samples"),
          sum(col("doc_id")).as("id_sum"),
          sum(graft.functions.TextFunctions.tokenHash(col("text"))).as("text_hash_sum"),
          count_distinct(col("lang")).as("n_langs"))
    }),
    // The RAW-crawl entry path end to end (r13 missing #2 + #1 composed):
    // documents become WARC `response` records holding HTTP responses
    // wrapping adversarial HTML; the read splits records on the text
    // source's custom delimiter (byte-range splittable — the 100 TB crawl
    // dump shape), re-verifies every Content-Length (clen_ok), strips the
    // HTTP envelope, and runs the state-machine HTML extractor. The census
    // is pinned against the documents replay — a torn record, a
    // miscounted Content-Length, a leaked HTTP header, or an extraction
    // drift turns the row red.
    "io_warc_crawl" -> ((s, dir) => {
      val esc = CleanQueries.escapeHtml(col("text"))
      val html = concat(
        lit("<html><head><script>if (a<b) { x(); }</script></head><body><p>"),
        esc, lit("</p></body></html>"))
      val path = graft.Layouts.once(s, s"warc:$dir") {
        val p = s"/tmp/graft_warc/${graft.Layouts.tag(dir)}"
        graft.io.Warc.write(Tables.documents(s, dir), "doc_id",
          concat(lit("http://ex.org/doc/"), col("doc_id").cast("string")),
          html, p)
        p
      }
      val rec = graft.io.Warc.read(s, path)
      rec.select(col("record_id"), col("target_uri"), col("clen_ok"),
          graft.functions.CleanFunctions.htmlExtract(
            graft.io.Warc.httpBody(col("payload"))).as("__t"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("record_id")).as("id_sum"),
          sum(when(col("clen_ok"), 1L).otherwise(0L)).as("n_clen_ok"),
          sum(graft.functions.TextFunctions.tokenHash(col("__t"))).as("text_hash_sum"),
          count_distinct(col("target_uri")).as("n_uris"))
    }),
    // The BINARY compressed crawl path end to end (r14 verdict missing #1
    // + "next round" #2): records land as real `*.warc.gz` shards — each
    // WARC record its own gzip member, payloads opaque BYTES — and the
    // read composes gzip member → WARC framing (Content-Length verified)
    // → HTTP envelope strip (one body rides Content-Encoding: gzip, one
    // rides Transfer-Encoding: chunked, both decoded at the byte level)
    // → charset sniff → decode → HTML extraction. Five variants by
    // doc_id % 5: plain UTF-8, gzip body, chunked body, a shift_jis page
    // whose planted 0x93 0xFA tail is INVALID UTF-8 (the record extracts
    // correctly ONLY through the sniffer honoring the meta label — the
    // sniffer now sits in the raw path instead of on synthesized bytes),
    // and bare Latin-1 bytes that must fall to windows-1252. The census
    // replays from the documents table (the fixture is invertible): a
    // torn gzip member, a mis-framed chunk, a leaked HTTP header, or a
    // charset that fell to the wrong label all redden the single row.
    "io_warc_gz" -> ((s, dir) => {
      val cf = graft.functions.CleanFunctions
      val path = graft.Layouts.once(s, s"warcgz:$dir") {
        val p = s"/tmp/graft_warcgz/${graft.Layouts.tag(dir)}"
        val esc = CleanQueries.escapeHtml(col("text"))
        def utf8(c: org.apache.spark.sql.Column) = encode(c, "UTF-8")
        val v = pmod(col("doc_id"), lit(5))
        val plainHtml = concat(
          lit("<html><head><script>if (a<b) { x(); }</script></head><body><p>"),
          esc, lit("</p></body></html>"))
        // the shift_jis page: ASCII head + escaped ASCII text + a planted
        // tail only the declared charset decodes to 日 (U+65E5)
        val sjisBytes = concat(
          utf8(concat(lit("<html><head><meta charset=shift_jis></head><body><p>"),
            esc, lit(" "))),
          lit(Array[Byte](0x93.toByte, 0xFA.toByte)),
          utf8(lit("</p></body></html>")))
        // bare Latin-1: no BOM, no meta — 0xE9 must fall to windows-1252
        val latinBytes = encode(concat(lit("<html><body><p>"), esc,
          lit(" é</p></body></html>")), "ISO-8859-1")
        val plain = utf8(plainHtml)
        // two-chunk RFC 9112 framing of the plain body (sizes in hex)
        val c1 = substring(plain, 1, 7)
        val c2 = substring(plain, 8, 1 << 24)
        val chunked = concat(
          utf8(lower(hex(octet_length(c1)))), utf8(lit("\r\n")), c1,
          utf8(lit("\r\n")),
          utf8(lower(hex(octet_length(c2)))), utf8(lit("\r\n")), c2,
          utf8(lit("\r\n0\r\n\r\n")))
        val body =
          when(v === 1, cf.gzipBytes(plain))
          .when(v === 2, chunked)
          .when(v === 3, sjisBytes)
          .when(v === 4, latinBytes)
          .otherwise(plain)
        val hdrs = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"),
          when(v === 1, lit("Content-Encoding: gzip\r\n"))
            .when(v === 2, lit("Transfer-Encoding: chunked\r\n"))
            .otherwise(lit("")),
          lit("\r\n"))
        graft.io.WarcGz.write(
          Tables.documents(s, dir).select(col("doc_id"),
            concat(lit("http://ex.org/doc/"), col("doc_id").cast("string"))
              .as("uri"),
            concat(encode(hdrs, "UTF-8"), body).as("payload")),
          "doc_id", "uri", "payload", p, 4)
        p
      }
      val rec = graft.io.WarcGz.read(s, path)
      val bodyBytes = cf.httpBodyBytes(col("payload"))
      val cs = cf.sniffCharset(bodyBytes)
      rec.select(col("record_id"), col("target_uri"), col("clen_ok"),
          cs.as("charset"),
          cf.htmlExtract(cf.decodeCharset(bodyBytes, cs)).as("__t"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("record_id")).as("id_sum"),
          sum(when(col("clen_ok"), 1L).otherwise(0L)).as("n_clen_ok"),
          sum(when(col("charset") === "shift_jis", 1L).otherwise(0L))
            .as("n_sjis"),
          sum(when(col("charset") === "windows-1252", 1L).otherwise(0L))
            .as("n_cp1252"),
          sum(graft.functions.TextFunctions.tokenHash(col("__t")))
            .as("text_hash_sum"),
          count_distinct(col("target_uri")).as("n_uris"))
    }),
    // Charset sniff + decode — the BYTE-level entry stage ahead of HTML
    // extraction (fetched HTTP bodies are bytes in undeclared or
    // mis-declared encodings; every real pipeline runs the chardet role
    // before parsing). Twelve variants by doc_id % 12: BOM'd UTF-8 with a
    // planted non-ASCII char, BOM'd UTF-16LE, bare Latin-1 bytes whose
    // 0xE9 is INVALID UTF-8 (the validity-scan fallback must fire and
    // label the web default windows-1252), an HTML meta declaration
    // naming iso-8859-1 over plain ASCII (the trust-the-label path), a
    // meta declaration naming utf-16le over ASCII (WHATWG: an
    // ASCII-readable declaration REFUTES UTF-16 — must fall through to
    // the validity scan, r14 ADVICE), and seven meta-declared multibyte
    // pages (shift_jis, euc-jp, gbk, big5, euc-kr, koi8-r, windows-1251
    // — the top web families, r14 missing #2), each carrying a planted
    // byte sequence that is INVALID UTF-8 and decodes to a known
    // codepoint only under the declared charset — heuristically
    // undetectable, so honoring the label is the only green path. The
    // oracle replays the expected (label, decoded text) per variant — a
    // wrong cascade order, a missed BOM strip, a lax UTF-8 validator, or
    // a label that fell to the Latin fallback turns rows red.
    "io_charset_sniff" -> ((s, dir) => {
      val v = pmod(col("doc_id"), lit(12))
      val utf8bom = lit(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
      val utf16bom = lit(Array[Byte](0xFF.toByte, 0xFE.toByte))
      // ASCII meta prefix + ASCII doc text + the family's planted
      // multibyte tail (bytes that only the declared charset maps to the
      // expected codepoint — verified against a second decoder in
      // CharsetSniffSpec)
      def declared(label: String, tail: Array[Byte]) = concat(
        encode(concat(lit(s"<meta charset=$label>"), col("text")), "UTF-8"),
        lit(tail))
      val bytes =
        when(v === 0, concat(utf8bom,
          encode(concat(col("text"), lit("é")), "UTF-8")))
        .when(v === 1, concat(utf16bom, encode(col("text"), "UTF-16LE")))
        .when(v === 2, encode(concat(col("text"), lit("é")), "ISO-8859-1"))
        .when(v === 3, encode(concat(lit("<meta charset=\"iso-8859-1\">"),
          col("text")), "ISO-8859-1"))
        .when(v === 4, encode(concat(lit("<meta charset=utf-16le>"),
          col("text")), "UTF-8"))
        .when(v === 5, declared("shift_jis",
          Array[Byte](0x93.toByte, 0xFA.toByte))) // 日 U+65E5
        .when(v === 6, declared("euc-jp",
          Array[Byte](0xC6.toByte, 0xFC.toByte))) // 日 U+65E5
        .when(v === 7, declared("gbk",
          Array[Byte](0xD6.toByte, 0xD0.toByte))) // 中 U+4E2D
        .when(v === 8, declared("big5",
          Array[Byte](0xA4.toByte, 0xA4.toByte))) // 中 U+4E2D
        .when(v === 9, declared("euc-kr",
          Array[Byte](0xB0.toByte, 0xA1.toByte))) // 가 U+AC00
        .when(v === 10, declared("koi8-r",
          Array[Byte](0xF0.toByte))) // П U+041F
        .otherwise(declared("windows-1251",
          Array[Byte](0xC0.toByte))) // А U+0410
      val cf = graft.functions.CleanFunctions
      Tables.documents(s, dir)
        .select(col("doc_id"), bytes.as("__b"))
        .select(col("doc_id"), cf.sniffCharset(col("__b")).as("charset"),
          cf.decodeCharset(col("__b"), cf.sniffCharset(col("__b"))).as("__t"))
        .select(col("doc_id"), col("charset"),
          length(col("__t")).cast("long").as("n_chars"),
          md5(col("__t")).as("text_hash"))
    }),
    // Sitemap ingest — the crawler's OTHER discovery channel next to
    // outlink extraction (a real frontier seeds from sitemaps before any
    // page is fetched): one sitemap-protocol XML document per host
    // (<urlset><url><loc/><lastmod/><priority/></url>…), written as a
    // per-host export and parsed back with codegen'd regexp extraction —
    // no XML library, no UDF, one narrow projection per entry. The
    // census replays from the documents table (the synthesis is
    // invertible): a dropped entry, a mis-parsed loc, or a host's
    // sitemap lost in assembly turns the row red.
    "io_sitemap_parse" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"sitemap:$dir") {
        val p = s"/tmp/graft_sitemap/${graft.Layouts.tag(dir)}"
        val entry = concat(
          lit("<url><loc>http://ex.org/doc/"), col("doc_id").cast("string"),
          lit("</loc><lastmod>2026-01-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
          lit("</lastmod><priority>0."), (col("doc_id") % 10).cast("string"),
          lit("</priority></url>"))
        Tables.documents(s, dir)
          .select((col("doc_id") % 7).as("__h"), col("doc_id"), entry.as("__e"))
          .groupBy(col("__h"))
          .agg(array_sort(collect_list(struct(col("doc_id"), col("__e"))))
            .as("__es"))
          .select(concat(
            lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
            array_join(transform(col("__es"), x => x.getField("__e")), ""),
            lit("</urlset>")).as("value"))
          .write.mode("overwrite").text(p)
        p
      }
      val raw = s.read.text(path).filter(length(col("value")) > 0)
      val entries = raw.select(explode(regexp_extract_all(col("value"),
          lit("<url>(.*?)</url>"), lit(1))).as("__u"))
        .select(
          regexp_extract(col("__u"), "<loc>http://ex\\.org/doc/([0-9]+)</loc>", 1)
            .cast("long").as("doc_id"),
          regexp_extract(col("__u"), "<lastmod>([0-9-]+)</lastmod>", 1)
            .as("lastmod"),
          regexp_extract(col("__u"), "<priority>0\\.([0-9])</priority>", 1)
            .cast("long").as("pri_e1"))
      raw.agg(count(lit(1)).as("n_sitemaps"))
        .crossJoin(entries.agg(count(lit(1)).as("n_urls"),
          sum(col("doc_id")).as("id_sum"),
          count_distinct(col("lastmod")).as("n_lastmods"),
          sum(col("pri_e1")).as("pri_sum")))
    }),
    // CDX-J index ingest — the web archive's LOOKUP sidecar (every WARC
    // collection ships a CDX index mapping SURT key + timestamp to the
    // record's (filename, offset, length), and a crawler dedups
    // re-fetches against it): one line per capture, `surt ts {json}`,
    // parsed back with codegen'd regexp + JSON-path extraction. The read
    // RECOMPUTES each record's SURT key from the captured URL
    // (Crawl.surtKey — host labels reversed so per-host records are
    // contiguous, the range-scan property archives sort by) and pins it
    // against the line's own key column. The census replays from the
    // documents table (invertible synthesis): a mis-parsed JSON field, a
    // SURT drift, or a dropped capture turns the row red.
    "io_cdx_parse" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"cdx:$dir") {
        val p = s"/tmp/graft_cdx/${graft.Layouts.tag(dir)}"
        val line = concat(
          lit("org,ex)/doc/"), col("doc_id").cast("string"),
          lit(" 20260101"), lpad((col("doc_id") % 60).cast("string"), 2, "0"),
          lit(" {\"url\": \"http://ex.org/doc/"), col("doc_id").cast("string"),
          lit("\", \"status\": \"200\", \"length\": \""),
          (col("doc_id") % 1000 + 100).cast("string"),
          lit("\", \"offset\": \""), (col("doc_id") * 7).cast("string"),
          lit("\", \"filename\": \"part_"),
          (col("doc_id") % 4).cast("string"), lit(".warc.gz\"}"))
        Tables.documents(s, dir).select(line.as("value"))
          .write.mode("overwrite").text(p)
        p
      }
      val rows = s.read.text(path).filter(length(col("value")) > 0)
        .select(
          regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 1).as("surt"),
          regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 2).as("ts"),
          regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 3).as("__j"))
        .select(col("surt"), col("ts"),
          get_json_object(col("__j"), "$.url").as("url"),
          get_json_object(col("__j"), "$.length").cast("long").as("len"),
          get_json_object(col("__j"), "$.offset").cast("long").as("off"),
          get_json_object(col("__j"), "$.filename").as("file"))
      rows
        .withColumn("__id",
          regexp_extract(col("surt"), "/doc/([0-9]+)$", 1).cast("long"))
        .agg(count(lit(1)).as("n_captures"),
          sum(col("__id")).as("id_sum"),
          count_distinct(col("ts")).as("n_ts"),
          sum(col("len")).as("len_sum"),
          sum(col("off")).as("off_sum"),
          count_distinct(col("file")).as("n_files"),
          sum(when(graft.operators.Crawl.surtKey(col("url")) === col("surt"),
            1L).otherwise(0L)).as("n_surt_match"))
    }),
    "io_wet_roundtrip" -> ((s, dir) => {
      val RS = "\u001e" // ASCII record separator — never in natural text
      val hdr = "^WET-REC (\\d+) (\\S+) (\\S+)\n"
      val path = graft.Layouts.once(s, s"wet:$dir") {
        val p = s"/tmp/graft_wet/${graft.Layouts.tag(dir)}"
        Tables.documents(s, dir)
          .select(concat(lit("WET-REC "), col("doc_id").cast("string"),
            lit(" "), col("lang"), lit(" "), col("source"), lit("\n"),
            col("text")).as("value"))
          .write.mode("overwrite").option("lineSep", RS).text(p)
        p
      }
      val back = s.read.option("lineSep", RS).text(path)
        .filter(length(col("value")) > 0)
        .select(
          regexp_extract(col("value"), hdr, 1).cast("long").as("doc_id"),
          regexp_extract(col("value"), hdr, 2).as("lang"),
          regexp_extract(col("value"), hdr, 3).as("source"),
          regexp_replace(col("value"), "^WET-REC [^\n]*\n", "").as("text"))
      back.agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_sum"),
        sum(graft.functions.TextFunctions.tokenHash(col("text"))).as("text_hash_sum"),
        count_distinct(col("lang")).as("n_langs"))
    }),
    // Schema EVOLUTION across ingest batches — the lakehouse reality that
    // a 100 TB corpus accumulates files written under different schema
    // versions: batch 1 lands (doc_id, text), batch 2 adds lang/source,
    // and one mergeSchema read reconciles them (legacy rows surface the
    // added columns as NULL — pinned, not silently dropped). Declared
    // per-batch writes + one merged read; the census is checked against
    // the oracle's reconstruction from the source table, so a lost legacy
    // row, a misaligned column, or a non-null backfill turns the row red.
    "io_schema_evolution" -> ((s, dir) => {
      val path = graft.Layouts.once(s, s"schemaevo:$dir") {
        val p = s"/tmp/graft_schemaevo/${graft.Layouts.tag(dir)}"
        val docs = Tables.documents(s, dir)
        docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
          .write.mode("overwrite").parquet(s"$p/batch=1")
        docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "text", "lang", "source")
          .write.mode("overwrite").parquet(s"$p/batch=2")
        p
      }
      s.read.option("mergeSchema", "true").parquet(path)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("id_sum"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_legacy_rows"),
          count_distinct(col("lang")).as("n_langs"))
    }),
    // Hive-style partitioned layout + partition PRUNING: write the corpus
    // once partitioned by lang, read back with a lang predicate, and pin
    // the census of the pruned slice. At 100 TB this is THE data-skipping
    // primitive for categorical filters — the pruned read lists only the
    // lang=en directory (PlanSpec asserts the PartitionFilters reach the
    // scan), so the query's IO is proportional to the slice, not the
    // table.
    "io_partitioned_roundtrip" -> ((s, dir) => {
      IoQueries.partitionedByLang(s, dir)
        .filter(col("lang") === "en")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("id_sum"),
          sum(graft.functions.TextFunctions.tokenHash(col("text"))).as("text_hash_sum"),
          count_distinct(col("source")).as("n_sources"))
    }),
    // DYNAMIC partition pruning — the star-schema data-skipping pattern
    // (the date_dim.d_year = 2000 shape): the fact side is the
    // lang-partitioned corpus, the dim side is a STORED language
    // dimension carrying a script-family attribute, and the filter lives
    // on the DIM attribute (family = 'latin'), so no static optimizer can
    // fold it into the fact scan. Catalyst must instead inject the
    // broadcast dim result as a DynamicPruningExpression into the fact
    // scan's PartitionFilters (PlanSpec asserts it): at 100 TB the fact
    // IO is proportional to the qualifying partitions, discovered from
    // the dimension at EXECUTION time.
    "join_dpp_pruned" -> ((s, dir) => {
      val fact = IoQueries.partitionedByLang(s, dir)
      val dim = s.read.schema("d_lang STRING, family STRING, n_docs LONG")
        .parquet(IoQueries.langDim(s, dir))
        .filter(col("family") === "latin")
        .select(col("d_lang"))
      fact.join(broadcast(dim), col("lang") === col("d_lang"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),
    // Versioned store + time-travel read (the MVCC snapshot-read pattern
    // behind every lakehouse table format): writes append rows stamped
    // with a version number, and an AS-OF-v reader resolves each key to
    // its latest row with version ≤ v — ONE per-key argmax window over
    // the version-filtered scan, so snapshot reads cost the key
    // partitioning, never a log replay. Two commits here (v1 = base
    // slice, v2 = upserts that update evens present in v1 AND insert
    // evens that weren't); the query pins BOTH snapshots' censuses from
    // one layout, so latest-wins resolution, non-destructive history, and
    // insert-vs-update semantics are all hash-gated against the oracle's
    // reconstruction from the source table.
    "io_time_travel" -> ((s, dir) => {
      val store = TimeTravel.store(s, dir)
      def asOf(v: Long): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("__v").desc)
        store.filter(col("__v") <= v)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"),
            sum(when(col("text").endsWith(" [v2]"), 1L).otherwise(0L))
              .as("n_updated"),
            sum(graft.functions.TextFunctions.tokenHash(col("text")))
              .as("text_hash_sum"))
          .withColumn("version", lit(v))
      }
      asOf(1L).unionByName(asOf(2L))
        .select("version", "n_docs", "id_sum", "n_updated", "text_hash_sum")
    }),
    // VACUUM with retention: rewrite the versioned store keeping only the
    // latest version per key (retention horizon = current), into a NEW
    // layout — the compaction that bounds a merge-on-read store's read
    // amplification. The card pins rows before/after/removed AND the
    // latest-view invariants recomputed FROM THE VACUUMED FILES, which
    // the oracle rebuilds from the source table: a vacuum that drops a
    // live row or keeps resurrecting a superseded one turns the row red.
    "io_vacuum_retention" -> ((s, dir) => {
      val vp = graft.Layouts.once(s, s"vacuum:$dir") {
        val p = s"/tmp/graft_vacuum/${graft.Layouts.tag(dir)}"
        TimeTravel.latest(TimeTravel.store(s, dir))
          .write.mode("overwrite").parquet(p)
        p
      }
      val before = TimeTravel.store(s, dir).agg(count(lit(1)).as("n_rows_before"))
      val after = s.read.schema("doc_id LONG, text STRING, __v LONG").parquet(vp)
      before.crossJoin(broadcast(after.agg(
          count(lit(1)).as("n_rows_after"),
          sum(col("doc_id")).as("id_sum"),
          sum(when(col("text").endsWith(" [v2]"), 1L).otherwise(0L))
            .as("n_updated"),
          sum(graft.functions.TextFunctions.tokenHash(col("text")))
            .as("text_hash_sum"))))
        .select(col("n_rows_before"),
          col("n_rows_after"),
          (col("n_rows_before") - col("n_rows_after")).as("n_rows_removed"),
          col("id_sum"), col("n_updated"), col("text_hash_sum"))
    }),
    "io_npy_shard_roundtrip" -> ((s, dir) => {
      val (out, parts) = Export.ensure(s, dir)
      import s.implicits._
      val shardLo = parts.map { case (sh, _, lo, _) => (f"shard_$sh%05d.npy", lo) }
        .toDF("fname", "lo")
      val back = NpySource.readFloatMatrix(s, s"$out/*.npy")
        .withColumn("fname", regexp_extract(col("file"), "([^/]+)$", 1))
        .join(broadcast(shardLo), "fname")
        .select((col("lo") + col("vec_id")).as("vec_id"),
          col("fname"), col("embedding").as("back"))
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
        .join(back, "vec_id")
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("fname")).as("n_shards"),
          sum(when(col("back") === col("embedding"), 0L).otherwise(1L))
            .as("n_mismatch"))
    }))

  val oracles: Map[String, String] = Map(
    // The full version table rebuilt relationally: snapshot versions close
    // at batch 1 iff revised then; [rev2] versions close at batch 2 iff
    // revised again; redelivered-identical docs keep ONE open snapshot
    // version; inserts open at batch 1.
    "merge_scd2_history" ->
      """WITH upd AS (SELECT doc_id, text || ' [rev2]' AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |upd2 AS (SELECT doc_id, text || ' [rev3]' AS text
        |  FROM documents WHERE doc_id % 20 = 0),
        |ins AS (SELECT -(doc_id + 1) AS doc_id,
        |    'new doc ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents WHERE doc_id % 17 = 0)
        |SELECT doc_id, md5(text) AS content_hash,
        |  CAST(0 AS BIGINT) AS valid_from,
        |  CASE WHEN doc_id % 10 = 0 THEN CAST(1 AS BIGINT)
        |       ELSE CAST(NULL AS BIGINT) END AS valid_to
        |FROM documents
        |UNION ALL
        |SELECT doc_id, md5(text), CAST(1 AS BIGINT),
        |  CASE WHEN doc_id % 20 = 0 THEN CAST(2 AS BIGINT)
        |       ELSE CAST(NULL AS BIGINT) END
        |FROM upd
        |UNION ALL
        |SELECT doc_id, md5(text), CAST(2 AS BIGINT), CAST(NULL AS BIGINT)
        |FROM upd2
        |UNION ALL
        |SELECT doc_id, md5(text), CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
        |FROM ins""".stripMargin,
    "merge_delete_docs" ->
      """SELECT doc_id, md5(text) AS content_hash FROM documents
        |WHERE doc_id % 13 <> 0""".stripMargin,
    "merge_upsert_docs" ->
      """WITH delta AS (
        |  SELECT doc_id, text || ' [rev2]' AS text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT -(doc_id + 1), 'new doc ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 17 = 0)
        |SELECT doc_id, md5(text) AS content_hash, 'delta' AS src FROM delta
        |UNION ALL
        |SELECT d.doc_id, md5(d.text), 'base' FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM delta WHERE delta.doc_id = d.doc_id)""".stripMargin,
    "io_npy_shard_roundtrip" ->
      s"""SELECT count(*) AS n_rows, CAST($Shards AS BIGINT) AS n_shards,
         |  CAST(0 AS BIGINT) AS n_mismatch
         |FROM embeddings""".stripMargin,
    // Direct recomputation from parquet: equality pins the JSONL write+read
    // as content-preserving (md5 over the full text catches any escaping
    // or truncation defect).
    "io_csv_quoted_roundtrip" -> {
      val mut = """'a,"b" ' || text || ',' || chr(10) || 'tail'"""
      s"""WITH m AS (SELECT doc_id, lang, $mut AS text FROM documents)
         |SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  CAST(sum(len(text)) AS BIGINT) AS n_chars,
         |  count(DISTINCT lang) AS n_langs
         |FROM m""".stripMargin
    },
    "io_jsonl_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT lang) AS n_langs
         |FROM documents""".stripMargin,
    "io_orc_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT source) AS n_sources
         |FROM documents""".stripMargin,
    // Legacy (even doc_id) rows were written without lang/source, so they
    // must read back NULL there; the odd rows carry the full schema.
    "io_schema_evolution" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy_rows,
         |  count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END) AS n_langs
         |FROM documents""".stripMargin,
    // Same lossless-reconstruction pin as the jsonl roundtrip: equality
    // against the source parquet proves the WET serialize + record
    // assembly + header parse lost nothing.
    "io_tar_shards" ->
      s"""SELECT count(*) AS n_samples,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT lang) AS n_langs
         |FROM documents""".stripMargin,
    // The fixture is invertible: every record survives with its declared
    // Content-Length, and extraction recovers exactly the (whitespace-
    // collapsed) source text — the oracle replays the expected answer.
    // Every number replayed from the source table: the expected extracted
    // text is the whitespace-collapsed doc text plus the planted
    // charset-marker character (日 = chr(26085) on the shift_jis page,
    // é = chr(233) on the Latin-1 page); transfer/content decoding and
    // the gzip container must be lossless, so variants 0-2 extract
    // identically.
    "io_warc_gz" -> {
      s"""WITH exp AS (SELECT doc_id,
         |    trim(regexp_replace(text, '\\s+', ' ', 'g')) ||
         |      CASE CAST(doc_id % 5 AS INT)
         |        WHEN 3 THEN ' ' || chr(26085)
         |        WHEN 4 THEN ' ' || chr(233) ELSE '' END AS t,
         |    CASE CAST(doc_id % 5 AS INT)
         |      WHEN 3 THEN 'shift_jis' WHEN 4 THEN 'windows-1252'
         |      ELSE 'utf-8' END AS cs
         |  FROM documents)
         |SELECT count(*) AS n_records,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  count(*) AS n_clen_ok,
         |  CAST(sum(CASE WHEN cs = 'shift_jis' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sjis,
         |  CAST(sum(CASE WHEN cs = 'windows-1252' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cp1252,
         |  CAST(sum(${DocSql.tokenHashSql("t")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT doc_id) AS n_uris
         |FROM exp""".stripMargin
    },
    // Expected (label, decoded text) per variant, replayed directly: the
    // fixture is invertible — the planted é is chr(233) and each declared
    // multibyte family's planted tail decodes to one known codepoint
    // (日 26085, 中 20013, 가 44032, П 1055, А 1040).
    "io_charset_sniff" ->
      """WITH exp AS (SELECT doc_id,
        |    CASE CAST(doc_id % 12 AS INT)
        |      WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
        |      WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'iso-8859-1'
        |      WHEN 4 THEN 'utf-8' WHEN 5 THEN 'shift_jis'
        |      WHEN 6 THEN 'euc-jp' WHEN 7 THEN 'gbk'
        |      WHEN 8 THEN 'big5' WHEN 9 THEN 'euc-kr'
        |      WHEN 10 THEN 'koi8-r' ELSE 'windows-1251' END AS charset,
        |    CASE CAST(doc_id % 12 AS INT)
        |      WHEN 0 THEN text || chr(233)
        |      WHEN 1 THEN text
        |      WHEN 2 THEN text || chr(233)
        |      WHEN 3 THEN '<meta charset="iso-8859-1">' || text
        |      WHEN 4 THEN '<meta charset=utf-16le>' || text
        |      WHEN 5 THEN '<meta charset=shift_jis>' || text || chr(26085)
        |      WHEN 6 THEN '<meta charset=euc-jp>' || text || chr(26085)
        |      WHEN 7 THEN '<meta charset=gbk>' || text || chr(20013)
        |      WHEN 8 THEN '<meta charset=big5>' || text || chr(20013)
        |      WHEN 9 THEN '<meta charset=euc-kr>' || text || chr(44032)
        |      WHEN 10 THEN '<meta charset=koi8-r>' || text || chr(1055)
        |      ELSE '<meta charset=windows-1251>' || text || chr(1040)
        |      END AS t
        |  FROM documents)
        |SELECT doc_id, charset, CAST(length(t) AS BIGINT) AS n_chars,
        |  md5(t) AS text_hash
        |FROM exp""".stripMargin,
    "io_warc_crawl" ->
      s"""WITH exp AS (SELECT doc_id,
         |    trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
         |  FROM documents)
         |SELECT count(*) AS n_records,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  count(*) AS n_clen_ok,
         |  CAST(sum(${DocSql.tokenHashSql("t")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT doc_id) AS n_uris
         |FROM exp""".stripMargin,
    // Every census number is a pure function of doc_id; n_surt_match =
    // count(*) pins that the recomputed SURT keys agree with the index's
    // own, line for line.
    "io_cdx_parse" ->
      """SELECT count(*) AS n_captures,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  count(DISTINCT doc_id % 60) AS n_ts,
        |  CAST(sum(doc_id % 1000 + 100) AS BIGINT) AS len_sum,
        |  CAST(sum(doc_id * 7) AS BIGINT) AS off_sum,
        |  count(DISTINCT doc_id % 4) AS n_files,
        |  count(*) AS n_surt_match
        |FROM documents""".stripMargin,
    // Every census number is a pure function of doc_id — the synthesis is
    // invertible, so parsing must recover exactly the per-host entries.
    "io_sitemap_parse" ->
      """SELECT count(DISTINCT doc_id % 7) AS n_sitemaps,
        |  count(*) AS n_urls,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  count(DISTINCT doc_id % 28) AS n_lastmods,
        |  CAST(sum(doc_id % 10) AS BIGINT) AS pri_sum
        |FROM documents""".stripMargin,
    "io_wet_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT lang) AS n_langs
         |FROM documents""".stripMargin,
    "io_partitioned_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(${DocSql.tokenHashSql("text")}) AS BIGINT) AS text_hash_sum,
         |  count(DISTINCT source) AS n_sources
         |FROM documents WHERE lang = 'en'""".stripMargin,
    // Both snapshots reconstructed from the source table by the same
    // commit rules: AS OF 1 = the base slice; AS OF 2 = every even id at
    // its v2 text (update or insert) plus the odd base rows.
    "io_time_travel" -> {
      val th = (t: String) => DocSql.tokenHashSql(t)
      s"""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |v2 AS (SELECT doc_id, text || ' [v2]' AS text FROM documents
         |  WHERE doc_id % 2 = 0),
         |a1 AS (SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_docs,
         |    CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |    CAST(0 AS BIGINT) AS n_updated,
         |    CAST(sum(${th("text")}) AS BIGINT) AS text_hash_sum
         |  FROM v1),
         |s2 AS (SELECT * FROM v2
         |  UNION ALL SELECT * FROM v1 WHERE doc_id % 2 <> 0),
         |a2 AS (SELECT CAST(2 AS BIGINT) AS version, count(*) AS n_docs,
         |    CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |    CAST(sum(CASE WHEN text LIKE '% [v2]' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_updated,
         |    CAST(sum(${th("text")}) AS BIGINT) AS text_hash_sum
         |  FROM s2)
         |SELECT * FROM a1 UNION ALL SELECT * FROM a2""".stripMargin
    },
    "io_vacuum_retention" -> {
      val th = (t: String) => DocSql.tokenHashSql(t)
      s"""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |v2 AS (SELECT doc_id, text || ' [v2]' AS text FROM documents
         |  WHERE doc_id % 2 = 0),
         |latest AS (SELECT * FROM v2
         |  UNION ALL SELECT * FROM v1 WHERE doc_id % 2 <> 0)
         |SELECT (SELECT count(*) FROM v1) + (SELECT count(*) FROM v2) AS n_rows_before,
         |  (SELECT count(*) FROM latest) AS n_rows_after,
         |  (SELECT count(*) FROM v1) + (SELECT count(*) FROM v2)
         |    - (SELECT count(*) FROM latest) AS n_rows_removed,
         |  CAST((SELECT sum(doc_id) FROM latest) AS BIGINT) AS id_sum,
         |  (SELECT count(*) FROM latest WHERE text LIKE '% [v2]') AS n_updated,
         |  CAST((SELECT sum(${th("text")}) FROM latest) AS BIGINT) AS text_hash_sum""".stripMargin
    },
    // The layout's content ≡ the source table (pinned by
    // io_partitioned_roundtrip), so the oracle replays the runtime-pruned
    // join on the table directly.
    "join_dpp_pruned" ->
      """WITH dim AS (SELECT lang,
        |    CASE WHEN lang = 'zh' THEN 'cjk' ELSE 'latin' END AS family
        |  FROM documents GROUP BY 1)
        |SELECT d.lang, count(*) AS n_docs, CAST(sum(d.doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN dim USING (lang)
        |WHERE dim.family = 'latin'
        |GROUP BY 1""".stripMargin)

  /** The lang-partitioned corpus layout, written once per (session, scale)
    * — the Hive-style directory layout both pruning queries read
    * (`io_partitioned_roundtrip` statically, `join_dpp_pruned`
    * dynamically). Declared read schema puts the partition column last. */
  private[queries] def partitionedByLang(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Layouts.once(s, s"partlang:$dir") {
      val p = s"/tmp/graft_partlang/${graft.Layouts.tag(dir)}"
      Tables.documents(s, dir).select("doc_id", "lang", "source", "text")
        .write.mode("overwrite").partitionBy("lang").parquet(p)
      p
    }
    s.read
      .schema("doc_id LONG, source STRING, text STRING, lang STRING")
      .parquet(path)
  }

  /** The stored language dimension for the DPP star join: one row per
    * language with its script family and doc count, derived once from the
    * corpus and written as a parquet dim table (a dim must be a real
    * stored relation — an in-memory aggregate's filter fails Spark's
    * likely-selective test and DPP stays off). */
  private[queries] def langDim(s: SparkSession, dir: String): String =
    graft.Layouts.once(s, s"langdim:$dir") {
      val p = s"/tmp/graft_langdim/${graft.Layouts.tag(dir)}"
      Tables.documents(s, dir)
        .groupBy(col("lang").as("d_lang"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("d_lang"),
          when(col("d_lang") === "zh", "cjk").otherwise("latin").as("family"),
          col("n_docs"))
        .write.mode("overwrite").parquet(p)
      p
    }
}
