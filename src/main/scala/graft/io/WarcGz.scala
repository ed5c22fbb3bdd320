package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Compressed BINARY WARC ingest/export — the format real crawl dumps
  * actually ship (`*.warc.gz`: each WARC record individually gzipped and
  * the members concatenated, so a reader can seek to any member boundary
  * and HTTP payloads stay opaque bytes). The plain-text [[Warc]] path
  * (r14) rides Spark's UTF-8 text source, which DECODES payloads before
  * the byte-level [[graft.functions.expr.CharsetSniff]] stage could ever
  * run — this reader yields `payload: binary`, so the raw path composes
  * the way a 100 TB crawl needs: gzip member → WARC record → HTTP
  * envelope strip ([[graft.functions.expr.HttpBodyBytes]], chunked +
  * Content-Encoding aware) → charset sniff/decode → HTML extract (r14
  * verdict "what's missing" #1).
  *
  * Spark shape: the WRITE range-partitions records and each task streams
  * ONE `part_NNNNN.warc.gz` through the Hadoop FileSystem API with a
  * temp + rename commit (the [[TarShards.write]] discipline — nothing
  * through the driver, retries can't publish torn shards). The READ runs
  * one task per file (the file-granularity parallelism crawl dumps are
  * built around — Common Crawl ships ~1 GB files by the tens of
  * thousands) and streams gzip members one at a time off an
  * `FSDataInputStream`: task heap is bounded by the largest RECORD,
  * never the file. Per-member gzip means the 2 GB `binaryFile` ceiling
  * and whole-file gunzip buffering both stay gone. The gzip codec is
  * clean-room pure-JDK `Deflater`/`Inflater` (RFC 1952 framing written
  * and verified by hand — CRC32 AND ISIZE checked loudly per member, a
  * torn or corrupt member raises, it is never silently dropped).
  */
object WarcGz {

  private val CRLF = "\r\n"
  private val GzMagic0 = 0x1f
  private val GzMagic1 = 0x8b

  // ------------------------------------------------------------------
  // gzip member codec (RFC 1952)
  // ------------------------------------------------------------------

  /** Compress `bytes` as ONE gzip member. Deterministic: fixed 10-byte
    * header (MTIME 0, XFL 0, OS 255 "unknown"), default deflate level —
    * same input, same bytes, so task-retry twins write identical files. */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    out.write(Array[Byte](GzMagic0.toByte, GzMagic1.toByte, 8, 0,
      0, 0, 0, 0, 0, 0xff.toByte))
    val def_ = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    def_.setInput(bytes)
    def_.finish()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      out.write(buf, 0, n)
    }
    def_.end()
    val crc = new java.util.zip.CRC32()
    crc.update(bytes)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(bytes.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  /** Decode concatenated gzip members off `in` lazily, ONE member
    * resident at a time (the [[TarShards.memberIterator]] discipline
    * applied to RFC 1952): header parsed by hand (FEXTRA/FNAME/FCOMMENT/
    * FHCRC skipped per spec), body inflated raw, CRC32 and ISIZE from the
    * 8-byte trailer verified — corruption raises naming `src`, it never
    * silently drops or truncates a member. The stream is closed at EOF;
    * callers that may abandon the iterator early must close `in`
    * themselves. */
  def memberIterator(in: java.io.InputStream,
      src: String): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      // buffered reads with explicit carry-over: the Inflater consumes
      // input in blocks, and whatever it did NOT consume belongs to the
      // trailer + the next member
      private val inBuf = new Array[Byte](65536)
      private var inLen = 0 // valid bytes in inBuf
      private var inPos = 0 // consumed bytes in inBuf
      private var pending: Array[Byte] = null
      private var done = false
      private var off = 0L // member ordinal, for diagnostics

      private def refill(): Boolean = {
        if (inPos < inLen) return true
        val n = in.read(inBuf)
        if (n <= 0) false
        else { inLen = n; inPos = 0; true }
      }

      private def readByte(what: String): Int = {
        require(refill(), s"truncated gzip member #$off in $src: EOF in $what")
        val b = inBuf(inPos) & 0xff
        inPos += 1
        b
      }

      private def finish(): Unit = { done = true; in.close() }

      private def advance(): Unit = while (pending == null && !done) {
        if (!refill()) { finish() }
        else {
          // --- header ---
          val m0 = readByte("magic")
          val m1 = readByte("magic")
          require(m0 == GzMagic0 && m1 == GzMagic1,
            f"not a gzip member at #$off in $src: magic $m0%02x $m1%02x")
          val cm = readByte("method")
          require(cm == 8, s"unsupported gzip method $cm at #$off in $src")
          val flg = readByte("flags")
          var i = 0
          while (i < 6) { readByte("header"); i += 1 } // MTIME, XFL, OS
          if ((flg & 0x04) != 0) { // FEXTRA
            val xlen = readByte("xlen") | (readByte("xlen") << 8)
            var j = 0
            while (j < xlen) { readByte("extra"); j += 1 }
          }
          if ((flg & 0x08) != 0) while (readByte("name") != 0) () // FNAME
          if ((flg & 0x10) != 0) while (readByte("comment") != 0) () // FCOMMENT
          if ((flg & 0x02) != 0) { readByte("hcrc"); readByte("hcrc") } // FHCRC
          // --- deflate body ---
          val inf = new java.util.zip.Inflater(true)
          val outBuf = new java.io.ByteArrayOutputStream(8192)
          val tmp = new Array[Byte](65536)
          try {
            while (!inf.finished()) {
              if (inf.needsInput()) {
                require(refill(),
                  s"truncated gzip member #$off in $src: EOF mid-deflate")
                inf.setInput(inBuf, inPos, inLen - inPos)
                inPos = inLen // consumed below via getRemaining
              }
              val n = try inf.inflate(tmp) catch {
                case e: java.util.zip.DataFormatException =>
                  throw new IllegalArgumentException(
                    s"corrupt deflate stream in gzip member #$off in $src: " +
                      e.getMessage)
              }
              outBuf.write(tmp, 0, n)
            }
            // hand back what the inflater did not consume (trailer + next)
            inPos -= inf.getRemaining
          } finally inf.end()
          val payload = outBuf.toByteArray
          // --- trailer: CRC32 + ISIZE, both verified ---
          def le32(what: String): Long = {
            var v = 0L
            var k = 0
            while (k < 4) { v |= readByte(what).toLong << (8 * k); k += 1 }
            v
          }
          val wantCrc = le32("crc32")
          val wantLen = le32("isize")
          val crc = new java.util.zip.CRC32()
          crc.update(payload)
          require(crc.getValue == wantCrc,
            s"gzip CRC mismatch in member #$off in $src")
          require((payload.length.toLong & 0xffffffffL) == wantLen,
            s"gzip ISIZE mismatch in member #$off in $src: " +
              s"${payload.length} != $wantLen")
          off += 1
          pending = payload
        }
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): Array[Byte] = {
        advance()
        if (pending == null) throw new NoSuchElementException("gzip exhausted")
        val m = pending; pending = null; m
      }
    }

  // ------------------------------------------------------------------
  // WARC record framing inside a member
  // ------------------------------------------------------------------

  /** One member's record bytes: version line + WARC headers + blank line
    * + payload + terminating CRLF CRLF (ISO 28500 §4). Content-Length
    * counts payload BYTES — the read side's integrity gate. */
  private[graft] def recordBytes(recordId: Long, targetUri: String,
      payload: Array[Byte]): Array[Byte] = {
    val hdr = (s"${Warc.Version}$CRLF" +
      s"WARC-Type: response$CRLF" +
      s"WARC-Record-ID: <urn:graft:$recordId>$CRLF" +
      s"WARC-Target-URI: $targetUri$CRLF" +
      s"Content-Length: ${payload.length}$CRLF$CRLF").getBytes("ISO-8859-1")
    val out = new Array[Byte](hdr.length + payload.length + 4)
    System.arraycopy(hdr, 0, out, 0, hdr.length)
    System.arraycopy(payload, 0, out, hdr.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Index of the first CRLF CRLF in `b`, or -1. */
  private def blankLine(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private val IdRe = java.util.regex.Pattern.compile(
    "WARC-Record-ID: <urn:graft:([0-9]+)>")
  private val UriRe = java.util.regex.Pattern.compile(
    "WARC-Target-URI: ([^\r\n]+)")
  private val ClenRe = java.util.regex.Pattern.compile(
    "Content-Length: ([0-9]+)")

  /** Parse one member's record: (record_id, target_uri, content_length,
    * clen_ok, payload). The member boundary makes framing exact — the
    * payload is the bytes between the header blank line and the record's
    * terminating CRLF CRLF, and the declared Content-Length ARBITRATES
    * when the terminator is absent (a torn record surfaces clen_ok =
    * false with the raw tail, never a silent truncation). */
  private[graft] def parseRecord(member: Array[Byte],
      src: String): Row = {
    val split = blankLine(member)
    require(split >= 0, s"WARC member without a header blank line in $src")
    val hdr = new String(member, 0, split, "ISO-8859-1")
    require(hdr.startsWith(Warc.Version),
      s"WARC member not starting with ${Warc.Version} in $src")
    def group(p: java.util.regex.Pattern): Option[String] = {
      val m = p.matcher(hdr)
      if (m.find()) Some(m.group(1)) else None
    }
    val id = group(IdRe).map(_.toLong).getOrElse(-1L)
    val uri = group(UriRe).orNull
    val clen = group(ClenRe).map(_.toLong).getOrElse(-1L)
    val rest = member.length - (split + 4)
    // exact framing: payload + CRLF CRLF. Fall back to the raw tail when
    // the declared length does not fit — clen_ok carries the verdict.
    val bodyLen =
      if (clen >= 0 && clen + 4 == rest) clen.toInt
      else rest
    val payload = java.util.Arrays.copyOfRange(member, split + 4,
      split + 4 + bodyLen)
    Row(id, uri, clen, clen == payload.length.toLong, payload)
  }

  // ------------------------------------------------------------------
  // distributed write / read
  // ------------------------------------------------------------------

  /** Export rows as a `*.warc.gz` shard directory: one gzip member per
    * record, records range-partitioned on `idCol` into `shards` files,
    * each task streaming ONE `part_NNNNN.warc.gz` with a temp + rename
    * commit. `payloadCol` is the record's opaque payload BYTES (an HTTP
    * message, typically) — nothing decodes it on this side. */
  def write(df: DataFrame, idCol: String, uriCol: String,
      payloadCol: String, dir: String, shards: Int): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    // Clear any PREVIOUS export at this location before the job: the read
    // side globs `*.warc.gz`, so a stale part file from an earlier, larger
    // export would silently pollute the new corpus (the TarShards stale-
    // dest lesson, applied at directory granularity — mid-job retry twins
    // are handled per-file below).
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dirFs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (dirFs.exists(dirPath)) dirFs.delete(dirPath, true)
    df.select(col(idCol).cast("long").as("__id"),
        col(uriCol).cast("string").as("__uri"),
        col(payloadCol).cast("binary").as("__p"))
      .repartitionByRange(shards, col("__id"))
      .sortWithinPartitions("__id")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val shard = tc.partitionId()
          val dest = new org.apache.hadoop.fs.Path(dir,
            f"part_$shard%05d.warc.gz")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part_$shard%05d.warc.gz.attempt${tc.taskAttemptId()}%d.tmp")
          val fs = dest.getFileSystem(confBc.value.value)
          val out = fs.create(tmp, true)
          var n = 0L
          try {
            it.foreach { r =>
              out.write(gzipMember(recordBytes(r.getLong(0), r.getString(1),
                r.getAs[Array[Byte]](2))))
              n += 1L
            }
          } finally out.close()
          // deterministic members + deterministic partitioning ⇒ a retry
          // that lost the rename race wrote a byte-identical twin — but
          // VERIFY that by streaming byte comparison instead of assuming
          // it (the TarShards rename-failure rule): anything else at dest
          // is replaced or fails loudly, never silently kept
          if (fs.exists(dest)) {
            val twin = fs.getFileStatus(dest).getLen ==
              fs.getFileStatus(tmp).getLen && TarShards.sameBytes(fs, tmp, dest)
            if (twin) fs.delete(tmp, false)
            else {
              fs.delete(dest, false)
              if (!fs.rename(tmp, dest))
                sys.error(s"WarcGz.write: rename $tmp -> $dest failed")
            }
          } else if (!fs.rename(tmp, dest))
            sys.error(s"WarcGz.write: rename $tmp -> $dest failed")
          Iterator.single(n)
        }
      }.collect()
    ()
  }

  /** Read a `*.warc.gz` directory back: (record_id, target_uri,
    * content_length, clen_ok, payload BINARY) — one task per file, each
    * streaming its members one record at a time. The payload is bytes:
    * compose [[graft.functions.expr.HttpBodyBytes]] →
    * [[graft.functions.expr.SniffCharset]] →
    * [[graft.functions.expr.DecodeCharset]] downstream. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("record_id", LongType, nullable = false),
      StructField("target_uri", StringType, nullable = true),
      StructField("content_length", LongType, nullable = false),
      StructField("clen_ok", BooleanType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val pat = new org.apache.hadoop.fs.Path(dir, "*.warc.gz")
    val fs = pat.getFileSystem(spark.sessionState.newHadoopConf())
    val files = Option(fs.globStatus(pat)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"WarcGz.read: no *.warc.gz under $dir")
    val paths = spark.createDataset(
      spark.sparkContext.parallelize(files, files.length))(
      org.apache.spark.sql.Encoders.STRING)
    paths.mapPartitions { it =>
      it.flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val in = p.getFileSystem(confBc.value.value).open(p)
        // memberIterator closes `in` at EOF; the listener is the backstop
        // for a task that dies mid-file
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => } })
        memberIterator(in, path).map(parseRecord(_, path))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
