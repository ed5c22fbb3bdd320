package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard export/import — the de-facto interchange
  * layout for large multimodal training corpora (a directory of POSIX tar
  * files, each holding many samples; a sample's members share a key stem
  * and differ by suffix: `000000000042.txt`, `000000000042.cls`, ...).
  * Training loaders stream shards sequentially, so the layout's contract
  * is (a) one shard = one independently readable file, (b) a sample's
  * members are CONTIGUOUS within one shard, (c) shard-level ordering is
  * deterministic. Reference for the format: the POSIX ustar header layout
  * (IEEE 1003.1) and the WebDataset convention of key-stem grouping.
  *
  * Spark shape ([[graft.io.NpySource.writeFloatMatrixSharded]]'s
  * contract, applied to tars): the WRITE range-partitions samples by key
  * and each task streams ONE shard through the Hadoop FileSystem API with
  * a write-to-temp + rename commit — the corpus never passes through the
  * driver, task retries can't publish torn shards, and a driver-written
  * `manifest.json` carries the global shape. The READ streams each shard
  * member-by-member off an `FSDataInputStream` (one task per shard — the
  * same file-granularity parallelism the training loaders use): task
  * memory is bounded by the LARGEST MEMBER, never the shard, so shard
  * size stays a tuning knob on the read side exactly as on the write
  * side (and the former `binaryFile` 2 GB-per-file ceiling is gone). A
  * sample's members are grouped map-side: adjacency within the shard
  * makes the per-sample pivot a single pass with NO shuffle. Pure-JDK
  * ustar encode/decode, checksums verified loudly on read — a
  * silently-skipped corrupt member would surface as a missing training
  * sample.
  */
object TarShards {

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 zero-padded octal digits + a NUL terminator (the POSIX form;
    // the byte is appended explicitly so the source stays NUL-free)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows a $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s).getBytes("US-ASCII") :+ 0.toByte
  }

  /** One 512-byte ustar header for a regular file `name` of `size` bytes.
    * Deterministic: mode 0644, uid/gid 0, mtime 0 — same input, same
    * bytes, so shard files are content-addressable and task-retry twins
    * write identical output. */
  private[graft] def headerBlock(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"tar member name too long: $name")
    val h = new Array[Byte](Block)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420 /* 0644 */, 8), 0, h, 100, 8) // mode
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12) // size
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum = spaces while summing
    h(156) = '0' // typeflag: regular file
    // POSIX magic "ustar" NUL + version "00"
    System.arraycopy(Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0'),
      0, h, 257, 8)
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    val c = java.lang.Long.toOctalString(sum)
    val chk = ("0" * (6 - c.length)) + c
    // chksum field: 6 octal digits + NUL + space (the POSIX layout)
    System.arraycopy(chk.getBytes("US-ASCII") :+ 0.toByte :+ ' '.toByte,
      0, h, 148, 8)
    h
  }

  /** Serialize (name, payload) members into one ustar archive (two zero
    * blocks terminate it). */
  def tarBytes(members: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      out.write(headerBlock(name, payload.length.toLong))
      out.write(payload)
      val rem = payload.length % Block
      if (rem != 0) out.write(new Array[Byte](Block - rem))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  /** Lazily decode a ustar archive from `in` as (name, payload) members,
    * verifying each header checksum — corruption raises (naming `src`),
    * it never silently drops a member. ONE member is resident at a time:
    * this is the read-side twin of [[write]]'s streaming discipline, so
    * shard size bounds nothing but disk. The stream is closed when the
    * terminator (or EOF at a header boundary) is reached; callers that
    * may abandon the iterator early must close `in` themselves. */
  def memberIterator(in: java.io.InputStream,
      src: String): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val h = new Array[Byte](Block)
      private var pending: (String, Array[Byte]) = null
      private var done = false
      private var off = 0L

      private def readUpTo(buf: Array[Byte], len: Int): Int = {
        var n = 0
        while (n < len) {
          val r = in.read(buf, n, len - n)
          if (r < 0) return n
          n += r
        }
        n
      }

      private def readFully(buf: Array[Byte], len: Int): Boolean =
        readUpTo(buf, len) == len

      private def finish(): Unit = { done = true; in.close() }

      private def advance(): Unit = while (pending == null && !done) {
        val got = readUpTo(h, Block)
        // a clean end is EXACTLY zero bytes at a header boundary (or the
        // zero terminator block); 1..511 bytes is a shard torn MID-HEADER
        // — the silently-skipped-member failure the payload guards below
        // already refuse, so refuse it here too
        require(got == 0 || got == Block,
          s"truncated tar header at offset $off in $src ($got of $Block bytes)")
        if (got == 0 || h.forall(_ == 0)) finish()
        else {
          val stored = new String(h, 148, 8, "US-ASCII")
            .dropWhile(_ == ' ').takeWhile(c => c >= '0' && c <= '7')
          val expected = java.lang.Long.parseLong(stored, 8)
          var sum = 0L
          var i = 0
          while (i < Block) {
            val b = if (i >= 148 && i < 156) ' '.toByte else h(i)
            sum += (b & 0xff); i += 1
          }
          require(sum == expected,
            s"tar header checksum mismatch at offset $off in $src ($sum != $expected)")
          val magic = new String(h, 257, 5, "US-ASCII")
          require(magic == "ustar", s"not a ustar header at offset $off in $src: $magic")
          val nameLen = (0 until 100).indexWhere(h(_) == 0) match {
            case -1 => 100
            case n => n
          }
          val name = new String(h, 0, nameLen, "US-ASCII")
          // size stays a Long until the one-member buffer forces the cap —
          // a >=2 GiB member (legal ustar) gets a diagnostic, not a
          // negative-length copy failure
          val size = java.lang.Long.parseLong(
            new String(h, 124, 12, "US-ASCII")
              .takeWhile(c => c >= '0' && c <= '7'), 8)
          require(size <= Int.MaxValue.toLong,
            s"tar member too large for one in-memory payload: $name is $size bytes in $src")
          val payload = new Array[Byte](size.toInt)
          require(readFully(payload, size.toInt),
            s"truncated tar member $name at offset $off in $src")
          val pad = ((Block - (size % Block)) % Block).toInt
          if (pad > 0) {
            val skip = new Array[Byte](pad)
            require(readFully(skip, pad),
              s"truncated tar padding after $name at offset $off in $src")
          }
          off += Block + size + pad
          // regular files only: ASCII '0' (what this writer stamps) OR the
          // pre-POSIX NUL typeflag older tar writers use for regular files
          // — an externally-produced shard must not have every member
          // silently dropped (the "never silently drops a member" contract
          // above; r14 ADVICE).
          if (h(156) == '0'.toByte || h(156) == 0) pending = (name, payload)
        }
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): (String, Array[Byte]) = {
        advance()
        if (pending == null) throw new NoSuchElementException("tar exhausted")
        val m = pending; pending = null; m
      }
    }

  /** Parse an in-memory ustar archive into (name, payload) members — the
    * eager face of [[memberIterator]] for already-resident bytes. */
  def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    memberIterator(new java.io.ByteArrayInputStream(bytes), "<bytes>").toSeq

  private def memberName(key: Long, suffix: String): String =
    f"$key%012d.$suffix"

  /** Streaming byte-equality of two same-length files (the rename-failure
    * twin check — never loads either file whole; shared with
    * [[WarcGz.write]]'s commit). */
  private[io] def sameBytes(fs: org.apache.hadoop.fs.FileSystem,
      a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Boolean = {
    val ia = fs.open(a)
    val ib = fs.open(b)
    try {
      val ba = new Array[Byte](65536)
      val bb = new Array[Byte](65536)
      def fill(in: java.io.InputStream, buf: Array[Byte]): Int = {
        var n = 0
        var r = 0
        while (n < buf.length && r >= 0) {
          r = in.read(buf, n, buf.length - n)
          if (r > 0) n += r
        }
        n
      }
      var same = true
      var done = false
      while (same && !done) {
        val na = fill(ia, ba)
        val nb = fill(ib, bb)
        if (na != nb) same = false
        else if (na == 0) done = true
        else {
          var i = 0
          while (same && i < na) { if (ba(i) != bb(i)) same = false; i += 1 }
          if (na < ba.length) done = true
        }
      }
      same
    } finally { ia.close(); ib.close() }
  }

  /** Export samples as tar shards under `dir`: one row per sample keyed by
    * `keyCol` (long), one tar member per (binary column, suffix) in
    * `members`. Samples are range-partitioned on the key into `shards`
    * tasks; each task streams ONE `shard_NNNNN.tar` (temp + rename commit,
    * the torn-shard guard). A NULL member column is SKIPPED — the
    * symmetric inverse of [[readSamples]] surfacing a missing member as
    * NULL — but a sample whose members are ALL null would vanish on read,
    * so it raises instead. Size shards via `shards` so one tar lands in
    * the loaders' sweet spot (~100 MB–1 GB at corpus scale). Returns
    * per-shard (shard, samples, minKey, maxKey) and writes
    * `manifest.json`. */
  def write(df: DataFrame, keyCol: String, members: Seq[(String, String)],
      dir: String, shards: Int): Seq[(Int, Long, Long, Long)] = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(members.nonEmpty, "need at least one member column")
    val spark = df.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val suffixes = members.map(_._2)
    val cols = col(keyCol).cast("long").as("__k") +:
      members.map { case (c, _) => col(c).cast("binary") }
    val parts = df.select(cols: _*)
      .repartitionByRange(shards, col("__k"))
      .sortWithinPartitions("__k")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val shard = tc.partitionId()
          val dest = new org.apache.hadoop.fs.Path(dir, f"shard_$shard%05d.tar")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".shard_$shard%05d.tar.attempt${tc.taskAttemptId()}%d.tmp")
          val fs = dest.getFileSystem(confBc.value.value)
          // STREAM members straight to the filesystem: a shard at the
          // loaders' sweet spot is 100 MB-1 GB, and buffering the whole
          // archive (or the partition's rows) in task memory would make
          // shard size a heap ceiling instead of a tuning knob
          val out = fs.create(tmp, true)
          var n = 0L
          var lo = 0L
          var hi = 0L
          try {
            it.foreach { r =>
              val k = r.getLong(0)
              if (n == 0L) lo = k
              hi = k
              n += 1L
              var wrote = false
              suffixes.zipWithIndex.foreach { case (sfx, i) =>
                val payload = r.getAs[Array[Byte]](i + 1)
                if (payload != null) {
                  wrote = true
                  out.write(headerBlock(memberName(k, sfx), payload.length.toLong))
                  out.write(payload)
                  val rem = payload.length % Block
                  if (rem != 0) out.write(new Array[Byte](Block - rem))
                }
              }
              require(wrote, s"TarShards.write: sample $k has every member " +
                "column NULL — it would write no members and silently " +
                "vanish on read; filter such rows (or supply a payload) first")
            }
            out.write(new Array[Byte](2 * Block))
          } finally out.close()
          if (!fs.rename(tmp, dest)) {
            // A pre-existing dest is only a SAFE commit if it is this
            // task's deterministic twin (a retry that won the rename) —
            // verified by BYTE comparison, not length: a stale shard from
            // a previous export can coincide in length (same keys,
            // same-size payload edits) and must not survive under a
            // fresh manifest claiming this run's counts. The compare only
            // runs on the rare rename-failure path.
            val twin = fs.exists(dest) &&
              fs.getFileStatus(dest).getLen == fs.getFileStatus(tmp).getLen &&
              sameBytes(fs, tmp, dest)
            if (twin) fs.delete(tmp, false)
            else {
              if (fs.exists(dest)) fs.delete(dest, false)
              if (!fs.rename(tmp, dest))
                sys.error(s"TarShards.write: rename $tmp -> $dest failed")
            }
          }
          Iterator.single((shard, n, lo, hi))
        }
      }.collect().sortBy(_._1).toSeq
    val manifest = parts.map { case (s, n, lo, hi) =>
      f"""{"file": "shard_$s%05d.tar", "samples": $n, "min_key": $lo, "max_key": $hi}"""
    }.mkString("[\n  ", ",\n  ", "\n]")
    val mPath = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val mOut = fs.create(mPath, true)
    try mOut.write(manifest.getBytes("UTF-8")) finally mOut.close()
    parts
  }

  /** Read shards back, one row per SAMPLE: (key, <suffix> binary, ...).
    * One task per shard file; each task STREAMS its shard member-by-member
    * off an `FSDataInputStream` through [[memberIterator]], so task heap
    * is bounded by the largest member plus one sample — never the shard
    * (the write side's own rule, applied to the read). The per-sample
    * pivot is a single map-side pass over each shard's members (the write
    * contract keeps a sample's members contiguous) — no shuffle, no join.
    * A member whose suffix isn't requested is ignored; a sample missing a
    * requested member surfaces it NULL. */
  def readSamples(spark: SparkSession, dir: String,
      suffixes: Seq[String]): DataFrame = {
    val schema = StructType(StructField("key", LongType, nullable = false) +:
      suffixes.map(s => StructField(s, BinaryType, nullable = true)))
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val pat = new org.apache.hadoop.fs.Path(dir, "shard_*.tar")
    val fs = pat.getFileSystem(spark.sessionState.newHadoopConf())
    val files = Option(fs.globStatus(pat)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"TarShards.readSamples: no shard_*.tar under $dir")
    // one partition per shard — the file-granularity parallelism the
    // format is built around, with no Exchange anywhere in the plan
    val paths = spark.createDataset(
      spark.sparkContext.parallelize(files, files.length))(
      org.apache.spark.sql.Encoders.STRING)
    paths.mapPartitions { it =>
      it.flatMap { path =>
        val p = new org.apache.hadoop.fs.Path(path)
        val in = p.getFileSystem(confBc.value.value).open(p)
        // memberIterator closes `in` at the terminator; the listener is
        // the backstop for a task that dies mid-shard
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => } })
        val membersByKey = memberIterator(in, path).map {
          case (name, payload) =>
            val dot = name.lastIndexOf('.')
            (name.substring(0, dot).toLong, name.substring(dot + 1), payload)
        }
        // contiguity contract: group consecutive members sharing a key
        new Iterator[Row] {
          private val buf = membersByKey.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Row = {
            val k = buf.head._1
            val m = scala.collection.mutable.Map.empty[String, Array[Byte]]
            while (buf.hasNext && buf.head._1 == k) {
              val (_, sfx, p) = buf.next(); m(sfx) = p
            }
            Row.fromSeq(k +: suffixes.map(s => m.getOrElse(s, null)))
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
