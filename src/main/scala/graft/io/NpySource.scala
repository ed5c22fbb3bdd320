package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** S3 — native reader for the reference's `.npy` dense-matrix files
  * (`skill_vectors.npy` / `generic_job_desc_<provider>.npy`, loaded with
  * `np.load` at `load_skill_vectors_pg.py:20-23`, `skills_for_jobs.py:399-400`).
  *
  * The reference joins matrix row i to CSV row i positionally
  * (SURVEY.md §2.5 J1); this reader makes that contract explicit by
  * manufacturing `vec_id` = row index within each file, so downstream joins
  * are ordinary equi-joins on a real key.
  *
  * Spark shape: `binaryFile` source (one task per file — matrices
  * parallelize across files, which is how the reference shards providers) →
  * header parse + buffer decode per partition. Supports NPY format 1.x/2.x,
  * C-order, little-endian f4/f8.
  */
object NpySource {

  /** (file string, vec_id long, embedding array<float>) — one row per
    * matrix row, f8 values narrowed to f4's double-widened values kept as
    * float (the reference's vectors are f4). */
  def readFloatMatrix(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val (rows, dim, elemSize, dataOff) = parseHeader(file, bytes)
        val buf = ByteBuffer.wrap(bytes, dataOff, bytes.length - dataOff)
          .order(ByteOrder.LITTLE_ENDIAN)
        (0L until rows).iterator.map { r =>
          val vec = new Array[Float](dim)
          var j = 0
          while (j < dim) {
            val idx = dataOff + ((r * dim + j) * elemSize).toInt
            vec(j) =
              if (elemSize == 4) buf.getFloat(idx)
              else buf.getDouble(idx).toFloat
            j += 1
          }
          (file, r, vec)
        }
      }
      .toDF("file", "vec_id", "embedding")
  }

  /** Returns (rows, dim, elemSize, dataOffset); fails fast on anything the
    * reference never produces (fortran order, big-endian, non-float). */
  private[graft] def parseHeader(file: String, bytes: Array[Byte]): (Long, Int, Int, Int) = {
    require(bytes.length >= 10 &&
      bytes(0) == 0x93.toByte && new String(bytes, 1, 5, "ASCII") == "NUMPY",
      s"$file: not an NPY file")
    val major = bytes(6)
    val (headerLen, headerOff) =
      if (major == 1) ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8), 10)
      else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    val header = new String(bytes, headerOff, headerLen, "ASCII")
    require(!header.contains("'fortran_order': True"),
      s"$file: fortran-order NPY not supported")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"$file: no descr in NPY header"))
    val elemSize = descr match {
      case "<f4" => 4
      case "<f8" => 8
      case other => sys.error(s"$file: unsupported NPY dtype '$other' (need <f4/<f8)")
    }
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1)).getOrElse(sys.error(s"$file: no shape in NPY header"))
    val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    require(dims.length == 2, s"$file: need a 2-D matrix, got shape ($shape)")
    val dataOff = headerOff + headerLen
    require(bytes.length.toLong >= dataOff + dims(0) * dims(1) * elemSize,
      s"$file: truncated NPY payload")
    (dims(0), dims(1).toInt, elemSize, dataOff)
  }

  /** One .npy byte image (v1.0, f4, C-order) for a row-major matrix. */
  private def npyBytes(rows: Array[Array[Float]]): Array[Byte] = {
    val dim = rows.head.length
    val headerDict =
      s"{'descr': '<f4', 'fortran_order': False, 'shape': (${rows.length}, $dim), }"
    val pad = 64 - ((10 + headerDict.length + 1) % 64)
    val header = headerDict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + header.length + rows.length * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("ASCII")).put(1.toByte).put(0.toByte)
    out.putShort(header.length.toShort)
    out.put(header.getBytes("ASCII"))
    rows.foreach(r => r.foreach(out.putFloat))
    out.array()
  }

  /** Writer for round-trip tests and K1-style matrix export: one local .npy
    * (f4, C-order) from (vec_id, array<float>) rows ordered by id.
    * Driver-side collect — test-scoped; the scale path is
    * [[writeFloatMatrixSharded]]. */
  def writeFloatMatrixLocal(df: DataFrame, idCol: String, vecCol: String,
      file: String): Unit = {
    val rows = df.select(col(idCol), col(vecCol)).orderBy(col(idCol))
      .collect().map(_.getSeq[Float](1).toArray)
    require(rows.nonEmpty, "empty matrix")
    java.nio.file.Files.write(java.nio.file.Paths.get(file), npyBytes(rows))
  }

  /** Distributed matrix export: each partition writes ONE .npy shard
    * (`shard_NNNNN.npy`) through the Hadoop FileSystem API (local fs, HDFS,
    * or an object store — whatever `dir`'s scheme resolves to), so the
    * matrix never passes through the driver. Rows are range-partitioned and
    * sorted by id, so logical row order is (shard asc, row asc) — the
    * contract sharded tensor formats (TFRecord shards, WebDataset) use. A
    * driver-written `manifest.json` records per-shard (file, rows, min/max
    * id) for readers that need the global shape without opening shards.
    * Returns the shard summaries in shard order. */
  def writeFloatMatrixSharded(df: DataFrame, idCol: String, vecCol: String,
      dir: String, shards: Int): Seq[(Int, Long, Long, Long)] = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    // Ship the SESSION's Hadoop configuration to executors (a bare
    // `new Configuration()` would lose spark.hadoop.* overrides and
    // object-store credentials — ADVICE r4).
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sessionState.newHadoopConf()))
    val parts = df.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<float>").as("__v"))
      .repartitionByRange(shards, col("__id"))
      .sortWithinPartitions("__id")
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val shard = tc.partitionId()
          val dest = new org.apache.hadoop.fs.Path(dir, f"shard_$shard%05d.npy")
          // Write-to-temp + rename commit: a task retry or speculative twin
          // dies mid-write on its own attempt-unique temp file, never on the
          // destination, so readers can't observe a torn shard. Rename is
          // atomic on HDFS/local fs, and we never delete an existing
          // destination: a dest that exists was completed by a winning
          // attempt with identical (deterministic) bytes, so the loser just
          // discards its temp — a delete-then-rename here could race a
          // speculation cancel and leave the shard missing entirely.
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".shard_$shard%05d.npy.attempt${tc.taskAttemptId()}%d.tmp")
          val fs = dest.getFileSystem(confBc.value.value)
          val out = fs.create(tmp, true)
          try out.write(npyBytes(rows.map(_._2))) finally out.close()
          if (!fs.rename(tmp, dest)) {
            if (fs.exists(dest)) fs.delete(tmp, false) // duplicate attempt lost the race: dest is complete
            else sys.error(s"writeFloatMatrixSharded: rename $tmp -> $dest failed")
          }
          Iterator.single((shard, rows.length.toLong, rows.head._1, rows.last._1))
        }
      }.collect().sortBy(_._1).toSeq
    val manifest = parts.map { case (s, n, lo, hi) =>
      f"""{"file": "shard_$s%05d.npy", "rows": $n, "min_id": $lo, "max_id": $hi}"""
    }.mkString("[\n  ", ",\n  ", "\n]")
    val mPath = new org.apache.hadoop.fs.Path(dir, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    val mOut = fs.create(mPath, true)
    try mOut.write(manifest.getBytes("UTF-8")) finally mOut.close()
    parts
  }
}
