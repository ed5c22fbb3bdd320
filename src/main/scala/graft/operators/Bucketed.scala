package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (K4-adjacent; SURVEY.md §6
  * "partitioning & shuffle" posture). The reference re-shuffles on every
  * query because its stores index row-at-a-time; a batch engine instead
  * pre-shuffles ONCE at write time: `bucketBy(n, key)` hashes rows into a
  * fixed number of files per partition, and Spark's bucketed scan exposes
  * that layout as `HashPartitioning(key, n)` — equi-joins and aggregations
  * on `key` between tables bucketed the same way then plan with ZERO
  * Exchange. At 100 TB this converts the recurring O(|fact|) join shuffle
  * into a one-time write cost amortized over every downstream query, the
  * same trade as a clustered index build.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted external parquet table at
    * `path`. Re-registers `tableName` (overwrite semantics — K3's
    * truncate-then-load applied to a layout). Sorting within buckets lets
    * sort-merge joins skip the Sort as well when each bucket lands in one
    * file. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      key: String, numBuckets: Int): Unit =
    writeBucketedKeys(df, tableName, path, Seq(key), numBuckets)

  /** Multi-column bucketing (e.g. an LSH index laid out on
    * (tbl, bucket)). `partCols` additionally DIRECTORY-partitions the
    * layout (partitionBy + bucketBy compose): point probes then prune to
    * the touched directories — a static `IN` on the partition column
    * reaches the scan's PartitionFilters, so per-batch maintenance reads
    * touched buckets instead of the table (the [[graft.operators.CcStar]]
    * label store's read-side bound), while the bucketed layout inside
    * each directory keeps full-table aggregations on the keys
    * exchange-free (Spark coalesces same-bucket files across partition
    * directories into one read partition). */
  def writeBucketedKeys(df: DataFrame, tableName: String, path: String,
      keys: Seq[String], numBuckets: Int, partCols: Seq[String] = Nil): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(keys.nonEmpty, "need at least one bucketing key")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val w = clusterByBucket(df, keys, numBuckets)
      .write.mode("overwrite").format("parquet")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(tableName)
  }

  /** Hash-cluster rows to ONE write task per bucket before a bucketed
    * write (r17; guide §6 output sizing): an unclustered `bucketBy` emits
    * up to (input partitions × buckets) files — every writer task opens a
    * file for every bucket value it holds — which at 100 TB is the classic
    * small-files explosion on the store's one-time build AND on every
    * delta append. `repartition(numBuckets, keys)` uses the same Murmur3
    * hash as the bucket assignment, so each task holds exactly one
    * bucket's rows and each (partition dir, bucket) lands in one file.
    * Row content, bucket membership, and within-bucket sort are untouched
    * — layout only. */
  private def clusterByBucket(df: DataFrame, keys: Seq[String],
      numBuckets: Int): DataFrame =
    df.repartition(numBuckets,
      keys.map(org.apache.spark.sql.functions.col): _*)

  /** Append `df` into an existing bucketed table with the SAME bucket spec
    * (Spark validates the spec against the catalog entry): the delta rows
    * hash into the same bucket files as the base build, so every downstream
    * co-located join/probe keeps its exchange-free plan — the O(delta)
    * ingest half of the write-once trade above. Each append adds at most
    * one file per bucket; periodic compaction (re-running the overwrite
    * form) bounds file counts in a long-lived deployment. */
  def appendBucketedKeys(df: DataFrame, tableName: String,
      keys: Seq[String], numBuckets: Int, partCols: Seq[String] = Nil): Unit = {
    val w = clusterByBucket(df, keys, numBuckets)
      .write.mode("append").format("parquet")
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(tableName)
    // The session caches the table's resolved relation (file listing
    // included); an append from inside a streaming foreachBatch does NOT
    // reliably invalidate it, so a later micro-batch probing the table can
    // read the PRE-append snapshot silently (caught by CdcSpec's streaming
    // ingest test — batch 3 couldn't see batch 2's append). Refresh makes
    // append → probe sequencing correct for every appendable index.
    df.sparkSession.catalog.refreshTable(tableName)
  }

  /** The shared compaction scaffold for appendable bucketed layouts:
    * materialize `merge` of the live table OFF the table (a bucketed
    * overwrite of its own scan would read-while-truncate), rewrite through
    * the same bucketed layout at the same location, and carry the build's
    * fingerprint across — compaction changes layout, never identity.
    * "Identity" includes the layout's [[Tombstones]] side store: the
    * rewrite deletes the location's contents, and silently dropping
    * delete markers while their rows survive would RESURRECT deleted
    * rows — so the markers are restored across the rewrite by default.
    * Pass `purgeIdCol` to make the compaction a physical purge instead:
    * tombstoned ids are anti-joined out of the merged rows and the
    * markers die WITH the rewrite (cleared tombstones can never ship
    * without the purge that justifies them — [[IvfIndex.compact]]'s
    * invariant). One definition for the span-count, LSH-bucket,
    * CDC-chunk, and graph-edge stores.
    *
    * SINGLE MAINTENANCE WRITER: like every maintenance face here, the
    * rewrite assumes no concurrent mutation of the same layout — an
    * append (bucketed rows) or a takedown ([[Tombstones.add]] /
    * `addStream`) committed between this method's snapshot reads and its
    * rewrite is lost with the files the rewrite replaces. Quiesce
    * ingestion and takedown streams for the layout across a compaction
    * window; crash-safety WITHIN the single writer is what
    * [[Tombstones.preserveAcrossRewrite]] provides, not concurrency.
    * Since r13 the TAKEDOWN half is fenced ([[Tombstones.fencedRewrite]]
    * brackets this whole body, marker read included): a takedown racing
    * the window raises instead of being silently destroyed. */
  def compactTable(spark: SparkSession, tableName: String, keys: Seq[String],
      numBuckets: Int, purgeIdCol: Option[String] = None,
      partCols: Seq[String] = Nil)(
      merge: DataFrame => DataFrame): Unit = {
    val fp = graft.Layouts.readFingerprint(spark, tableName)
    val loc = spark.sql(s"DESCRIBE FORMATTED $tableName")
      .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
      .select("data_type").head().getString(0)
    Tombstones.fencedRewrite(spark, loc) {
      val tombs = Tombstones.read(spark, loc).map(_.localCheckpoint())
      val base = spark.table(tableName)
      val rows = purgeIdCol match {
        case Some(idCol) if tombs.nonEmpty =>
          Tombstones.excludeIds(base, base(idCol), tombs.get)
        case _ => base
      }
      val merged = merge(rows).localCheckpoint()
      purgeIdCol match {
        case None =>
          // layout-only compaction: the markers ride the crash-safe
          // backup/restore protocol — a kill at any point between the
          // rewrite's commit and the restore must not resurrect rows
          // (unfenced form: this body already holds the layout's fence)
          Tombstones.preserveUnfenced(spark, loc)(
            writeBucketedKeys(merged, tableName, loc, keys, numBuckets,
              partCols))
        case Some(_) =>
          writeBucketedKeys(merged, tableName, loc, keys, numBuckets, partCols)
          // purge: markers die WITH the rewrite; clear also removes any
          // stale sibling backup a crashed earlier cycle left behind
          Tombstones.clear(spark, loc)
      }
      fp.foreach(graft.Layouts.stampFingerprint(spark, tableName, _))
    }
  }

  /** Equi-join two tables bucketed on `key` with the same bucket count:
    * both scans report the same HashPartitioning, so the join (and any
    * following aggregation on `key`) plans exchange-free. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
