package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point deletes for stored index layouts — the lifecycle verb the tiers'
  * build / O(delta)-append / compact / rebuild faces were missing. Every
  * vector store behind the reference exposes it (pgvector rows are plain
  * SQL `DELETE`s on the table `load_skill_vectors_pg.py` creates; Milvus
  * and Qdrant both serve `delete(ids)` on the collections
  * `load_skill_vectors_milvus.py:40-50` builds), and a training-data
  * deployment needs it independently: right-to-be-forgotten takedowns must
  * remove documents from every serving index without a full rebuild.
  *
  * Design — tombstones, never in-place rewrites (the Lucene/FAISS
  * `remove_ids` trade): at 100 TB a delete of k rows must not rewrite
  * multi-TB layouts, so [[add]] appends the ids to a tiny side store and
  * the DATA FILES ARE NEVER TOUCHED. Readers drop deleted rows with an
  * anti-join ([[excludeDeleted]] / the search faces' `excludeIds`);
  * compaction ([[IvfIndex.compact]]) physically purges them and clears the
  * side store in one rewrite. Between delete and compact the tombstone set
  * is O(deletes since last compact) — small by the same argument as any
  * LSM delete marker — so the anti-join's build side broadcasts under AQE
  * and exclusion costs no extra shuffle.
  *
  * The side store is a parquet directory named [[SideDir]] INSIDE the
  * layout path. The underscore prefix makes it invisible to every
  * pre-existing reader of the layout (Spark's file index skips `_`/`.`
  * paths), so stamping tombstones onto a live layout changes nothing for
  * consumers that don't opt in — and a layout rebuild/overwrite deletes
  * the directory with the stale data files, which is exactly the right
  * lifetime (tombstones against a layout die with the layout).
  *
  * Contract: a tombstoned id stays dead until compaction physically purges
  * it. Id-level markers cannot express "resurrect" — clearing a marker
  * would revive the OLD resident row alongside any re-insert — so
  * re-inserting a deleted id requires compacting first
  * ([[IvfIndex.append]] guards the ordering mistake loudly), and row-level
  * UPDATE is not this module's verb: vector updates ride the
  * compact/rebuild cycle (or a latest-wins snapshot layout like
  * [[Cdc]]'s, where the version-argmax window is the native upsert).
  */
object Tombstones {

  /** The tombstone store's directory name under the layout path. */
  val SideDir = "_graft_tombstones"

  private def sidePath(layoutPath: String) =
    new org.apache.hadoop.fs.Path(layoutPath, SideDir)

  /** Sibling backup dir OUTSIDE the layout path — the crash-safety net of
    * [[preserveAcrossRewrite]] (a layout rewrite truncates the location,
    * side store included; the backup is what survives a crash between the
    * rewrite's commit and the marker restore). */
  private def backupPath(layoutPath: String) =
    new org.apache.hadoop.fs.Path(layoutPath.stripSuffix("/") + "__tombs_backup")

  /** Delete `ids` from the layout at `layoutPath`: append one tombstone row
    * per id (column `id`, the input's `idCol` type preserved). Idempotent
    * for readers — [[excludeDeleted]] is an anti-join, so duplicate
    * tombstones and ids absent from the layout are both harmless no-ops. */
  def add(ids: DataFrame, idCol: String, layoutPath: String): Unit =
    ids.select(col(idCol).as("id"))
      .write.mode("append").parquet(sidePath(layoutPath).toString)

  /** The layout's current tombstone set as (id), or None if nothing was
    * ever deleted. The read is the UNION of the side store and the
    * sibling backup ([[preserveAcrossRewrite]] — after a crash
    * mid-restore the backup is the only copy, and when both exist they
    * hold the same set, so duplicate rows are harmless under anti-join
    * semantics). Each store's part files are enumerated and passed
    * explicitly: the side dir's underscore prefix is what hides it from
    * LAYOUT readers, and Spark's hidden-path filter must not be given the
    * chance to hide it from THIS reader too (an ignored store would
    * silently serve deleted rows as live). */
  def read(spark: SparkSession, layoutPath: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = Seq(sidePath(layoutPath), backupPath(layoutPath)).flatMap { p =>
      val fs = p.getFileSystem(conf)
      if (fs.exists(p))
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".parquet"))
          .toIndexedSeq
      else IndexedSeq.empty[org.apache.hadoop.fs.Path]
    }
    if (files.isEmpty) None
    else Some(spark.read.parquet(files.map(_.toString): _*))
  }

  /** Streaming takedown ingestion — the deployed shape of a
    * right-to-be-forgotten queue: each micro-batch of delete requests
    * (rows carrying `idCol`) is appended to the layout's side store, so
    * serving paths that read the store per request (or per serving batch)
    * observe each takedown after its batch commits. The per-batch work is
    * one tiny append — [[add]] behind the same foreachBatch bridge every
    * index-maintenance stream face here uses; ordering within the stream
    * is immaterial (the store is a set under anti-join semantics, and
    * duplicate requests are no-ops for readers). Batch-parity is pinned
    * in TombstonesSpec: after any prefix of batches, serving equals the
    * batch [[add]] of the same ids.
    *
    * Quiesce this stream across a compaction/purge of the same layout
    * (the single-maintenance-writer contract — see
    * [[Bucketed.compactTable]]): a takedown committed between the
    * compaction's marker snapshot and its rewrite would be destroyed
    * with the replaced files while its row survives. */
  def addStream(idStream: DataFrame, idCol: String, layoutPath: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    idStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        add(batch.toDF(), idCol, layoutPath)
      }
      .outputMode("append")
      .start()

  /** Drop the side store AND the sibling backup — called by the purge
    * rewrites AFTER they land (a purge that cleared markers first would
    * serve deleted rows if the rewrite failed midway; a stale backup left
    * behind would resurrect markers whose rows the purge just removed). */
  def clear(spark: SparkSession, layoutPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(sidePath(layoutPath), backupPath(layoutPath)).foreach { p =>
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Run `rewrite` — an operation that truncates the layout location,
    * side store included (a compaction, or any `mode("overwrite")` of the
    * path) — with the delete markers crash-safe at EVERY point:
    * (1) snapshot the current marker set to the sibling backup (outside
    * the layout, untouchable by the rewrite); (2) rewrite; (3) re-add the
    * markers into the fresh layout; (4) drop the backup. [[read]] unions
    * the backup with the main store, so a crash after (2) still serves
    * every marker from the backup, and a crash during (1) or after (3)
    * leaves at worst duplicate rows (reader no-ops); the next cycle's
    * snapshot re-converges the copies. Without this protocol a crash
    * between the rewrite's commit and the restore silently RESURRECTS
    * every deleted row — the failure mode the side-store design must
    * never allow. */
  def preserveAcrossRewrite[T](spark: SparkSession, layoutPath: String)(
      rewrite: => T): T = {
    val markers = read(spark, layoutPath).map(_.localCheckpoint())
    markers.foreach(_.select(col("id"))
      .write.mode("overwrite").parquet(backupPath(layoutPath).toString))
    val r = rewrite
    markers.foreach(add(_, "id", layoutPath))
    val bp = backupPath(layoutPath)
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(bp)) fs.delete(bp, true)
    r
  }

  /** `df` minus the ids in a tombstone frame — the ONE anti-join every
    * exclusion site shares (`__tomb_id` naming, join semantics, and any
    * future type normalization live here). `key` is the df-side join key
    * as a Column so callers can pass either a raw column or a derived one
    * (e.g. KnnJoin's widened `__cid`). */
  def excludeIds(df: DataFrame, key: org.apache.spark.sql.Column,
      tombs: DataFrame): DataFrame =
    df.join(tombs.select(col("id").as("__tomb_id")),
      key === col("__tomb_id"), "left_anti")

  /** `df` minus the layout's tombstoned ids — identity when nothing was
    * ever deleted. The anti-join's tombstone side is bounded by the
    * delete-since-compact volume, so AQE broadcasts it; use this at the
    * VECTOR/candidate lookup (LSH, graph ranking), or pass [[read]] to the
    * probe-pruned searches' `excludeIds` (IVF, IVFADC) where exclusion
    * must not sit between the partitioned scan and the probe join (an
    * anti-join there would break DynamicPruningExpression partition
    * pruning — see [[IvfIndex.search]]). */
  def excludeDeleted(df: DataFrame, idCol: String, spark: SparkSession,
      layoutPath: String): DataFrame =
    read(spark, layoutPath) match {
      case Some(t) => excludeIds(df, df(idCol), t)
      case None => df
    }
}
