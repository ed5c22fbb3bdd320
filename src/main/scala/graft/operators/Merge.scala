package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batched upsert as a row operator (SURVEY.md §2.2 K4 — the reference's
  * stores upsert batches by id without reindexing, e.g.
  * `load_skill_vectors_pinecone.py:36-49`; in a batch engine the same
  * contract is a keyed merge producing the next table version).
  *
  * SCD-1 semantics: a delta row REPLACES the base row with its key; delta
  * keys absent from the base are inserts; base rows without a delta twin
  * pass through. One keyed shuffle (the window partitions on the merge
  * key), no driver round-trip, no per-row lookups — at 100 TB the merge is
  * a shuffle of base+delta once, and writing the result bucketed on the key
  * ([[Bucketed.writeBucketed]]) makes the NEXT merge's shuffle one-sided.
  */
object Merge {

  /** Upsert `delta` into `base` on `keyCol`. Duplicate keys WITHIN the
    * delta resolve by `tieCol` ascending (first wins) — deterministic ONLY
    * while no two delta rows share (keyCol, tieCol); with a full duplicate
    * pair the window's winner is partition-order luck, so callers must
    * supply a genuinely distinguishing tie column (a batch sequence number,
    * an ingest timestamp) or guarantee delta keys unique, as
    * merge_upsert_docs does structurally (update and insert key spaces are
    * sign-disjoint). Output: base schema + `__src` ('delta'/'base') marking
    * which side won each key. */
  def upsert(base: DataFrame, delta: DataFrame, keyCol: String,
      tieCol: String): DataFrame = {
    val cols = base.columns.toSeq
    require(delta.columns.toSeq == cols,
      s"upsert: delta schema ${delta.columns.toSeq} != base schema $cols")
    val reserved = Seq("__src", "__pri", "__rn").filter(cols.contains)
    require(reserved.isEmpty,
      s"upsert: base carries reserved internal column(s) $reserved — " +
        "withColumn would silently overwrite them and corrupt the output")
    val d = delta.select(cols.map(col): _*)
      .withColumn("__src", lit("delta")).withColumn("__pri", lit(0))
    val b = base.select(cols.map(col): _*)
      .withColumn("__src", lit("base")).withColumn("__pri", lit(1))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__pri"), col(tieCol))
    d.unionByName(b)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }

  /** SCD-2 history merge — the versioned sibling of [[upsert]]: instead of
    * replacing a row, a changed key CLOSES the current version
    * (`valid_to` = `batchId`) and appends a new one (`valid_from` =
    * `batchId`, `valid_to` null = current). What a corpus pipeline needs
    * the moment "what did this document say when we trained run N" is a
    * real question — lineage/audit over a mutating crawl, with versions
    * keyed by exact batch numbers, never wall clock (deterministic and
    * replayable).
    *
    * Rules per delta key: absent from current → insert; present and ANY
    * data column differs (null-safe) → close + insert; present and
    * identical → NO-OP (no spurious version — re-delivering a crawl batch
    * at-least-once leaves history unchanged). Base versions without a
    * delta twin pass through untouched.
    *
    * Duplicate keys WITHIN one batch are resolved BEFORE the merge —
    * byte-identical copies collapse (the same-batch at-least-once case:
    * without this, the full-outer join would fan out and mint duplicate
    * open versions), and genuinely conflicting duplicates pick one winner
    * deterministically (lexicographic-least over the data columns), since
    * two different versions cannot share one `valid_from`. Requires the
    * data columns to be orderable types.
    *
    * Scale shape: ONE keyed full-outer join of current×delta decides every
    * key's action in a single pass (the three outcomes are built as an
    * exploded struct array, so the join is never recomputed per leg);
    * closed history passes through without touching the join. History
    * grows append-only — at 100 TB the natural layout is the history table
    * bucketed on the key so each batch's merge shuffles one side only.
    *
    * `history` schema: delta's columns + (`valid_from` long, `valid_to`
    * long-nullable). Bootstrap: [[scd2Init]]. */
  def scd2Apply(history: DataFrame, delta: DataFrame, keyCol: String,
      batchId: Long): DataFrame = {
    val metaCols = Seq("valid_from", "valid_to")
    val dataCols = history.columns.toSeq.filterNot(metaCols.contains)
    require(delta.columns.toSeq == dataCols,
      s"scd2Apply: delta schema ${delta.columns.toSeq} != history data columns $dataCols")
    require(metaCols.forall(history.columns.contains),
      s"scd2Apply: history must carry $metaCols")
    val cur = history.filter(col("valid_to").isNull)
    val closedRows = history.filter(col("valid_to").isNotNull)
    val c = cur.select(col(keyCol) +:
      dataCols.map(n => col(n).as(s"__c_$n")) :+
      col("valid_from").as("__c_vf") :+ lit(1).as("__hc"): _*)
    // Within-batch key resolution (see scaladoc): one row per key, chosen
    // deterministically, BEFORE the join — a duplicated key would
    // otherwise fan the full-outer join out and mint duplicate versions.
    // Key-only histories have no columns to order by (every duplicate is
    // byte-identical by construction), so distinct() suffices there.
    val nonKeyCols = dataCols.filterNot(_ == keyCol)
    val deltaOne =
      if (nonKeyCols.isEmpty) delta.distinct()
      else {
        val wDelta = Window.partitionBy(col(keyCol))
          .orderBy(nonKeyCols.map(col): _*)
        delta.withColumn("__dn", row_number().over(wDelta))
          .filter(col("__dn") === 1).drop("__dn")
      }
    val d = deltaOne.select(col(keyCol) +:
      dataCols.map(n => col(n).as(s"__d_$n")) :+ lit(1).as("__hd"): _*)
    val j = c.join(d, Seq(keyCol), "full_outer")
    val hasC = col("__hc").isNotNull
    val hasD = col("__hd").isNotNull
    val changed = dataCols.filterNot(_ == keyCol)
      .map(n => !(col(s"__c_$n") <=> col(s"__d_$n")))
      .foldLeft(lit(false))(_ || _)
    def ver(side: String, vf: org.apache.spark.sql.Column,
        vt: org.apache.spark.sql.Column) =
      struct(dataCols.map(n =>
        (if (n == keyCol) col(keyCol) else col(s"__${side}_$n")).as(n)) :+
        vf.as("valid_from") :+ vt.as("valid_to"): _*)
    val nullVt = lit(null).cast("long")
    val out = j.select(explode(filter(array(
        when(hasC && (!hasD || !changed), ver("c", col("__c_vf"), nullVt)),
        when(hasC && hasD && changed, ver("c", col("__c_vf"), lit(batchId))),
        when(hasD && (!hasC || changed), ver("d", lit(batchId), nullVt))),
      x => x.isNotNull)).as("__v"))
      .select(col("__v.*"))
    closedRows.select(out.columns.map(col): _*).unionByName(out)
  }

  /** Bootstrap an SCD-2 history from an initial snapshot: every row is
    * version (`batchId`, null-open). */
  def scd2Init(snapshot: DataFrame, batchId: Long = 0L): DataFrame =
    snapshot.withColumn("valid_from", lit(batchId))
      .withColumn("valid_to", lit(null).cast("long"))

  /** The delete leg of the table-maintenance trio (K3 truncate, [[upsert]],
    * delete — the "right to be forgotten" pipeline at corpus scale): drop
    * every base row whose key appears in `keys`. A plain left-anti join —
    * Spark broadcasts a small key set by itself, and for a huge one the
    * bloom shape applies first ([[BloomPrune.semiReduce]] on the NEGATION
    * can't work — blooms have false positives — but pre-partitioning both
    * sides on the key does). */
  def delete(base: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    // No distinct() on the key set: left-anti semantics ignore duplicate
    // right-side keys, and the de-dup would cost a full extra shuffle of
    // the keys on exactly the huge-key-set path this operator is for.
    base.join(keys.select(col(keyCol)), Seq(keyCol), "left_anti")
}
