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
