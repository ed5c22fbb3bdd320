package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (MOSS): Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003.
  *
  * Over the non-distinct k-gram rolling hashes of [[SpanDedup.gramPositions]],
  * slide a window of `w` consecutive gram positions and select each window's
  * MINIMUM hash, rightmost position on ties (the paper's winnowing rule —
  * NOT its stateful 'robust' variant, which prefers the previously
  * selected fingerprint on ties); the distinct selected (position, hash) pairs are the document's
  * fingerprints. Guarantees (paper §2): any shared token run of length
  * ≥ w + k − 1 contributes at least one shared fingerprint, and no run
  * shorter than k is ever matched — so the pair census below is a
  * recall-guaranteed plagiarism/overlap detector at ~2/(w+1) the gram
  * density.
  *
  * Determinism: the (min-hash, rightmost-pos) argmin is packed into ONE
  * integer key `ghv·2³² + (2³²−1−pos)` so a single `min()` window aggregate
  * resolves both the value and the tie-break — no float, no engine-specific
  * argmin order; the DuckDB mirror replays the identical arithmetic
  * ([[graft.queries.DocSql.winnowCte]]). Hashes are < 2³⁰
  * ([[Dedup.ShingleP]]) and positions < 2³², so the key stays < 2⁶² —
  * exact in a BIGINT (docs are bounded far below 2³² tokens; ANSI mode
  * would throw on overflow rather than wrap).
  *
  * Documents with fewer than `w` gram windows get one partial window (the
  * whole document) instead of none, so short docs still fingerprint.
  *
  * 100 TB posture: selection is one window function partitioned by doc_id —
  * embarrassingly parallel, no cross-doc shuffle beyond the doc-keyed
  * repartition it shares with every per-doc text operator. The pair census
  * equi-joins on the fingerprint VALUE with a document-frequency cap
  * (`maxDf`) exactly like [[HybridSearch]]'s posting cap: boilerplate
  * fingerprints shared by more than `maxDf` docs generate no candidates,
  * bounding per-key fanout at any corpus size; no stage is all-pairs.
  *
  * Reference scope: the reference dedups by exact content id only; this is
  * the sub-document overlap detector of the dedup family, the
  * positional sibling of [[Dedup.minhashLshJoin]] (whole-doc similarity)
  * and [[SpanDedup]] (exact duplicated spans).
  */
object Winnow {

  /** 2³² — position packing shift for the (hash, rightmost-pos) argmin. */
  val PosShift: Long = 1L << 32

  /** Distinct winnowed fingerprints: (idCol, fp_pos, fp_hash), `fp_pos`
    * the selected k-gram's 1-based start position. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    require(w >= 2, s"Winnow: window w=$w must be >= 2")
    val pg = SpanDedup.gramPositions(df, idCol, textCol, k)
    val byDoc = Window.partitionBy(idCol)
    val frame = Window.partitionBy(idCol).orderBy("__pos").rowsBetween(0, w - 1)
    pg.select(col(idCol), col("__pos"),
        (col("__gh") * PosShift + (lit(PosShift - 1L) - col("__pos")))
          .as("__key"))
      .select(col(idCol), col("__pos"),
        min(col("__key")).over(frame).as("__mk"),
        count(lit(1)).over(byDoc).as("__n"))
      // valid window starts only: 1..n−w+1, or the single partial window
      // at pos 1 when the doc has fewer than w grams
      .filter(col("__pos") <= greatest(lit(1L), col("__n") - (w - 1)))
      .select(col(idCol),
        (lit(PosShift - 1L) - col("__mk").bitwiseAND(lit(PosShift - 1L)))
          .as("fp_pos"),
        shiftright(col("__mk"), 32).as("fp_hash"))
      .distinct()
  }

  /** MOSS pair census: document pairs (a_id < b_id) sharing ≥ `minShared`
    * distinct fingerprint VALUES, with the shared count. Fingerprints
    * whose document frequency exceeds `maxDf` (boilerplate) are dropped
    * before pairing — the bounded-fanout lever at corpus scale. */
  def sharedFingerprintPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, minShared: Int, maxDf: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"Winnow: need minShared>=1, maxDf>=2; got $minShared, $maxDf")
    val fp = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), col("fp_hash")).distinct()
    val kept = fp.withColumn("__df", count(lit(1)).over(
        Window.partitionBy("fp_hash")))
      .filter(col("__df") <= maxDf).drop("__df")
    kept.select(col(idCol).as("a_id"), col("fp_hash"))
      .join(kept.select(col(idCol).as("b_id"), col("fp_hash")), "fp_hash")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
