package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Content-defined chunking (CDC) — the storage-dedup decomposition (LBFS,
  * Muthitacharoen et al. SOSP'01; the rolling-hash boundary idea behind
  * every dedup filesystem and chunk-store). Documents are split at
  * content-determined positions (a token whose portable hash ≡ 0 mod the
  * modulus ends a chunk), so an insertion or deletion only reshapes the
  * chunks it touches — unlike fixed-width blocks, where one shifted token
  * re-writes every downstream block. Duplicate chunks across the corpus
  * then collapse to one stored copy.
  *
  * Scale shape: one explode + per-document windows (bounded by document
  * length, never corpus size — the SpanDedup argument) + keyed aggregation
  * on (doc, chunk). Chunk identity is the same portable md5 the dedup
  * family keys on, so the corpus-level census is a plain hash groupBy —
  * no pairwise comparison anywhere.
  */
object Cdc {

  /** Expected chunk length in tokens (boundary probability 1/modulus). */
  val DefaultModulus = 16

  /** One row per (document, chunk): ordinal chunk index, token count, and
    * the chunk's content hash. Boundary rule: a token whose
    * [[TextFunctions.tokenHash]] ≡ 0 (mod `modulus`) is the LAST token of
    * its chunk. */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      modulus: Int = DefaultModulus): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val isBreak = when(
      TextFunctions.tokenHash(col("__tok")) % lit(modulus.toLong) === 0L, 1L)
      .otherwise(0L)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("__brk", isBreak)
      // chunk of a token = breaks strictly before it
      .withColumn("chunk_idx", (sum(col("__brk")).over(w) - col("__brk")))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")))).as("chunk_hash"))
  }

  /** Per-document chunk summary: chunk count and an order-sensitive digest
    * of the chunk-hash sequence (pins both the boundaries and the
    * contents). */
  def perDoc(chunked: DataFrame, idCol: String): DataFrame =
    chunked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        md5(concat_ws("",
          transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_hash")))),
            s => s.getField("chunk_hash")))).as("chunks_hash"))

  /** Corpus-level storage census: total vs distinct chunks, tokens that
    * collapse as duplicate chunk copies, and the exact dedup ratio in
    * micro-units. One hash groupBy over the chunk table. */
  def stats(chunked: DataFrame): DataFrame = {
    val perHash = chunked.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("__cnt"), min(col("n_tokens")).as("__nt"))
    perHash.agg(
        sum(col("__cnt")).cast("long").as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum((col("__cnt") - 1L) * col("__nt")).cast("long").as("dup_tokens"),
        sum(col("__cnt") * col("__nt")).cast("long").as("total_tokens"))
      .withColumn("dedup_ratio_e6",
        graft.functions.ExactRound.roundDiv(
          col("dup_tokens") * lit(1000000L), col("total_tokens")))
  }
}
