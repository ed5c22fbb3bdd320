package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-sequence assembly (BASELINE.json north star adjacency): the two
  * steps between a cleaned corpus and a tokenized training run — slicing
  * long documents into model-context windows (chunk-then-embed pipelines do
  * the same before [[Embedder]]), and packing documents into fixed
  * token-budget shards.
  *
  * Both are pure column plans over the shared [[TextFunctions.tokens]]
  * stream, so they replay exactly in the DuckDB oracle.
  */
object Sequencer {

  /** Overlapping token windows per document: window starts at token
    * positions 1, 1+stride, 1+2·stride, … ≤ n, each `window` tokens long
    * (the final windows may be shorter). Output: (idCol, chunk_idx,
    * n_chunk_tokens, chunk_hash) — the hash stands in for the chunk text so
    * the output stays narrow while still pinning content. Token-less docs
    * produce no chunks. One Generate over a per-row `sequence()` — no
    * shuffle, no UDF; linear in total tokens. */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0,
      s"window $window / stride $stride must be positive")
    // Tokens materialize as a column first: HOF lambdas don't CSE (see
    // Dedup.shingles), and slice() below reads the array many times.
    val withToks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val starts = when(size(toks) >= 1,
      sequence(lit(1), size(toks), lit(stride)))
      .otherwise(array().cast("array<int>"))
    withToks.select(col(idCol), toks, explode(starts).as("__start"))
      .select(col(idCol),
        ((col("__start") - 1) / stride).cast("long").as("chunk_idx"),
        size(slice(toks, col("__start"), lit(window))).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(toks, col("__start"), lit(window)))).as("chunk_hash"))
  }

  /** Pack rows into fixed token-budget shards, group-parallel: rows are
    * distributed into `groups` deterministic buckets (id mod groups — real
    * pipelines pack per output shard-group anyway), and WITHIN a group each
    * row's shard index is ⌊(tokens before it, in id order) / budget⌋ — the
    * streaming first-fit a sequential packer produces, up to one straddling
    * document per boundary. The window partitions by group, so the sort is
    * per-group (shuffle keyed on group, never a global single-partition
    * sort) and groups pack in parallel — at 100 TB `groups` scales with the
    * cluster while each group's window stays partition-local.
    * Input must carry a token-count column; output: (idCol, grp, nTokCol,
    * shard_idx). */
  def packTokenShards(df: DataFrame, idCol: String, nTokCol: String,
      groups: Int, budgetTokens: Long): DataFrame = {
    require(groups > 0 && budgetTokens > 0,
      s"groups $groups / budgetTokens $budgetTokens must be positive")
    val grp = (col(idCol) % groups).as("grp")
    val w = Window.partitionBy(col("grp")).orderBy(col(idCol))
    df.select(col(idCol), grp, col(nTokCol))
      .withColumn("__before",
        coalesce(sum(col(nTokCol)).over(w) - col(nTokCol), lit(0L)))
      .select(col(idCol), col("grp"), col(nTokCol),
        floor(col("__before") / budgetTokens).cast("long").as("shard_idx"))
  }

  /** Token count column used by the packing query (whitespace tokens —
    * [[TextFunctions.tokens]]); exposed so query and oracle agree on the
    * exact count. */
  def tokenCount(textCol: Column): Column =
    size(TextFunctions.tokens(textCol)).cast("long")
}
