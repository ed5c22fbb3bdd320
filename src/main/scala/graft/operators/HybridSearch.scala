package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Hybrid retrieval: fuse a dense (vector) ranking with a lexical ranking
  * by reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009 —
  * the fusion every hybrid vector-store API ships because it needs no score
  * calibration between the two systems, only ranks).
  *
  * Scale shape: each leg is already bounded (top-k per query); the fusion
  * is a full-outer join of two |Q|·k lists and a per-query window — costs
  * nothing next to the legs. The lexical leg is an inverted-index join
  * (token-hash equi-join, keyed shuffle); at corpus scale its production
  * lever is `maxDf` — dropping stopword-frequency tokens from the index.
  * A token in half the corpus contributes |Q|·|corpus|/2 join rows and no
  * ranking signal; the cap bounds every posting list, and the count window
  * rides the exchange the join needs anyway (same discipline as
  * Salt.capBuckets).
  */
object HybridSearch {

  /** Lexical top-k per query by DISTINCT-token overlap (ties → lowest id):
    * (queryIdCol, idCol, rank, overlap). Queries with zero shared tokens
    * return no rows — the inverted-index contract. `maxDf` drops corpus
    * tokens with document frequency above it from the index (the stopword
    * lever); the default keeps every token. */
  def lexicalTopK(queries: DataFrame, queryIdCol: String, queryTextCol: String,
      corpus: DataFrame, idCol: String, textCol: String, k: Int,
      maxDf: Int = Int.MaxValue): DataFrame = {
    def toks(df: DataFrame, id: String, text: String) =
      df.select(col(id),
        explode(transform(TextFunctions.tokens(col(text)),
          TextFunctions.tokenHash(_))).as("__h"))
        .distinct()
    val postings = toks(corpus, idCol, textCol)
    val index =
      if (maxDf == Int.MaxValue) postings
      else Salt.capBuckets(postings, Seq("__h"), maxDf.toLong)
    val overlap = toks(queries, queryIdCol, queryTextCol)
      .join(index, "__h")
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("overlap").desc, col(idCol))
    overlap.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** RRF fusion of two ranked lists (queryIdCol, idCol, rank): score =
    * Σ 1/(rrfK + rank) over the lists a hit appears in, re-ranked to `k`
    * (ties → lowest id). Output: (queryIdCol, idCol, rank, rrf_score
    * rounded 6). */
  def fuse(a: DataFrame, b: DataFrame, queryIdCol: String, idCol: String,
      k: Int, rrfK: Int = 60): DataFrame = {
    val aa = a.select(col(queryIdCol), col(idCol), col("rank").as("__ra"))
    val bb = b.select(col(queryIdCol), col(idCol), col("rank").as("__rb"))
    val scored = aa.join(bb, Seq(queryIdCol, idCol), "full_outer")
      .withColumn("__score",
        coalesce(lit(1.0d) / (lit(rrfK.toLong) + col("__ra")), lit(0.0d)) +
        coalesce(lit(1.0d) / (lit(rrfK.toLong) + col("__rb")), lit(0.0d)))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"),
        round(col("__score"), 6).as("rrf_score"))
  }
}
