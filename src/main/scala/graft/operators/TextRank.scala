package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank
  * over the word co-occurrence graph — words are nodes, an undirected
  * edge links every pair of words appearing within `window` positions of
  * each other in some document, and the stationary walk score ranks
  * keywords corpus-wide.
  *
  * Edge construction is per-document ARRAY work (shifted-slice zips), so
  * the only shuffle is the final pair `distinct` — no join, no explode
  * of a cross product; at 100 TB the pair stream is |tokens|·window rows
  * keyed by the pair, exactly as partition-parallel as the token stream
  * itself. The walk reuses [[PageRank.pagerank]]'s e9 integer fixed
  * point, so scores are exact integers and the top-k is engine- and
  * order-independent; the DuckDB mirror replays edges via a positional
  * self-join and the shared [[PageRank.pagerankRoundsSql]] rounds.
  */
object TextRank {

  /** Symmetric distinct co-occurrence edges (src, dst) over
    * [[graft.functions.TextFunctions.tokens]] of `textCol`. */
  def cooccurrenceEdges(docs: DataFrame, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"TextRank: window must be >= 1, got $window")
    val und = docs
      .select(graft.functions.TextFunctions.tokens(col(textCol)).as("__t"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, $window), d ->
           |  zip_with(slice(__t, 1, greatest(size(__t) - d, 0)),
           |           slice(__t, d + 1, greatest(size(__t) - d, 0)),
           |           (a, b) -> struct(least(a, b) AS src, greatest(a, b) AS dst))))"""
          .stripMargin)).as("__p"))
      .select(col("__p.src"), col("__p.dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Top-`topK` keywords by walk score: (word, pr_e9), ties by word. */
  def keywords(docs: DataFrame, textCol: String, window: Int, iters: Int,
      topK: Int): DataFrame =
    PageRank.pagerank(cooccurrenceEdges(docs, textCol, window), iters)
      .orderBy(col("pr_e9").desc, col("id"))
      .limit(topK)
      .select(col("id").as("word"), col("pr_e9"))

  /** DuckDB mirror of [[cooccurrenceEdges]]: requires `tokd(doc_id,
    * toks)` ([[graft.queries.DocSql.toksCte]]); ends in `e(src, dst)`. */
  def cooccurrenceEdgesSql(window: Int): String =
    s"""tp AS (SELECT doc_id, unnest(toks) AS tok,
       |    unnest(generate_series(1, len(toks))) AS pos FROM tokd),
       |und AS (SELECT DISTINCT least(a.tok, b.tok) AS src,
       |    greatest(a.tok, b.tok) AS dst
       |  FROM tp a JOIN tp b ON a.doc_id = b.doc_id
       |    AND b.pos > a.pos AND b.pos <= a.pos + $window
       |    AND a.tok <> b.tok),
       |e AS (SELECT src, dst FROM und UNION SELECT dst, src FROM und)""".stripMargin
}
