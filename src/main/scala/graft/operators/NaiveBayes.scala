package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Multinomial Naive Bayes text classifier — fit and applied as keyed
  * aggregations, no driver-side training loop.
  *
  * This is the engine's stand-in for the linear quality classifier the
  * LLM-data literature trains to score crawl documents against a trusted
  * seed corpus (GPT-3's WebText-vs-CommonCrawl logistic filter, CCNet's
  * fastText step): per-token Laplace-smoothed log-odds
  *
  *   w(t) = ln((n⁺(t)+1)/(T⁺+V)) − ln((n⁻(t)+1)/(T⁻+V))
  *
  * plus a document prior ln(N⁺/N⁻); a document's score is the prior plus
  * the sum of w(t) over its token OCCURRENCES — exactly the multinomial NB
  * log-likelihood ratio, and the same shape as an inference pass of any
  * linear bag-of-words model. Weights are e8-scaled integers the moment
  * they leave the ln, so document scores are exact integer sums:
  * partition-order-proof and DuckDB-replayable.
  *
  * Scale: the model is O(V) rows (one per distinct token), built in one
  * keyed aggregation over the tagged token stream; scoring is one join of
  * the token stream against the model (broadcast when V is small, shuffle
  * hash otherwise) and one per-doc sum. No global state beyond the model.
  */
object NaiveBayes {

  /** Per-token e8 log-odds from a tagged token stream `tok(gp, t)`
    * (gp = true for the positive/seed class). Output: (t, w8) + the
    * broadcast totals it was fit against. */
  def fit(tok: DataFrame): DataFrame = {
    val cnt = tok.groupBy("t").agg(
      sum(when(col("gp"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("gp"), 1L).otherwise(0L)).as("nn"))
    val tot = cnt.agg(sum(col("np")).cast("long").as("tp"),
      sum(col("nn")).cast("long").as("tn"), count(lit(1)).as("v"))
    val a = log((col("np") + 1L).cast("double") /
      (col("tp") + col("v")).cast("double"))
    val b = log((col("nn") + 1L).cast("double") /
      (col("tn") + col("v")).cast("double"))
    cnt.crossJoin(broadcast(tot))
      .select(col("t"), ExactRound.eScaled(a - b, 8).cast("long").as("w8"))
  }

  /** e8 class prior ln(N⁺/N⁻) from per-doc flags `docs(gp)` — 1 row. */
  def priorE8(docs: DataFrame): DataFrame =
    docs.agg(
      sum(when(col("gp"), 1L).otherwise(0L)).as("__cp"),
      sum(when(!col("gp"), 1L).otherwise(0L)).as("__cn"))
      .select(ExactRound.eScaled(
        log(col("__cp").cast("double") / col("__cn").cast("double")), 8)
        .cast("long").as("prior8"))

  /** Score every document: prior + Σ w(token occurrence). `docs` must have
    * (idCol, gp); `tok` must have (idCol, gp, t) — the same tagged stream
    * [[fit]] consumed. Output: (idCol, n_tokens, score_e8, pred_pos). */
  def scoreDocs(docs: DataFrame, idCol: String, tok: DataFrame): DataFrame = {
    val model = fit(tok.select(col("gp"), col("t")))
    val perDoc = tok.join(model, "t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nt"), sum(col("w8")).as("__sw"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(priorE8(docs.select(col("gp")))))
      .select(col(idCol),
        coalesce(col("__nt"), lit(0L)).as("n_tokens"),
        (col("prior8") + coalesce(col("__sw"), lit(0L))).cast("long")
          .as("score_e8"))
      .withColumn("pred_pos", col("score_e8") > 0L)
  }

  // ---- DuckDB twins ---------------------------------------------------------

  /** Model CTEs over a `tok(doc_id, gp, t)` relation: ends in
    * mdl(t, w8) and pri(prior8); `docsRel` must expose (doc_id, gp) one
    * row per document. */
  def modelCtes(docsRel: String): String = {
    val aSql = "ln(CAST((np + 1) AS DOUBLE) / CAST((tp + v) AS DOUBLE))"
    val bSql = "ln(CAST((nn + 1) AS DOUBLE) / CAST((tn + v) AS DOUBLE))"
    s"""ncnt AS (SELECT t,
       |    CAST(sum(CASE WHEN gp THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(sum(CASE WHEN NOT gp THEN 1 ELSE 0 END) AS BIGINT) AS nn
       |  FROM tok GROUP BY 1),
       |ntot AS (SELECT CAST(sum(np) AS BIGINT) AS tp,
       |    CAST(sum(nn) AS BIGINT) AS tn, count(*) AS v FROM ncnt),
       |mdl AS (SELECT t, ${ExactRound.eScaledSql(s"$aSql - $bSql", 8)} AS w8
       |  FROM ncnt CROSS JOIN ntot),
       |pri AS (SELECT ${ExactRound.eScaledSql(
      "ln(CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))", 8)} AS prior8
       |  FROM (SELECT CAST(sum(CASE WHEN gp THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |      CAST(sum(CASE WHEN NOT gp THEN 1 ELSE 0 END) AS BIGINT) AS cn
       |    FROM $docsRel))""".stripMargin
  }

  /** Scoring tail: requires [[modelCtes]] + the same `tok` relation +
    * `docsRel(doc_id)`. */
  def scoreSql(docsRel: String): String =
    s"$perdocCte\n${scoreSelect(docsRel)}"

  /** [[scoreSql]] packaged as CTEs instead of a final select: ends in
    * `outCte(doc_id, n_tokens, score_e8, pred_pos)` — for oracles that
    * post-process the scores (threshold calibration). ONE shared select
    * body, so the two forms can't drift. */
  def scoreCtesSql(docsRel: String, outCte: String): String =
    s"$perdocCte,\n$outCte AS (${scoreSelect(docsRel)})"

  private val perdocCte: String =
    """perdoc AS (SELECT doc_id, count(*) AS nt,
      |    CAST(sum(w8) AS BIGINT) AS sw
      |  FROM tok JOIN mdl USING (t) GROUP BY 1)""".stripMargin

  private def scoreSelect(docsRel: String): String =
    s"""SELECT d.doc_id,
       |  CAST(coalesce(perdoc.nt, 0) AS BIGINT) AS n_tokens,
       |  CAST(pri.prior8 + coalesce(perdoc.sw, 0) AS BIGINT) AS score_e8,
       |  (pri.prior8 + coalesce(perdoc.sw, 0)) > 0 AS pred_pos
       |FROM $docsRel d LEFT JOIN perdoc USING (doc_id) CROSS JOIN pri""".stripMargin
}
