package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound
import graft.functions.VectorFunctions.cosineSimilarity

/** ANN-quality evaluation operators (SURVEY.md §2.5 J4/J5, §2.6 A1-A3).
  *
  * The reference evaluates each backend's top-k against a brute-force oracle
  * with (a) a membership/recall check and (b) the mean cosine similarity of
  * returned vectors vs the oracle's best vector
  * (`skills_for_jobs.py:199-211` and per-backend clones). Its membership
  * check is actually broken — `value in job_skills_best[key]` tests a string
  * against a list of tuples and is always False (SURVEY.md §2.5 J4); we
  * implement the *intended* recall@k overlap semantics.
  */
object Eval {

  /** J4 + A3 — per-query overlap of `ann`'s ids with `oracle`'s ids.
    * Output: (queryIdCol, n_matches long, recall double∈[0,1] rounded 6).
    * Queries come from the oracle side; an ANN result with zero overlap
    * still yields a row with n_matches = 0. */
  def recallAtK(ann: DataFrame, oracle: DataFrame,
      queryIdCol: String, idCol: String): DataFrame = {
    val matches = ann.join(oracle, Seq(queryIdCol, idCol), "left_semi")
      .groupBy(queryIdCol).agg(count(lit(1)).as("__n"))
    val totals = oracle.groupBy(queryIdCol).agg(count(lit(1)).as("__total"))
    totals.join(matches, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        coalesce(col("__n"), lit(0L)).as("n_matches"),
        ExactRound.ratioRound6PosLong(coalesce(col("__n"), lit(0L)), col("__total"))
          .as("recall"))
  }

  /** Order-independent mean of a (bounded-magnitude) double column: each row
    * is prescaled to an integer with `floor(x·10⁶ + 0.5)` (one IEEE multiply
    * + exact floor — identical on any engine, even off the decimal grid,
    * unlike a double→DECIMAL cast whose tie rule is per-engine), summed
    * exactly in decimal(38,0), then divided in integer space
    * ([[graft.functions.ExactRound]]) — a plain double `avg` sums in
    * partition order, and `round(<double quotient>, 6)` resolves near-tie
    * means differently per engine (CORRECTNESS_r05: the mean-pin hash
    * fails). */
  private def exactAvg(c: Column): Column =
    ExactRound.ratioRound6Int(
      sum(ExactRound.e6(c).cast("decimal(38,0)")), 6, count(lit(1)))

  /** A1/A3 — collapse [[recallAtK]] output to the reference's headline
    * numbers: avg matches per query and mean recall. */
  def recallSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      exactAvg(col("n_matches")).as("avg_matches"),
      exactAvg(col("recall")).as("avg_recall"),
      count(lit(1)).as("n_queries"))

  /** J5 + A2 — mean cosine similarity of each hit's vector against the
    * oracle's rank-1 ("best") vector for that query
    * (`skills_for_jobs.py:204,211`; best vector from `:385-386`).
    * `hits` must carry (queryIdCol, vecCol); `oracleBest` one row per query
    * with (queryIdCol, vecCol). Output: (queryIdCol, avg_sim rounded 6). */
  def bestVectorSimilarity(hits: DataFrame, oracleBest: DataFrame,
      queryIdCol: String, vecCol: String): DataFrame = {
    val best = broadcast(oracleBest.select(col(queryIdCol), col(vecCol).as("__bvec")))
    hits.select(col(queryIdCol), col(vecCol).as("__hvec"))
      .join(best, Seq(queryIdCol))
      .groupBy(queryIdCol)
      .agg(round(avg(cosineSimilarity(col("__hvec"), col("__bvec"))), 6).as("avg_sim"))
  }

  /** A2 second level — average of the per-query averages. */
  def similaritySummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(exactAvg(col("avg_sim")).as("avg_avg_sim"),
      count(lit(1)).as("n_queries"))

  // ---- Ranking metrics (MRR / nDCG@k) --------------------------------------

  /** DCG position weights 1/log2(r+1) for ranks 1..k as exact 10-decimal
    * strings. Both engines look up the SAME literals (Spark via a decimal
    * array, DuckDB via a list literal), so the per-query DCG sum is exact
    * and order-independent — summing the transcendental directly would tie
    * oracle parity to last-ulp log2 agreement across libm builds. */
  def dcgWeightStrings(k: Int): Seq[String] =
    (1 to k).map(r => BigDecimal(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toString)

  /** Reciprocal-rank weights 1/r for ranks 1..k, same 10-decimal contract. */
  def rrWeightStrings(k: Int): Seq[String] =
    (1 to k).map(r => (BigDecimal(1).setScale(12) / BigDecimal(r))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toString)

  /** Ideal DCG for a query with k relevant results: the first-k weight sum
    * (exact decimal string — the oracle embeds the same literal). */
  def idcgString(k: Int): String =
    dcgWeightStrings(k).map(BigDecimal(_)).sum.toString

  /** Per-query ranking quality of `ann` against `oracle`'s top-k (binary
    * relevance: a hit is relevant iff the oracle also returned it). `ann`
    * must carry a 1-based `rank` column ≤ k. Output per oracle query:
    * (queryIdCol, n_hits, first_rank [0 = no relevant hit], rr, ndcg) —
    * MRR/nDCG@k are the standard retrieval-eval headline numbers
    * (Järvelin & Kekäläinen, TOIS 2002) and the reference's recall check's
    * natural rank-sensitive siblings. One semi-join + one agg join: at scale
    * both sides are |Q|·k rows, shuffled on the query id only. */
  def rankMetrics(ann: DataFrame, oracle: DataFrame,
      queryIdCol: String, idCol: String, k: Int): DataFrame = {
    val dcgArr = array(dcgWeightStrings(k).map(w => lit(BigDecimal(w))): _*)
    // Weight lookup for the POST-join side: index with coalesce(fr,0)+1 into
    // a 0-prepended table, never with the raw nullable column —
    // element_at(arr, <null index from an outer join>) miscompiles to an
    // end-relative read (observed: returns arr[-1], not NULL), while a plain
    // coalesce on the same slot is fine.
    val rrArr0 = array((BigDecimal(0).setScale(10).toString +: rrWeightStrings(k))
      .map(w => lit(BigDecimal(w))): _*)
    val hits = ann.join(oracle, Seq(queryIdCol, idCol), "left_semi")
    val per = hits.groupBy(queryIdCol).agg(
      count(lit(1)).as("__n"),
      min(col("rank")).as("__fr"),
      sum(element_at(dcgArr, col("rank").cast("int"))).as("__dcg"))
    val fr0 = coalesce(col("__fr"), lit(0L)).cast("int")
    oracle.select(col(queryIdCol)).distinct()
      .join(per, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        coalesce(col("__n"), lit(0L)).as("n_hits"),
        fr0.cast("long").as("first_rank"),
        // Both pins are rational (exact-decimal weight / exact-decimal idcg),
        // so ties at digit 7 are live — round them in integer space.
        ExactRound.decRound(element_at(rrArr0, fr0 + lit(1)), 10, 6).as("rr"),
        ExactRound.ratioRound(
          coalesce(col("__dcg"), lit(BigDecimal(0).setScale(10))), 10,
          lit(BigDecimal(idcgString(k))), 10, 6).as("ndcg"))
  }

  /** Headline MRR / mean nDCG over [[rankMetrics]] output. */
  def rankSummary(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      exactAvg(col("rr")).as("mrr"),
      exactAvg(col("ndcg")).as("avg_ndcg"),
      count(lit(1)).as("n_queries"))
}
