package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound
import graft.functions.VectorFunctions.Cosine
import graft.operators.{Eval, KnnJoin, Report}
import Fixtures.{K, qCte, cCte}

/** ANN-quality evaluation + reporting queries (SURVEY.md §2.5 J4/J5,
  * §2.6 A1-A3, §2.11 R1). The reference's eval compares each ANN backend's
  * top-k against the exact-NN oracle; here the deterministic stand-in for
  * "an ANN backend" is cosine retrieval over the first 32 of 64 dimensions —
  * a real dimensionality-truncation approximation (recall@10 ≈ 0.38 on the
  * fixture) whose disagreement with the full-dimension oracle the DuckDB
  * oracle can replay exactly.
  */
object EvalQueries extends graft.QueryModule {

  private val HalfDim = 32 // ANN stand-in: rank over the leading half of the 64 dims
  private val Boot = 100 // bootstrap resamples for the recall CI
  private val BootLoRank = 3 // order-statistic CI bounds over the sorted
  private val BootHiRank = 98 // bootstrap means: the central 96% of B=100

  private def tops(s: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val (q, c) = Fixtures.split(s, dir)
    // Both top-k frames (≤ |Q|·K rows each) are KEYED memos: every eval
    // query reads them twice (hits + best / matches + denominator), and
    // the bounded-heap UDAF embeds a fresh instance per call, so plan
    // equality could not share them across queries — the keyed registry
    // does, and Caches.clear() releases them when the run ends. The exact
    // frame is the board-wide shared oracle ranking (Fixtures.exactTopK).
    val cosTop = Fixtures.exactTopK(s, dir)
    val annTop = graft.Caches.memo(s, s"exact:ann$HalfDim:$dir") {
      val qh = q.select(col("job_id"), slice(col("qvec"), 1, HalfDim).as("qvec"))
      val ch = c.select(col("skill_id"), slice(col("svec"), 1, HalfDim).as("svec"))
      KnnJoin.exact(qh, "job_id", "qvec", ch, "skill_id", "svec", K, Cosine)
    }
    (cosTop, annTop, c)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J4 + A3 — per-query recall of the truncated-dim ANN retrieval vs the exact oracle.
    "eval_ann_recall" -> ((s, dir) => {
      val (cosTop, annTop, _) = tops(s, dir)
      Eval.recallAtK(annTop, cosTop, "job_id", "skill_id")
    }),
    // A1 — headline averages over the per-query recalls.
    "eval_recall_summary" -> ((s, dir) => {
      val (cosTop, annTop, _) = tops(s, dir)
      Eval.recallSummary(Eval.recallAtK(annTop, cosTop, "job_id", "skill_id"))
    }),
    // J5 + A2 — per-query mean cosine similarity of hits vs the oracle's
    // best (rank-1) vector.
    "eval_best_sim" -> ((s, dir) => {
      val (cosTop, annTop, c) = tops(s, dir)
      val vecs = c.select(col("skill_id"), col("svec"))
      val hits = annTop.join(vecs, "skill_id")
      val best = cosTop.filter(col("rank") === 1).join(vecs, "skill_id")
        .select(col("job_id"), col("svec"))
      Eval.bestVectorSimilarity(hits, best, "job_id", "svec")
    }),
    // A2 second level — average of the per-query averages.
    "eval_best_sim_summary" -> ((s, dir) => {
      val (cosTop, annTop, c) = tops(s, dir)
      val vecs = c.select(col("skill_id"), col("svec"))
      val hits = annTop.join(vecs, "skill_id")
      val best = cosTop.filter(col("rank") === 1).join(vecs, "skill_id")
        .select(col("job_id"), col("svec"))
      Eval.similaritySummary(
        Eval.bestVectorSimilarity(hits, best, "job_id", "svec"))
    }),
    // MRR / nDCG@k — the rank-sensitive siblings of the recall check, over
    // the same truncated-dim ANN vs exact-oracle pairing.
    "eval_rank_metrics" -> ((s, dir) => {
      val (cosTop, annTop, _) = tops(s, dir)
      Eval.rankMetrics(annTop, cosTop, "job_id", "skill_id", K)
    }),
    "eval_rank_summary" -> ((s, dir) => {
      val (cosTop, annTop, _) = tops(s, dir)
      Eval.rankSummary(Eval.rankMetrics(annTop, cosTop, "job_id", "skill_id", K))
    }),
    // Percentile-bootstrap confidence interval on the recall headline —
    // the error bar a 20-query fixture needs before anyone compares two
    // ANN tiers on it. RNG-free: resample b draws query slot
    // md5("boot<b>:<i>") mod NQ (the engine's standard deterministic
    // "random", so DuckDB replays every draw), each bootstrap mean is an
    // exact integer rational, and the CI bounds are order statistics
    // (ranks 3 and 98 of the 100 sorted means — the central 96%) rather
    // than interpolated quantiles. Everything hash-gates.
    "eval_recall_bootstrap" -> ((s, dir) => {
      val (cosTop, annTop, _) = tops(s, dir)
      val perq = Eval.recallAtK(annTop, cosTop, "job_id", "skill_id")
      val NQ = Fixtures.NQ
      val wq = org.apache.spark.sql.expressions.Window.orderBy("job_id")
      val ranked = perq.select(col("job_id"), col("n_matches"))
        .withColumn("__rn", row_number().over(wq).cast("long") - 1L)
      val draws = s.range(Boot).select(col("id").as("__b"))
        .crossJoin(s.range(NQ).select(col("id").as("__i")))
        .select(col("__b"), pmod(graft.functions.TextFunctions.tokenHash(
          concat(lit("boot"), col("__b").cast("string"), lit(":"),
            col("__i").cast("string"))), lit(NQ.toLong)).as("__pick"))
      val means = draws.join(ranked, col("__pick") === col("__rn"))
        .groupBy("__b")
        .agg(ExactRound.roundDiv(sum(col("n_matches")) * lit(1000000L),
          lit((NQ * K).toLong)).as("__m"))
      val wr = org.apache.spark.sql.expressions.Window
        .orderBy(col("__m"), col("__b"))
      val rankedMeans = means.withColumn("__r", row_number().over(wr))
      val lo = rankedMeans.filter(col("__r") === BootLoRank)
        .select(col("__m").as("ci_lo_e6"))
      val hi = rankedMeans.filter(col("__r") === BootHiRank)
        .select(col("__m").as("ci_hi_e6"))
      val overall = perq.agg(ExactRound.roundDiv(
        sum(col("n_matches")) * lit(1000000L),
        count(lit(1)) * lit(K.toLong)).as("mean_recall_e6"))
      overall.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
        .select(lit(Boot.toLong).as("n_boot"), col("mean_recall_e6"),
          col("ci_lo_e6"), col("ci_hi_e6"))
    }),
    // R1 — the reference's wide per-job report over the deduped top-k.
    "report_job_skills_pivot" -> ((s, dir) => {
      val (q, c) = Fixtures.split(s, dir)
      val ranked = KnnJoin.exactDedupByKey(
        q, "job_id", "qvec", c, "skill_id", "svec", "label", K, Cosine)
      Report.pivotTopK(ranked, "job_id", "rank", K,
        Seq("skill_id" -> "skill", "label" -> "level"))
    }))

  // Shared oracle CTE chain: both metric rankings over the fixture split.
  private val ranksCte =
    s"""$qCte, $cCte,
       |cosd AS (SELECT job_id, skill_id,
       |    1.0 - list_cosine_similarity(qvec, svec) AS dist FROM q CROSS JOIN c),
       |cosr AS (SELECT job_id, skill_id, rank FROM (
       |    SELECT job_id, skill_id,
       |      row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS rank
       |    FROM cosd) WHERE rank <= $K),
       |annd AS (SELECT job_id, skill_id,
       |    1.0 - list_cosine_similarity(qvec[1:$HalfDim], svec[1:$HalfDim]) AS dist
       |    FROM q CROSS JOIN c),
       |annr AS (SELECT job_id, skill_id, rank FROM (
       |    SELECT job_id, skill_id,
       |      row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS rank
       |    FROM annd) WHERE rank <= $K)""".stripMargin

  private val recallCte =
    s"""$ranksCte,
       |m AS (SELECT a.job_id, count(*) AS n FROM annr a
       |    JOIN cosr o ON a.job_id = o.job_id AND a.skill_id = o.skill_id
       |    GROUP BY a.job_id),
       |perq AS (SELECT q2.job_id,
       |    CAST(coalesce(m.n, 0) AS BIGINT) AS n_matches,
       |    ${ExactRound.ratioRound6IntSql("coalesce(m.n, 0)", 0, s"$K")} AS recall
       |  FROM (SELECT DISTINCT job_id FROM cosr) q2 LEFT JOIN m USING (job_id))""".stripMargin

  private val bestSimCte =
    s"""$ranksCte,
       |hv AS (SELECT h.job_id, c.svec FROM annr h JOIN c USING (skill_id)),
       |best AS (SELECT r.job_id, c.svec AS bvec
       |    FROM (SELECT job_id, skill_id FROM cosr WHERE rank = 1) r
       |    JOIN c USING (skill_id)),
       |perq AS (SELECT hv.job_id,
       |    round(avg(list_cosine_similarity(hv.svec, b.bvec)), 6) AS avg_sim
       |  FROM hv JOIN best b ON hv.job_id = b.job_id GROUP BY hv.job_id)""".stripMargin

  // Rank-metric weight literals — the SAME scale-10 weights the Spark side
  // embeds (Eval.dcgWeightStrings/rrWeightStrings), here pre-scaled to e10
  // BIGINT integers so the oracle's weight sums and ratio roundings stay in
  // pure integer arithmetic (no decimal typing surface).
  private def e10(w: String): String =
    (BigDecimal(w) * BigDecimal(10).pow(10)).toBigIntExact.get.toString
  private val dcgE10List = Eval.dcgWeightStrings(K)
    .map(w => s"CAST(${e10(w)} AS BIGINT)").mkString("[", ", ", "]")
  private val rrE10List = Eval.rrWeightStrings(K)
    .map(w => s"CAST(${e10(w)} AS BIGINT)").mkString("[", ", ", "]")
  private val idcgE10 = e10(Eval.idcgString(K))

  private val rankMetricsCte =
    s"""$ranksCte,
       |h AS (SELECT a.job_id, a.rank FROM annr a
       |    JOIN cosr o ON a.job_id = o.job_id AND a.skill_id = o.skill_id),
       |m AS (SELECT job_id, count(*) AS n, min(rank) AS fr,
       |    sum(($dcgE10List)[rank]) AS dcg FROM h GROUP BY job_id),
       |perq AS (SELECT q2.job_id,
       |    CAST(coalesce(m.n, 0) AS BIGINT) AS n_hits,
       |    CAST(coalesce(m.fr, 0) AS BIGINT) AS first_rank,
       |    ${ExactRound.ratioRoundIntSql(s"coalesce(($rrE10List)[m.fr], 0)", 10, "1", 0, 6)} AS rr,
       |    ${ExactRound.ratioRoundIntSql("coalesce(m.dcg, 0)", 10, idcgE10, 10, 6)} AS ndcg
       |  FROM (SELECT DISTINCT job_id FROM cosr) q2 LEFT JOIN m USING (job_id))""".stripMargin

  private val pivotCols = (0 until K).map { i =>
    s"""  max(CASE WHEN rank = ${i + 1} THEN skill_id END) AS skill$i,
       |  max(CASE WHEN rank = ${i + 1} THEN label END) AS level$i""".stripMargin
  }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "eval_ann_recall" ->
      s"WITH $recallCte\nSELECT job_id, n_matches, recall FROM perq",
    "eval_recall_summary" ->
      s"""WITH $recallCte
         |SELECT ${ExactRound.ratioRound6IntSql(s"sum(${ExactRound.e6Sql("n_matches")})", 6, "count(*)")} AS avg_matches,
         |  ${ExactRound.ratioRound6IntSql(s"sum(${ExactRound.e6Sql("recall")})", 6, "count(*)")} AS avg_recall,
         |  count(*) AS n_queries FROM perq""".stripMargin,
    // Every md5 draw, every resample mean, and both order-statistic
    // bounds replayed; DuckDB's row_number windows mirror the Spark ones
    // tie rule for tie rule.
    "eval_recall_bootstrap" -> {
      val NQ = Fixtures.NQ
      s"""WITH $recallCte,
         |rk AS (SELECT n_matches AS nm,
         |    row_number() OVER (ORDER BY job_id) - 1 AS rn FROM perq),
         |dr AS (SELECT b, ${graft.queries.DocSql.tokenHashSql(
             "'boot' || CAST(b AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % $NQ AS pick
         |  FROM unnest(generate_series(0, ${Boot - 1})) t(b),
         |    unnest(generate_series(0, $NQ - 1)) u(i)),
         |bm AS (SELECT b, ${ExactRound.roundDivSql("sum(rk.nm) * 1000000",
             s"${NQ * K}")} AS m
         |  FROM dr JOIN rk ON rk.rn = dr.pick GROUP BY b),
         |br AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM bm),
         |ov AS (SELECT ${ExactRound.roundDivSql("sum(nm) * 1000000",
             s"count(*) * $K")} AS mean_recall_e6 FROM rk)
         |SELECT CAST($Boot AS BIGINT) AS n_boot, ov.mean_recall_e6,
         |  (SELECT m FROM br WHERE r = $BootLoRank) AS ci_lo_e6,
         |  (SELECT m FROM br WHERE r = $BootHiRank) AS ci_hi_e6
         |FROM ov""".stripMargin
    },
    "eval_rank_metrics" ->
      s"WITH $rankMetricsCte\nSELECT job_id, n_hits, first_rank, rr, ndcg FROM perq",
    "eval_rank_summary" ->
      s"""WITH $rankMetricsCte
         |SELECT ${ExactRound.ratioRound6IntSql(s"sum(${ExactRound.e6Sql("rr")})", 6, "count(*)")} AS mrr,
         |  ${ExactRound.ratioRound6IntSql(s"sum(${ExactRound.e6Sql("ndcg")})", 6, "count(*)")} AS avg_ndcg,
         |  count(*) AS n_queries FROM perq""".stripMargin,
    "eval_best_sim" ->
      s"WITH $bestSimCte\nSELECT job_id, avg_sim FROM perq",
    "eval_best_sim_summary" ->
      s"""WITH $bestSimCte
         |SELECT ${ExactRound.ratioRound6IntSql(s"sum(${ExactRound.e6Sql("avg_sim")})", 6, "count(*)")} AS avg_avg_sim,
         |  count(*) AS n_queries FROM perq""".stripMargin,
    "report_job_skills_pivot" ->
      s"""WITH $qCte, $cCte,
         |d AS (SELECT job_id, skill_id, label,
         |    1.0 - list_cosine_similarity(qvec, svec) AS dist FROM q CROSS JOIN c),
         |over_r AS (SELECT *, row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS rank0
         |    FROM d),
         |capped AS (SELECT * FROM over_r WHERE rank0 <= ${K * 10}),
         |firsts AS (SELECT *, row_number() OVER (PARTITION BY job_id, label ORDER BY rank0) AS pick
         |    FROM capped),
         |rr AS (SELECT job_id, skill_id, label,
         |    row_number() OVER (PARTITION BY job_id ORDER BY rank0) AS rank
         |    FROM firsts WHERE pick = 1)
         |SELECT job_id AS job,
         |$pivotCols
         |FROM rr WHERE rank <= $K GROUP BY job_id""".stripMargin)
}
