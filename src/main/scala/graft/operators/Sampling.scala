package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data pipelines.
  *
  * Everything keys off the portable content hash of a stable id — never an
  * RNG — so samples are reproducible run-to-run, stable under repartitioning,
  * consistent across engines (the DuckDB oracle replays them bit-exactly),
  * and rows keep their assignment when the corpus grows (the property that
  * matters when a 100 TB dataset is resampled incrementally: adding data
  * never reshuffles existing rows between splits).
  */
object Sampling {

  val Buckets = 10000

  /** Portable hash bucket of any key column: md5-derived, uniform over
    * [0, buckets). */
  def hashBucket(key: Column, buckets: Int = Buckets): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic ~`fraction` sample: keeps rows whose bucket falls below
    * the cut. Same key ⇒ same verdict, forever. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction outside [0,1]")
    df.filter(hashBucket(col(keyCol)) < (fraction * Buckets).toLong)
  }

  /** Train/val/test-style split assignment: weights are (name, share) in
    * order; shares must sum to ~1. Adds a `split` column. */
  def hashSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got $weights")
    val cuts = weights.scanLeft(0.0)(_ + _._2).map(w => (w * Buckets).toLong)
    val b = hashBucket(col(keyCol))
    val expr = weights.zipWithIndex.foldRight(lit(weights.last._1)) {
      case (((name, _), i), elseCol) =>
        when(b >= cuts(i) && b < cuts(i + 1), lit(name)).otherwise(elseCol)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic weighted sample without replacement (A-Res, Efraimidis &
    * Spirakis, IPL 2006): each row draws u = (md5-hash(key)+1)/2^32 ∈ (0,1]
    * and scores ln(u)/w — a monotone transform of the classic u^(1/w) key —
    * and the sample is the global top-`n` by (score desc, key). Inclusion
    * probability is proportional to weight; the md5 uniform makes it
    * reproducible, repartition-stable, and engine-portable (the score
    * rounds at 8 decimals before comparison so libm ulp drift can't reorder
    * near-ties; remaining ties break on the key). Zero/negative weights are
    * excluded (they'd score -∞). The top-n plans as TakeOrderedAndProject —
    * per-partition heaps + one tiny merge, never a global sort. Output:
    * input columns + `wkey`. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long") + 1L) / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("wkey", round(log(u) / col(weightCol), 8))
      .orderBy(col("wkey").desc, col(keyCol))
      .limit(n)
  }

  /** Temperature-based mixture sampling (the data-mixing step of an LLM
    * corpus: rebalance skewed groups toward q_g ∝ p_g^τ, as in the
    * multilingual sampling of Conneau & Lample, NeurIPS 2019): per-group
    * keep-rates are derived from the group shares, then rows keep/drop by
    * the same portable hash bucket every other sampler here uses —
    * deterministic, repartition-stable, and growth-stable per group.
    *
    * τ is FIXED at 0.5 (w_g = √p_g): sqrt is correctly rounded in IEEE
    * (unlike pow), and with the weight rounded at 8 decimals before an
    * exact decimal normalization, every arithmetic step is bit-reproducible
    * in the DuckDB oracle. budgetFraction sizes the kept corpus (~fraction
    * of input rows); a rare group's rate caps at 1 (never upsampled —
    * repetition policy belongs to the sequencer, not the sampler).
    *
    * Scale shape: two tiny aggregates over the group column (broadcast
    * back), then ONE narrow filter pass over the corpus — no shuffle of the
    * data itself. Output: input columns + `rate`. */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
      budgetFraction: Double): DataFrame = {
    require(budgetFraction > 0.0 && budgetFraction <= 1.0,
      s"budgetFraction $budgetFraction outside (0,1]")
    val cnt = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val tot = cnt.agg(sum("__n").as("__nn")) // exact long
    val w = cnt.crossJoin(broadcast(tot))
      .withColumn("__w", round(sqrt(col("__n").cast("double") / col("__nn")), 8))
    // Normalizer: exact decimal sum of the 8-decimal weights — group order
    // cannot perturb it in either engine.
    val sumw = w.agg(sum(col("__w").cast("decimal(18,8)")).cast("double").as("__sw"))
    val rates = w.crossJoin(broadcast(sumw))
      .withColumn("rate", round(least(lit(1.0d),
        lit(budgetFraction) * col("__nn") * (col("__w") / col("__sw")) / col("__n")), 8))
      .select(col(groupCol).as("__grp"), col("rate"))
    // Null-safe group lookup: groupBy above keeps a NULL group and budgets
    // for it, so the join back must match it too — a plain equi-join would
    // silently drop every null-group row and quietly undershoot the budget.
    df.join(broadcast(rates), col(groupCol) <=> col("__grp"))
      .filter(hashBucket(col(keyCol)) < col("rate") * Buckets)
      .drop("__grp")
  }

  /** Token-budget mixture sampling — the form a training run actually
    * specifies its data mix in: "B tokens total, split across sources in
    * proportion to their token share" (weights in TOKENS, not documents —
    * a long-document source would otherwise blow its quota with few rows).
    * Per group g with token count T_g of a corpus totalling T: the target
    * is the exact integer roundDiv(B·T_g, T); documents are ordered by the
    * portable (hash, id) — reproducible "random" — and kept while the
    * RUNNING token sum stays within the target (first-past-the-post: the
    * document that crosses the boundary is kept, so every non-empty target
    * keeps ≥ 1 document and the kept count overshoots by < 1 document).
    *
    * Every step is exact integer arithmetic — token counts are longs, the
    * target is [[graft.functions.ExactRound.roundDiv]] — so the kept SET
    * replays bit-exactly in the DuckDB oracle. Scale shape: one tiny
    * per-group aggregate broadcast back, then ONE per-group running-sum
    * window (partitioned on the group — sorts bounded by group size, and a
    * skewed group salts the same way any window here would).
    *
    * Output: (groupCol, idCol, n_tokens, cum_tokens, target_tokens) for
    * the kept rows. */
  def tokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val cnt = df.groupBy(col(groupCol)).agg(sum(col(tokensCol)).as("__tg"))
    val tot = cnt.agg(sum("__tg").as("__tt"))
    val targets = cnt.crossJoin(broadcast(tot))
      .select(col(groupCol).as("__grp"),
        graft.functions.ExactRound.roundDiv(
          col("__tg") * lit(budgetTokens), col("__tt")).as("target_tokens"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      .join(broadcast(targets), col(groupCol) <=> col("__grp"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < col("target_tokens"))
      .select(col(groupCol), col(idCol), col("n_tokens"), col("cum_tokens"),
        col("target_tokens"))
  }

  /** Deterministic stratified sample: the `n` rows of each stratum with the
    * smallest (hash, key) — reproducible "random" per-group quotas. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Bottom-k (KMV) sample: the k keys with the smallest 32-bit salted
    * md5 hashes — the MERGEABLE distributed reservoir (Beyer et al.
    * SIGMOD'07): bottom-k(A ⊎ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)),
    * so shards/partitions/days each keep k rows and any union re-merges
    * exactly, where a true reservoir sample is not mergeable at all.
    * The k-th smallest hash is simultaneously the KMV distinct-count
    * estimator (k−1)·2³²/h₍ₖ₎. Plans as TakeOrderedAndProject — per-
    * partition heaps, k rows to the driver side of the exchange, never a
    * global sort. Keys are deduplicated first (the KMV contract — the
    * sample, the estimator's k-th distinct hash, and the merge law are
    * all over DISTINCT keys; a duplicated key would occupy two slots and
    * break all three): one keyed shuffle, the same cost class as the
    * per-source sketches the merge law exists for. Output: (keyCol, __h),
    * exactly k rows (fewer iff the input has fewer distinct keys). */
  def bottomK(df: DataFrame, keyCol: String, k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(keyCol)).dropDuplicates(keyCol)
      .select(col(keyCol),
        graft.functions.TextFunctions.tokenHash(
          concat(lit(salt), col(keyCol).cast("string"))).as("__h"))
      .orderBy(col("__h"), col(keyCol))
      .limit(k)
  }
}
