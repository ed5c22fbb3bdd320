package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound
import graft.io.Tables
import graft.operators.Sampling

/** Deterministic sampling/splitting queries over documents (training-data
  * pipeline north star). The md5-derived bucket replays exactly in DuckDB,
  * so even the "random" samples are hash-checked. */
object SampleQueries extends graft.QueryModule {

  private val bucketSql =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~10% reproducible sample.
    "sample_docs_hash" -> ((s, dir) =>
      Sampling.hashSample(Tables.documents(s, dir), "doc_id", 0.1)
        .select("doc_id", "lang")),
    // 80/10/10 train/val/test assignment for every row.
    "sample_docs_split" -> ((s, dir) =>
      Sampling.hashSplit(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),
    // 20 quota-sampled docs per language.
    "sample_docs_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 20)
        .select("doc_id", "lang")),
    // Bottom-k (KMV) mergeable sample (Sampling.bottomK scaladoc): the
    // card pins the global sample checksum, the KMV distinct estimate
    // with its accuracy gate, AND the merge law — re-merging per-source
    // bottom-k sketches reproduces the global sample EXACTLY (n_diff = 0),
    // the property that lets every shard keep k rows at 100 TB.
    "sample_bottomk_merge" -> ((s, dir) => {
      val k = 64
      val docs = Tables.documents(s, dir)
      val global = Sampling.bottomK(docs, "doc_id", k, "kmv")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__h"), col("doc_id"))
      val perSource = docs.select(col("source"), col("doc_id"),
          graft.functions.TextFunctions.tokenHash(
            concat(lit("kmv"), col("doc_id").cast("string"))).as("__h"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      val merged = perSource.orderBy(col("__h"), col("doc_id")).limit(k)
      val nDiff = global.select("doc_id")
        .unionAll(merged.select("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("__c"))
        .filter(col("__c") =!= 2)
        .agg(count(lit(1)).as("n_diff"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(global.agg(max(col("__h")).as("kth_hash"),
          sum(col("doc_id")).as("sample_checksum"))))
        .crossJoin(broadcast(nDiff))
        .select(col("n_docs"), col("kth_hash"),
          ExactRound.roundDiv(lit((k - 1L) * 4294967296L), col("kth_hash"))
            .as("est_distinct"),
          (ExactRound.roundDiv(lit((k - 1L) * 4294967296L), col("kth_hash"))
            * 10L >= col("n_docs") * 7L &&
           ExactRound.roundDiv(lit((k - 1L) * 4294967296L), col("kth_hash"))
            * 10L <= col("n_docs") * 13L).as("gate_ok"),
          col("sample_checksum"), (col("n_diff") === 0L).as("merge_exact"))
    }),
    // 50 docs weighted by token count (A-Res without replacement): longer
    // docs proportionally likelier, md5-uniform draws — the "random" sample
    // and its scores hash-match the oracle.
    "sample_docs_weighted" -> ((s, dir) =>
      Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"),
          graft.operators.Sequencer.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", 50)),
    // Temperature (τ=0.5) mixture over the skewed lang column at a ~50%
    // budget: rare languages keep a higher rate than their raw share (en
    // dominates the corpus; √-share flattens it). The per-group summary
    // pins the rates AND the kept counts, so both the rate arithmetic and
    // the per-row hash verdicts are oracle-gated.
    "sample_mixture_temperature" -> ((s, dir) => {
      Sampling.temperatureMixture(Tables.documents(s, dir), "lang", "doc_id", 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), max(col("rate")).as("rate"))
    }),
    // DSIR importance weights (Xie et al. 2023): how target-like (en/src0
    // slice) each pool document's hashed n-gram profile is. The weight is
    // an exact micro-scaled integer, so the whole model — features,
    // smoothing, log-ratio — is hash-gated.
    "select_dsir_weights" -> ((s, dir) => dsirWeights(s, dir)),
    // The DSIR selection step: deterministic Gumbel top-m over the weights
    // (temperature 1), i.e. the actual "pick the training subset" output.
    "select_dsir_sample" -> ((s, dir) =>
      graft.operators.Dsir.gumbelTopM(dsirWeights(s, dir), "doc_id", DsirM)),
    // Deterministic training-order shuffle: every epoch pipeline needs the
    // corpus in a reproducible pseudo-random order, sharded for parallel
    // readers. Shard and sort key come from INDEPENDENT md5 hashes of the
    // id (seeded differently), so within-shard order is uncorrelated with
    // shard assignment; the rank window partitions by shard — never a
    // global single-partition row_number. Each shard sorts corpus/shards
    // rows, so `shards` is the scale lever: at 100 TB set it to
    // corpus / target-shard-size (the shape IS a distributed sort, keyed
    // up front); 16 here only matches the test corpus.
    "sample_docs_shuffle" -> ((s, dir) => {
      val key = graft.functions.TextFunctions.tokenHash(
        concat(lit("shufkey"), col("doc_id").cast("string")))
      val shard = pmod(graft.functions.TextFunctions.tokenHash(
        concat(lit("shufshard"), col("doc_id").cast("string"))), lit(ShuffleShards.toLong))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("__key"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), key.as("__key"), shard.as("shard"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
    }),
    // Token-budget mixture — the unit a training run specifies its mix in:
    // 10k tokens split across sources by TOKEN share (exact integer
    // targets), filled per source in portable-hash order with
    // first-past-the-post running sums. The per-source summary pins the
    // kept SET (id checksum), its token accounting, and the target
    // arithmetic in one row per source.
    "sample_token_budget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"))
      graft.operators.Sampling.tokenBudget(docs, "source", "doc_id",
          "n_toks", TokenBudget)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("n_tokens")).as("n_tokens_kept"),
          max(col("target_tokens")).as("target_tokens"),
          sum(col("doc_id")).as("id_checksum"))
    }),
    // Epoch planning under data constraints (Muennighoff et al., NeurIPS
    // 2023: repeating data up to ~4 epochs retains most of its value):
    // give every source an EQUAL share of the corpus-sized token budget;
    // sources below the share repeat (epochs = ceil(target/available),
    // capped at 4 — past the cap the remainder is an explicit deficit, the
    // number a mixing run rebalances by). Pure integer arithmetic over two
    // tiny aggregates — the whole plan is hash-exact.
    "sample_epoch_plan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("__nt"))
      val per = docs.groupBy("source").agg(sum(col("__nt")).as("avail_tokens"))
        .filter(col("avail_tokens") > 0L)
      val tot = per.agg(sum(col("avail_tokens")).as("__tt"),
        count(lit(1)).as("__ns"))
      per.crossJoin(broadcast(tot))
        .withColumn("target_tokens",
          graft.functions.ExactRound.roundDiv(col("__tt"), col("__ns")))
        .withColumn("epochs", least(lit(4L),
          expr("(target_tokens + avail_tokens - 1) div avail_tokens")))
        .withColumn("effective_tokens",
          least(col("target_tokens"), col("epochs") * col("avail_tokens")))
        .withColumn("deficit_tokens",
          col("target_tokens") - col("effective_tokens"))
        .select(col("source"), col("avail_tokens"), col("target_tokens"),
          col("epochs"), col("effective_tokens"), col("deficit_tokens"))
    }),
    // The composed selection pipeline as ONE row: DSIR weights → Gumbel
    // top-m → ExactSubstr span-clean WITHIN the selection → chunk → pack.
    // Stages are green individually; this row goes red if the composition
    // drifts (selection from the wrong weights, span-cleaning the pool,
    // packing un-cleaned counts). sel_checksum = Σ rank·doc_id pins the
    // exact selected set AND its order.
    "pipeline_dsir_select" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sel = graft.Pipeline.selectTrainingSubset(docs,
        docs.filter(col("lang") === "en" && col("source") === "src0"),
        "doc_id", "text",
        graft.Pipeline.SelectConfig(buckets = DsirBuckets, m = DsirM))
      docs.agg(count(lit(1)).as("n_pool"))
        .crossJoin(sel.sample.agg(count(lit(1)).as("n_selected"),
          sum(col("rank") * col("doc_id")).as("sel_checksum")))
        .crossJoin(sel.spans.agg(
          coalesce(sum(col("n_spans")), lit(0L)).as("n_spans"),
          coalesce(sum(col("dup_tokens")), lit(0L)).as("dup_tokens")))
        .crossJoin(sel.clean.agg(count(lit(1)).as("n_clean_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens_clean")))
        .crossJoin(sel.chunks.agg(count(lit(1)).as("n_chunks")))
        .crossJoin(sel.shards.select(col("grp"), col("shard_idx")).distinct()
          .agg(count(lit(1)).as("n_shards")))
    }),
    // Length-bucketed batch planning: docs binned to the smallest
    // power-of-two cap that fits (overflow clamps to the top bucket,
    // truncating), then per bucket the padding waste a fixed-shape batch
    // pays and how many TokenBudget-token batches the bucket fills. The
    // standard efficiency prep for fixed-shape training kernels; pure
    // integer arithmetic, one keyed agg over a scan.
    "sample_length_buckets" -> ((s, dir) => {
      val capCol = LengthCaps.init.foldRight(lit(LengthCaps.last)) {
        (c, elseCol) => when(col("__nt") <= c, lit(c)).otherwise(elseCol) }
      Tables.documents(s, dir)
        .select(graft.functions.TextFunctions.tokenCount(col("text")).as("__nt"))
        .select(col("__nt"), capCol.as("cap"))
        .select(col("__nt"), col("cap"),
          (col("cap") - least(col("__nt"), col("cap"))).as("__pad"))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).cast("long").as("sum_tokens"),
          sum(col("__pad")).cast("long").as("padding_tokens"))
        .withColumn("n_batches",
          expr(s"(n_docs + ($TokenBudget div cap) - 1) div ($TokenBudget div cap)"))
    }))

  private val DsirBuckets = 4096
  private val TokenBudget = 10000L
  private val DsirM = 50
  private val ShuffleShards = 16
  private val LengthCaps = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
  // Selection-pipeline constants — one source for both engines
  // (Pipeline.SelectConfig defaults must match).
  private val SelSpanK = graft.Pipeline.SelectConfig().spanK
  private val SelStride = graft.Pipeline.SelectConfig().stride
  private val SelPackGroups = graft.Pipeline.SelectConfig().packGroups
  private val SelPackBudget = graft.Pipeline.SelectConfig().packBudget

  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    graft.operators.Dsir.importanceWeights(docs,
      docs.filter(col("lang") === "en" && col("source") === "src0"),
      "doc_id", "text", DsirBuckets)
  }

  val oracles: Map[String, String] = Map(
    "sample_length_buckets" ->
      s"""WITH ${DocSql.toksCte},
         |t AS (SELECT CAST(len(toks) AS BIGINT) AS nt FROM tokd),
         |b AS (SELECT nt, CAST(CASE
         |    ${LengthCaps.init.map(c => s"WHEN nt <= $c THEN $c").mkString("\n    ")}
         |    ELSE ${LengthCaps.last} END AS BIGINT) AS cap FROM t)
         |SELECT cap, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS sum_tokens,
         |  CAST(sum(cap - least(nt, cap)) AS BIGINT) AS padding_tokens,
         |  CAST((count(*) + ($TokenBudget // cap) - 1) // ($TokenBudget // cap) AS BIGINT) AS n_batches
         |FROM b GROUP BY 1""".stripMargin,
    // The plan arithmetic replayed in integer SQL, step for step.
    "sample_epoch_plan" ->
      s"""WITH ${DocSql.toksCte},
         |t AS (SELECT d.source, CAST(len(toks) AS BIGINT) AS nt
         |  FROM documents d JOIN tokd USING (doc_id)),
         |g AS (SELECT source, CAST(sum(nt) AS BIGINT) AS avail_tokens
         |  FROM t GROUP BY 1 HAVING sum(nt) > 0),
         |tt AS (SELECT CAST(sum(avail_tokens) AS BIGINT) AS tt,
         |    CAST(count(*) AS BIGINT) AS ns FROM g),
         |p AS (SELECT source, avail_tokens,
         |    ${graft.functions.ExactRound.roundDivSql("tt", "ns")} AS target_tokens
         |  FROM g CROSS JOIN tt),
         |e AS (SELECT source, avail_tokens, target_tokens,
         |    least(4, (target_tokens + avail_tokens - 1) // avail_tokens) AS epochs
         |  FROM p)
         |SELECT source, avail_tokens, target_tokens,
         |  CAST(epochs AS BIGINT) AS epochs,
         |  CAST(least(target_tokens, epochs * avail_tokens) AS BIGINT) AS effective_tokens,
         |  CAST(target_tokens - least(target_tokens, epochs * avail_tokens) AS BIGINT) AS deficit_tokens
         |FROM e""".stripMargin,
    // Mirrors tokenBudget step for step: token counts → exact integer
    // per-source targets (shared rounded division) → hash-ordered running
    // sums → first-past-the-post keep rule → per-source summary.
    "sample_token_budget" ->
      s"""WITH ${DocSql.toksCte},
         |t AS (SELECT d.doc_id, d.source, CAST(len(toks) AS BIGINT) AS n_tokens,
         |    $bucketSql AS b
         |  FROM documents d JOIN tokd USING (doc_id)),
         |g AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tg FROM t GROUP BY 1),
         |tt AS (SELECT CAST(sum(tg) AS BIGINT) AS tt FROM g),
         |tgt AS (SELECT source,
         |    ${graft.functions.ExactRound.roundDivSql(s"tg * $TokenBudget", "tt")} AS target_tokens
         |  FROM g CROSS JOIN tt),
         |r AS (SELECT t.*, sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY b, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t),
         |k AS (SELECT r.source, r.doc_id, r.n_tokens, tgt.target_tokens
         |  FROM r JOIN tgt USING (source)
         |  WHERE cum - n_tokens < target_tokens)
         |SELECT source, count(*) AS n_docs_kept,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept,
         |  max(target_tokens) AS target_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
         |FROM k GROUP BY 1""".stripMargin,
    "sample_bottomk_merge" -> {
      val rd = graft.functions.ExactRound.roundDivSql("63 * 4294967296", "kth_hash")
      s"""WITH bh AS (SELECT doc_id, source,
         |    ('0x' || substr(md5('kmv' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hh
         |  FROM documents),
         |gk AS (SELECT doc_id, hh FROM bh ORDER BY hh, doc_id LIMIT 64),
         |ps AS (SELECT doc_id, hh FROM (
         |    SELECT doc_id, hh, row_number() OVER (PARTITION BY source
         |      ORDER BY hh, doc_id) AS rn FROM bh) WHERE rn <= 64),
         |mg AS (SELECT doc_id FROM ps ORDER BY hh, doc_id LIMIT 64),
         |bkd AS (SELECT count(*) AS nd FROM (
         |  SELECT doc_id FROM (SELECT doc_id FROM gk UNION ALL SELECT doc_id FROM mg)
         |  GROUP BY doc_id HAVING count(*) <> 2)),
         |card AS (SELECT (SELECT count(*) FROM bh) AS n_docs,
         |  (SELECT max(hh) FROM gk) AS kth_hash,
         |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM gk) AS sample_checksum,
         |  (SELECT nd FROM bkd) AS nd)
         |SELECT n_docs, kth_hash, $rd AS est_distinct,
         |  ($rd * 10 >= n_docs * 7 AND $rd * 10 <= n_docs * 13) AS gate_ok,
         |  sample_checksum, nd = 0 AS merge_exact
         |FROM card""".stripMargin
    },
    "sample_docs_hash" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE $bucketSql < 1000""".stripMargin,
    "sample_docs_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN $bucketSql < 8000 THEN 'train'
         |       WHEN $bucketSql < 9000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,
    "sample_docs_stratified" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY $bucketSql, doc_id) AS rn
         |  FROM documents)
         |WHERE rn <= 20""".stripMargin,
    // Mirrors temperatureMixture step for step: counts → √-share rounded at
    // 8 decimals → exact decimal normalizer → capped rate → hash verdicts.
    "sample_mixture_temperature" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |tot AS (SELECT sum(n) AS nn FROM cnt),
         |w AS (SELECT lang, n, round(sqrt(CAST(n AS DOUBLE) / nn), 8) AS w
         |  FROM cnt CROSS JOIN tot),
         |sw AS (SELECT CAST(sum(CAST(w AS DECIMAL(18,8))) AS DOUBLE) AS sw FROM w),
         |rates AS (SELECT lang, n,
         |    round(least(1.0, 0.5 * (SELECT nn FROM tot) * (w / sw.sw) / n), 8) AS rate
         |  FROM w CROSS JOIN sw),
         |kept AS (SELECT d.lang FROM documents d
         |  JOIN rates r ON d.lang IS NOT DISTINCT FROM r.lang
         |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
         |        < r.rate * 10000)
         |SELECT k.lang, count(*) AS n_kept, max(r.rate) AS rate
         |FROM kept k JOIN rates r ON k.lang IS NOT DISTINCT FROM r.lang
         |GROUP BY k.lang""".stripMargin,
    "sample_docs_weighted" ->
      s"""WITH ${DocSql.toksCte},
         |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tokd
         |  WHERE len(toks) > 0),
         |k AS (SELECT doc_id, n_tokens,
         |    round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
         |      / 4294967296.0) / n_tokens, 8) AS wkey
         |  FROM t)
         |SELECT doc_id, n_tokens, wkey FROM k
         |ORDER BY wkey DESC, doc_id LIMIT 50""".stripMargin,
    "sample_docs_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
         |    ${DocSql.tokenHashSql("'shufkey' || CAST(doc_id AS VARCHAR)")} AS key,
         |    ${DocSql.tokenHashSql("'shufshard' || CAST(doc_id AS VARCHAR)")} % $ShuffleShards AS shard
         |  FROM documents)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) AS BIGINT) AS pos
         |FROM k""".stripMargin,
    "select_dsir_weights" ->
      s"""WITH ${DocSql.toksCte},
         |$dsirWeightCtes
         |SELECT doc_id, w_e6 FROM w""".stripMargin,
    // Gumbel top-m over the weights: the inner ln is rounded at 8 (and
    // clamped below −1e-8) before the outer ln, mirroring the operator's
    // transcendental discipline exactly.
    "select_dsir_sample" ->
      s"""WITH ${DocSql.toksCte},
         |$dsirWeightCtes,
         |$dsirSampleCtes
         |SELECT doc_id, rank, ${ExactRound.eScaledSql("key", 6)} AS key_e6
         |FROM r WHERE rank <= $DsirM""".stripMargin,
    // The composed selection pipeline: the same weight + Gumbel CTEs feed a
    // subset-scoped replay of the span-dedup mirror, then the chunk/pack
    // arithmetic over the CLEANED token counts.
    "pipeline_dsir_select" ->
      s"""WITH ${DocSql.toksCte},
         |$dsirWeightCtes,
         |$dsirSampleCtes,
         |sel AS (SELECT doc_id, rank FROM r WHERE rank <= $DsirM),
         |${DocSql.gramPosCte(SelSpanK)},
         |selpos AS (SELECT posg.doc_id, posg.pos, posg.ghv
         |  FROM posg JOIN sel USING (doc_id)),
         |${DocSql.spanCtes(SelSpanK, "selpos")},
         |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens FROM sp GROUP BY 1),
         |seltok AS (SELECT s.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens
         |  FROM sel s JOIN tokd t USING (doc_id)),
         |keptc AS (SELECT s.doc_id,
         |    s.n_tokens - coalesce(st.dup_tokens, 0) AS ct
         |  FROM seltok s LEFT JOIN st USING (doc_id)
         |  WHERE s.n_tokens - coalesce(st.dup_tokens, 0) > 0),
         |packed AS (SELECT DISTINCT doc_id % $SelPackGroups AS grp,
         |    (sum(ct) OVER (PARTITION BY doc_id % $SelPackGroups ORDER BY doc_id)
         |      - ct) // $SelPackBudget AS shard_idx
         |  FROM keptc)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_pool,
         |  (SELECT count(*) FROM sel) AS n_selected,
         |  (SELECT CAST(sum(rank * doc_id) AS BIGINT) FROM sel) AS sel_checksum,
         |  (SELECT count(*) FROM sp) AS n_spans,
         |  (SELECT CAST(coalesce(sum(e - s + 1), 0) AS BIGINT) FROM sp) AS dup_tokens,
         |  (SELECT count(*) FROM keptc) AS n_clean_docs,
         |  (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM keptc) AS n_tokens_clean,
         |  (SELECT CAST(coalesce(sum(((ct - 1) // $SelStride) + 1), 0) AS BIGINT)
         |    FROM keptc) AS n_chunks,
         |  (SELECT count(*) FROM packed) AS n_shards""".stripMargin)

  /** Gumbel top-m CTEs shared by the sample query and the selection
    * pipeline (require `w` from [[dsirWeightCtes]]): md5-uniform → inner ln
    * rounded at 8 and clamped below −1e-8 → outer ln — the operator's
    * transcendental discipline exactly. Ends in r(doc_id, key, rank). */
  private lazy val dsirSampleCtes: String =
    s"""gk AS (SELECT doc_id,
       |    least(round(ln((CAST(('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE) + 1.0)
       |      / 4294967297.0), 8), -1e-8) AS l1, w_e6
       |  FROM w),
       |k2 AS (SELECT doc_id,
       |    CAST(w_e6 AS DOUBLE) / 1e6 / 1.0 + round(-ln(-l1), 8) AS key
       |  FROM gk),
       |r AS (SELECT doc_id, key,
       |    CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank
       |  FROM k2)""".stripMargin

  /** DSIR weight CTEs (require `tokd`): hashed unigram+bigram features,
    * add-one-smoothed target/pool bucket models, λ log-ratio, exact e6
    * per-doc weight sum — each arithmetic step the very one the operator
    * runs. Final CTE `w`: (doc_id, w_e6). */
  private lazy val dsirWeightCtes: String = {
    val b = DsirBuckets
    s"""gd AS (SELECT doc_id, unnest(list_concat(toks,
       |    list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1]))) AS g
       |  FROM tokd),
       |fc AS (SELECT doc_id, ${DocSql.tokenHashSql("g")} % $b AS bucket, count(*) AS c
       |  FROM gd GROUP BY 1, 2),
       |tb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS bc FROM fc
       |  JOIN documents d USING (doc_id)
       |  WHERE d.lang = 'en' AND d.source = 'src0' GROUP BY 1),
       |tn AS (SELECT coalesce(CAST(sum(bc) AS BIGINT), 0) AS n FROM tb),
       |pb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS bc FROM fc GROUP BY 1),
       |pn AS (SELECT coalesce(CAST(sum(bc) AS BIGINT), 0) AS n FROM pb),
       |tlp AS (SELECT bucket, round(ln((CAST(bc AS DOUBLE) + 1.0)
       |    / (CAST(tn.n AS DOUBLE) + $b.0)), 8) AS lp FROM tb CROSS JOIN tn),
       |tdf AS (SELECT round(ln(1.0 / (CAST(n AS DOUBLE) + $b.0)), 8) AS lp0 FROM tn),
       |plp AS (SELECT bucket, round(ln((CAST(bc AS DOUBLE) + 1.0)
       |    / (CAST(pn.n AS DOUBLE) + $b.0)), 8) AS lq FROM pb CROSS JOIN pn),
       |lam AS (SELECT p.bucket, coalesce(t.lp, tdf.lp0) - p.lq AS lam
       |  FROM plp p LEFT JOIN tlp t ON p.bucket = t.bucket CROSS JOIN tdf),
       |terms AS (SELECT f.doc_id, ${ExactRound.eScaledSql("CAST(f.c AS DOUBLE) * l.lam", 6)} AS t6
       |  FROM fc f JOIN lam l ON f.bucket = l.bucket),
       |w AS (SELECT d.doc_id, coalesce(CAST(sum(t.t6) AS BIGINT), 0) AS w_e6
       |  FROM documents d LEFT JOIN terms t ON d.doc_id = t.doc_id GROUP BY 1)""".stripMargin
  }
}
