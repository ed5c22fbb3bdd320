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

  /** Lexical top-k per query by BM25 (Robertson & Zaragoza, FnTIR 2009;
    * the Lucene `(N − df + 0.5)/(df + 0.5) + 1` idf variant, always
    * positive): score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    * b·|d|/avgdl)) over the query's DISTINCT token hashes. Output:
    * (queryIdCol, idCol, rank, bm25_e9) with the score pinned as a
    * NANO-SCALED BIGINT — each per-token contribution is `floor(x·1e9+0.5)`
    * ([[graft.functions.ExactRound.eScaled]]) so the per-pair sum is exact
    * integer arithmetic: order-independent under Spark's partial
    * aggregation AND engine-proof in the oracle (a double Σ would make the
    * ranking depend on float summation order). The one transcendental (ln
    * in idf) is rounded at 8 digits the moment it's computed — the same
    * discipline as the TF-IDF embedder's idf — so both engines carry
    * identical doubles into the contribution.
    *
    * Scale shape: identical to [[lexicalTopK]] — tf postings are one keyed
    * shuffle, the query join rides the token-hash key, doc-length joins on
    * the id key, and the corpus stats (N, avgdl) are a broadcast 1-row
    * attach. `maxDf` drops fat posting lists wholesale (the stopword
    * lever); df for idf is computed on the UNCAPPED postings so the cap
    * changes candidate generation, never term weighting. */
  def bm25TopK(queries: DataFrame, queryIdCol: String, queryTextCol: String,
      corpus: DataFrame, idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val fr = bm25Frames(corpus, idCol, textCol, maxDf)
    bm25FromTerms(tokenTerms(queries, queryIdCol, queryTextCol),
      queryIdCol, fr, idCol, k, k1, b)
  }

  /** Distinct token-hash terms of a text column: (queryIdCol, __h). */
  private def tokenTerms(queries: DataFrame, queryIdCol: String,
      queryTextCol: String): DataFrame =
    queries.select(col(queryIdCol),
        explode(transform(TextFunctions.tokens(col(queryTextCol)),
          TextFunctions.tokenHash(_))).as("__h"))
      .distinct()

  /** The corpus-side BM25 state, built once and Caches-shared: tf
    * postings, doc lengths, 1-row stats, rounded-8 idf, df-capped
    * postings. */
  private case class Bm25Frames(tf: DataFrame, dl: DataFrame,
      stats: DataFrame, idf: DataFrame, postings: DataFrame)

  private def bm25Frames(corpus: DataFrame, idCol: String, textCol: String,
      maxDf: Int): Bm25Frames = {
    val ctok = corpus.select(col(idCol),
      explode(transform(TextFunctions.tokens(col(textCol)),
        TextFunctions.tokenHash(_))).as("__h"))
    // One row per (doc, token): tf. Cached — doc length, df, and the
    // postings join all read it.
    val tf = graft.Caches.cached(
      ctok.groupBy(col(idCol), col("__h")).agg(count(lit(1)).as("tf")))
    // dl and idf are one shuffle each off the cached tf, but every
    // bm25FromTerms call re-joins them — the PRF query alone runs three
    // (two scoring passes + the expansion weighting) and the cross-encoder
    // rerank reads idf again. Caches-shared like tf (r17, guide §2.4):
    // both are strictly SMALLER than the already-cached tf (one row per
    // doc / per term vs one per (doc, term)), so the registry cost is
    // bounded by what it already holds.
    val dl = graft.Caches.cached(
      tf.groupBy(col(idCol)).agg(sum(col("tf")).as("__dl")))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sl"))
    val dfs = tf.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    val postings =
      if (maxDf == Int.MaxValue) tf
      else Salt.capBuckets(tf, Seq("__h"), maxDf.toLong)
    // idf rounded at 8 immediately (both engines), THEN used — never a raw
    // transcendental feeding the integer pin.
    val idf = graft.Caches.cached(dfs.crossJoin(broadcast(stats))
      .select(col("__h"), round(
        log((col("__n").cast("double") - col("__df").cast("double") + lit(0.5d))
          / (col("__df").cast("double") + lit(0.5d)) + lit(1.0d)), 8).as("__idf")))
    Bm25Frames(tf, dl, stats, idf, postings)
  }

  /** Score a (queryIdCol, __h) term frame against prebuilt corpus state —
    * the from-terms face [[bm25PrfTopK]]'s second pass needs. */
  private def bm25FromTerms(qterms: DataFrame, queryIdCol: String,
      fr: Bm25Frames, idCol: String, k: Int, k1: Double,
      b: Double): DataFrame = {
    // broadcast(qterms): the query term set is |Q|-bounded (the serving
    // convention crossRerank/rankVisited document) — without the hint the
    // planner can sort-merge, shuffling the ENTIRE postings table to meet
    // a few hundred query terms (§3.1: broadcast the side that fits).
    val contrib = broadcast(qterms)
      .join(fr.postings, "__h")
      .join(fr.idf, "__h")
      .join(fr.dl, idCol)
      .crossJoin(broadcast(fr.stats))
      .withColumn("__c", col("__idf") *
        (col("tf").cast("double") * lit(k1 + 1.0d) /
          (col("tf").cast("double") + lit(k1) * (lit(1.0d) - lit(b) +
            lit(b) * (col("__dl").cast("double") /
              (col("__sl").cast("double") / col("__n").cast("double")))))))
      .select(col(queryIdCol), col(idCol),
        graft.functions.ExactRound.eScaled(col("__c"), 9).as("__c9"))
    val scored = contrib.groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__c9")).as("bm25_e9"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("bm25_e9").desc, col(idCol))
    // The RANKED frame is Caches-shared, the cut applied after: the BM25
    // leg (k = 20) and the PRF first pass (k = fbDocs) score the SAME
    // (qterms, corpus-state) pair — without the registry each ran its own
    // posting join + aggregation (r17; VERDICT r16 item 5). |Q|-bounded
    // like every serving frame here (one row per (query, matched doc)).
    graft.Caches.cached(
        scored.withColumn("rank", row_number().over(w).cast("long")))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("bm25_e9"))
  }

  /** BM25 with RM3-style pseudo-relevance feedback (Lavrenko & Croft
    * SIGIR'01; the Rocchio-simplified form): rank once, treat the top
    * `fbDocs` hits per query as relevant, score every term they contain
    * by Σ tf·idf₈ (e9-integerized — the same exact-sum discipline as the
    * BM25 score itself), adjoin the top `fbTerms` NEW terms to the query
    * term set unweighted, and rank again. The classic fix for vocabulary
    * mismatch: a query using none of a relevant doc's words still finds
    * its neighbors through the feedback docs' vocabulary.
    *
    * Both passes share one corpus state (postings/idf are Caches-shared),
    * so the incremental cost is the expansion agg (fbDocs·|doc| rows per
    * query) plus one more posting join — query-bounded, corpus-scan-free.
    * Interpolation weight λ is intentionally absent (documented): binary
    * term-set expansion keeps every score an exact integer. */
  def bm25PrfTopK(queries: DataFrame, queryIdCol: String,
      queryTextCol: String, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, fbDocs: Int, fbTerms: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDf: Int = Int.MaxValue): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1,
      s"need fbDocs/fbTerms >= 1; got $fbDocs, $fbTerms")
    val fr = bm25Frames(corpus, idCol, textCol, maxDf)
    val qtok = tokenTerms(queries, queryIdCol, queryTextCol)
    val fb = bm25FromTerms(qtok, queryIdCol, fr, idCol, fbDocs, k1, b)
      .select(col(queryIdCol), col(idCol))
    // broadcast hints on the |Q|-bounded sides (§3.1, the serving
    // convention): `fb` is |Q|·fbDocs rows meeting the corpus-sized tf
    // postings — unhinted, the planner may shuffle the postings to join a
    // few dozen feedback rows; the anti-join's qtok side is the query term
    // set itself.
    val expw = broadcast(fb).join(fr.tf, idCol).join(fr.idf, "__h")
      .select(col(queryIdCol), col("__h"),
        graft.functions.ExactRound.eScaled(
          col("__idf") * col("tf").cast("double"), 9).as("__w9"))
      .groupBy(col(queryIdCol), col("__h"))
      .agg(sum(col("__w9")).as("__w9"))
      .join(broadcast(qtok), Seq(queryIdCol, "__h"), "left_anti")
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__w9").desc, col("__h"))
    val expt = expw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= fbTerms)
      .select(col(queryIdCol), col("__h"))
    bm25FromTerms(qtok.unionAll(expt).distinct(), queryIdCol, fr, idCol,
      k, k1, b)
  }

  /** Cross-encoder-style EXACT re-rank of a bounded candidate list — the
    * second stage of the modern retrieval stack (Nogueira & Cho's
    * monoBERT shape: a cheap corpus-wide first stage proposes, an
    * expensive PAIRWISE scorer that sees query and document together
    * disposes). A real cross-encoder is a learned model; zero-egress
    * stands it in with a deterministic TERM-INTERACTION scorer no
    * factorized leg can reproduce: score(q, d) = Σ_{t ∈ q ∩ d}
    * idf₈(t)² · tf_q(t) · tf_d(t), each term e9-integerized BEFORE the
    * sum (the BM25 discipline — exact integer aggregation, engine- and
    * order-proof), ties → lowest id. The tf_q·tf_d product is the
    * "cross" part: it is a function of the pair, not of either side
    * alone, so it reorders the first-stage list exactly where
    * independent leg scores cannot. Candidates missing every query term
    * keep their slot at score 0.
    *
    * Scale shape — the whole reason two-stage retrieval exists at
    * 100 TB: the scorer touches only the |Q|·k CANDIDATES
    * (candidates ⋈ query-tf on the query key, ⋈ corpus-tf on the
    * (doc, token) key, ⋈ idf on the token key — all bounded keyed
    * joins), never a corpus rescan; the corpus-side tf/idf state is the
    * same Caches-shared frame set the BM25 leg already built. */
  def crossRerank(candidates: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, corpus: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val qtf = queries.select(col(queryIdCol),
        explode(transform(TextFunctions.tokens(col(queryTextCol)),
          TextFunctions.tokenHash(_))).as("__h"))
      .groupBy(col(queryIdCol), col("__h"))
      .agg(count(lit(1)).as("__tfq"))
    val fr = bm25Frames(corpus, idCol, textCol, Int.MaxValue)
    val cand = candidates.select(col(queryIdCol), col(idCol))
    // The pair side is bounded by construction (|Q|·k candidates ×
    // per-query vocabulary), so it BROADCASTS against the corpus-sized
    // tf/idf frames at any scale — without the hints Spark sort-merges,
    // i.e. shuffles the whole postings table to meet a few thousand rows.
    val pairTerms = cand.join(broadcast(qtf), queryIdCol)
    val scored = broadcast(broadcast(pairTerms)
        .join(fr.tf, Seq(idCol, "__h")))
      .join(fr.idf, "__h")
      .select(col(queryIdCol), col(idCol),
        graft.functions.ExactRound.eScaled(
          col("__idf") * col("__idf") *
            (col("__tfq") * col("tf")).cast("double"), 9).as("__c9"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__c9")).as("xenc_e9"))
    val full = cand.join(broadcast(scored), Seq(queryIdCol, idCol), "left")
      .select(col(queryIdCol), col(idCol),
        coalesce(col("xenc_e9"), lit(0L)).as("xenc_e9"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("xenc_e9").desc, col(idCol))
    full.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("xenc_e9"))
  }

  /** ColBERT-style LATE-INTERACTION re-rank (Khattab & Zaharia,
    * SIGIR'20) — the third member of the second-stage family next to
    * [[crossRerank]]: instead of one score per pair (cross-encoder) or
    * one vector per text (bi-encoder), every TOKEN keeps a vector and
    * score(q, d) = Σ_{i ∈ toks(q)} max_{j ∈ toks(d)} cos(vᵢ, vⱼ) —
    * each query token finds its best-matching document token and the
    * per-token maxima sum (MaxSim). Learned token embeddings stand in
    * as deterministic char-3-gram hashing-TF vectors at `dim`
    * (sub-3-char tokens are their own gram): morphology-sharing tokens
    * genuinely score high, so the matrix is soft — the INTERACTION
    * structure is the operator under test, and every arithmetic step
    * replays in the oracle. Each side is capped at its first `maxToks`
    * tokens, deduplicated (ColBERT's document truncation; Σ runs over
    * DISTINCT query tokens). A candidate with no tokens drops out.
    *
    * Determinism: cosine on raw integer-count gram vectors (the F1
    * bit-identical Spark/DuckDB pair), max is order-free, and the Σ
    * over query tokens runs in decimal(30,18) exactly like
    * [[PqIndex]]'s ADC sums — no float-order hazard in either engine.
    *
    * Scale shape — the two-stage contract at 100 TB: only the |Q|·k
    * candidate pairs are scored, the token matrix is ≤ maxToks² rows
    * per pair, the token-vector table covers only the query + candidate
    * token prefixes (never the corpus vocabulary), and the corpus is
    * not rescanned. Every rerank-side frame is therefore CORPUS-bounded
    * but |Q|-LINEAR: candidates are |Q|·k rows, the token prefixes and
    * their vectors ≤ |Q|·(k+1)·maxToks. `hintBroadcast` is the dial the
    * repo applies to every such frame (the GraphSearch.rankVisited
    * convention): ON (default) pins broadcast hash joins for the
    * request-scoped serving case — a re-rank batch of bounded |Q|,
    * where an unhinted plan would sort-merge kilobyte frames — and OFF
    * removes every hint for fleet-scale batches (|Q| ~ 10⁶ re-ranks),
    * where the token frames outgrow the broadcast limit and AQE must
    * pick join strategies from actual sizes. Both modes are
    * semantically identical (spec-pinned); PlanSpec's no-sort-merge
    * guard applies to the hinted mode only. */
  def maxSimRerank(candidates: DataFrame, queries: DataFrame,
      queryIdCol: String, queryTextCol: String, corpus: DataFrame,
      idCol: String, textCol: String, k: Int, dim: Int,
      maxToks: Int, hintBroadcast: Boolean = true): DataFrame = {
    def h(df: DataFrame): DataFrame = if (hintBroadcast) broadcast(df) else df
    def tokenPrefix(df: DataFrame, id: String, text: String) =
      df.select(col(id), explode(array_distinct(slice(
        TextFunctions.tokens(col(text)), 1, maxToks))).as("__t"))
    val cand = candidates.select(col(queryIdCol), col(idCol))
    val qt = tokenPrefix(queries, queryIdCol, queryTextCol)
    // candidate docs only: the corpus cuts to the bounded candidate set
    // BEFORE any tokenization
    val dt = tokenPrefix(
      corpus.join(cand.select(col(idCol)).distinct(), idCol), idCol, textCol)
    val grams = qt.select(col("__t")).unionAll(dt.select(col("__t"))).distinct()
      .select(col("__t"),
        explode(when(length(col("__t")) < 3, array(col("__t")))
          .otherwise(transform(sequence(lit(1), length(col("__t")) - 2),
            i => col("__t").substr(i, lit(3))))).as("__g"))
    val tv = grams
      .select(col("__t"),
        pmod(TextFunctions.tokenHash(col("__g")), lit(dim.toLong)).cast("int").as("__b"))
      .groupBy(col("__t"), col("__b")).agg(count(lit(1)).cast("double").as("__cnt"))
      .groupBy(col("__t"))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__cnt")))).as("__m"))
      .select(col("__t"), transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0.0d))).as("__v"))
    // tv covers only the query+candidate token prefixes — corpus-bounded
    // but |Q|-linear like every frame below, so each hint rides the dial
    val qtv = qt.join(h(tv), "__t")
      .select(col(queryIdCol), col("__t").as("__qt"), col("__v").as("__qv"))
    val dtv = dt.join(h(tv), "__t")
      .select(col(idCol), col("__v").as("__dv"))
    val mx = h(cand)
      .join(h(qtv), queryIdCol)
      .join(h(dtv), idCol)
      .groupBy(col(queryIdCol), col(idCol), col("__qt"))
      .agg(max(graft.functions.VectorFunctions.cosineSimilarity(
        col("__qv"), col("__dv"))).as("__mx"))
    val sc = mx.groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__mx").cast("decimal(30,18)")).cast("double").as("maxsim"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("maxsim").desc, col(idCol))
    sc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"),
        round(col("maxsim"), 6).as("maxsim"))
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

  /** Borda-count fusion — the all-integer alternative to [[fuse]]: a leg
    * awards `m + 1 − rank` points (0 when absent from its top-m), points
    * add, ties break on id. No score calibration, no floats anywhere —
    * the fusion a pipeline picks when the pinned ranking itself must be
    * integer-exact. Same plan shape as [[fuse]]. */
  def fuseBorda(a: DataFrame, b: DataFrame, queryIdCol: String, idCol: String,
      k: Int, m: Int): DataFrame = {
    val aa = a.select(col(queryIdCol), col(idCol), col("rank").as("__ra"))
    val bb = b.select(col(queryIdCol), col(idCol), col("rank").as("__rb"))
    val scored = aa.join(bb, Seq(queryIdCol, idCol), "full_outer")
      // greatest(0, …): a leg deeper than m must award 0 beyond its top-m,
      // exactly like an absent row — not NEGATIVE points that would rank a
      // two-leg document below a one-leg one
      .withColumn("borda_pts",
        (greatest(lit(0L), coalesce(lit(m.toLong) + 1L - col("__ra"), lit(0L))) +
          greatest(lit(0L), coalesce(lit(m.toLong) + 1L - col("__rb"), lit(0L))))
          .cast("long"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("borda_pts").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("borda_pts"))
  }
}
