package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{Cosine, Metric}

/** Graph-based ANN: greedy BEAM SEARCH over a precomputed similarity graph
  * — the navigable-small-world retrieval family (Malkov & Yashunin's HNSW
  * is the hierarchical refinement; this is the flat NSW walk), rebuilt on
  * the kNN edge list the graph-census queries already maintain.
  *
  * Search state is two keyed frames — frontier and visited, both
  * (query, node) — advanced a fixed number of hops:
  *
  *   frontier ⋈ edges → candidate neighbors (keyed equi-join on the node)
  *   minus visited (keyed anti-join)
  *   score vs the broadcast query vectors, keep the best `beam` per query
  *   (bounded per-query window), fold into visited.
  *
  * Per hop that is O(|frontier|·avg-degree) keyed work — never a corpus
  * scan: at 100 TB the vectors are probed by id (the vector table join
  * prunes to the candidate ids), the walk touches hops·beam·degree nodes
  * per query, and the graph itself is the one big artifact — maintained
  * incrementally like the other stored indexes. Everything is
  * deterministic (distance ties break by node id; fixed entry point =
  * min corpus id), so the DuckDB oracle replays the walk hop for hop.
  * Frames are `localCheckpoint`ed per hop like the CC loops.
  */
object GraphSearch {

  /** Beam search `queries` against `corpus` over symmetric `edges`
    * (src, dst). Output: (qId, cId, rank, dist) — top-`k` of the VISITED
    * set by exact metric distance, rank 1..k. */
  def beamSearch(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, edges: DataFrame,
      hops: Int, beam: Int, k: Int, metric: Metric = Cosine,
      entries: Option[DataFrame] = None): DataFrame =
    beamSearchAtStages(queries, qId, qVec, corpus, cId, cVec, edges,
      Seq(hops), beam, k, metric, entries).drop("hops")

  /** [[beamSearch]] evaluated at several depths in ONE walk: because the
    * walk is deterministic, an h-hop search IS the prefix of the deepest
    * search — so the curve costs one walk of max(stages) hops, and each
    * stage's ranking reads the visited-set prefix. Output adds a `hops`
    * column. The tuning dial a deployment reads to set walk depth (the
    * probe-count curve's graph sibling).
    *
    * `entries` optionally supplies PER-QUERY entry points — a (qId, cId)
    * frame, several rows per query allowed (the hierarchy layer's entry
    * selection); absent, every query enters at the min corpus id. */
  def beamSearchAtStages(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, edges: DataFrame,
      stages: Seq[Int], beam: Int, k: Int,
      metric: Metric = Cosine, entries: Option[DataFrame] = None,
      rankPred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(stages.nonEmpty && stages.forall(_ >= 1) && beam >= 1 && k >= 1)
    // A duplicated depth would silently duplicate that stage's ranked rows
    // in the unioned output.
    require(stages.distinct.size == stages.size,
      s"beamSearchAtStages: duplicate depths in $stages")
    val frontiers = walkFrontiers(queries, qId, qVec, corpus, cId, cVec,
      edges, stages.max, beam, metric, entries)
    // `rankPred` = filtered-ANN semantics: the WALK above traverses the
    // FULL graph (pruning edges by a predicate can disconnect it — the
    // classic filtered-graph-search failure), and only the final ranking
    // restricts to visited nodes satisfying the predicate ([[rankVisited]],
    // the ONE ranking tail — each depth's visited prefix rides the same
    // broadcast-pinned bounded join).
    stages.map { h =>
      val vh = frontiers.take(h + 1).reduce(_ unionAll _)
      rankVisited(vh, queries, qId, qVec, corpus, cId, cVec, k, metric,
        rankPred).withColumn("hops", lit(h.toLong))
    }.reduce(_ unionAll _)
  }

  /** The walk itself — hop frontiers f0..f`hops`, each localCheckpointed —
    * extracted so rankings of the SAME traversal (staged depths, the
    * filtered/unfiltered stored twins) share one walk. Returned element i
    * is hop i's frontier; the visited set at depth h is the union of the
    * first h+1. */
  private[operators] def walkFrontiers(queries: DataFrame, qId: String,
      qVec: String, corpus: DataFrame, cId: String, cVec: String,
      edges: DataFrame, hops: Int, beam: Int, metric: Metric,
      entries: Option[DataFrame]): Vector[DataFrame] = {
    val q = broadcast(queries.select(col(qId).as("__qid"),
      col(qVec).as("__qv")))
    val vecs = corpus.select(col(cId).cast("long").as("__vid"),
      col(cVec).as("__cv"))
    // Materialize the edge list ONCE per walk (r17, guide §1.2 step 1):
    // every hop equi-joins `e`, and a lazy `edges` plan re-executes per
    // hop — for the hierarchical walk the upper-layer edges are a brute
    // O(|layer|²) kNN build, so a 3-hop coarse walk paid the quadratic
    // candidate stage three more times (measured: 4×9-24 task-sec
    // duplicate 32-task stages inside eval_graph_hier_recall). The frame
    // is |E| (src, dst) longs — index-sized, the same class the walk
    // already checkpoints per hop.
    val e = edges.select(col("src").cast("long").as("__node"),
      col("dst").cast("long").as("__dst")).localCheckpoint()
    val entry = corpus.agg(min(col(cId)).cast("long").as("__node"))
    val f0 = (entries match {
      case Some(ent) => ent.select(col(qId).as("__qid"),
        col(cId).cast("long").as("__node"))
      case None => q.select(col("__qid")).crossJoin(broadcast(entry))
    }).localCheckpoint()
    // Per-hop frontier partitioning proportional to the query fleet: a
    // frontier carries ≤ |Q|·beam rows per hop, so the NQ=20 fixture packs
    // into one block (minimal per-hop task overhead), while a 10⁵-query
    // production batch spreads across the cluster instead of serializing
    // every hop through a single partition. |Q| comes from counting the
    // ALREADY-materialized entry checkpoint (reads cached blocks — no
    // second scan of the query table; with explicit entries the count is
    // |Q|·nEntries, a harmless overestimate of the partition target).
    val fParts = frontierPartitions(f0.count(), beam,
      queries.sparkSession.sparkContext.defaultParallelism)
    var frontiers = Vector(f0)
    def visited = frontiers.reduce(_ unionAll _)
    for (_ <- 1 to hops)
      frontiers :+= hopFrame(frontiers.last, visited, e, vecs, q, beam,
        metric, fParts).localCheckpoint()
    frontiers
  }

  /** ONE hop's frame — [[walkFrontiers]]' loop body, extracted so the
    * plan-dump diagnostic below explains EXACTLY the plan the loop runs
    * (a committed query dump only shows ExistingRDD leaves because every
    * hop is localCheckpointed).
    *
    * r16 hop shape (guide §2.4 — remove shuffles outright): the old hop
    * paid THREE exchanges — distinct() on (qid, node), the anti-join's
    * re-shuffle, and the per-query row_number window. Candidate rows per
    * (query, hop) are bounded by beam·degree (walk parameters, not
    * corpus size), so the whole rank-and-trim collapses into ONE keyed
    * aggregation: collect the (dist, node) structs per query, sort,
    * array_distinct (duplicate (qid, node) candidates carry bit-equal
    * dist → equal structs, so dedup-after-sort ≡ the old
    * distinct-before-score), slice to beam. Ties still break (dist,
    * node) — identical rows to the window form, pinned by
    * GraphSearchSpec and the unchanged hop-for-hop DuckDB oracle. */
  private def hopFrame(frontier: DataFrame, visited: DataFrame,
      e: DataFrame, vecs: DataFrame, q: DataFrame, beam: Int,
      metric: Metric, fParts: Int): DataFrame = {
    val cand = frontier.join(e, "__node")
      .select(col("__qid"), col("__dst").as("__node"))
      .join(visited, Seq("__qid", "__node"), "left_anti")
    val scored = cand
      .join(vecs, col("__node") === col("__vid"))
      .join(q, "__qid")
      .select(col("__qid"), col("__node"),
        metric.dist(col("__qv"), col("__cv")).as("__d"))
    scored
      .groupBy(col("__qid"))
      .agg(slice(array_distinct(array_sort(collect_list(
        struct(col("__d"), col("__node"))))), 1, beam).as("__top"))
      .select(col("__qid"), explode(col("__top")).as("__m"))
      .select(col("__qid"), col("__m.__node").as("__node"))
      .coalesce(fParts)
  }

  /** Diagnostic ONLY (r16/r17 verdict evidence discipline: "commit a
    * single-iteration plan dump that actually shows the exchange/operator
    * change"): hop 1 of a walk, UNCHECKPOINTED, so `.explain` exposes the
    * hop interior. Shares [[hopFrame]] with the real loop — the dumped
    * plan cannot drift from what the walk executes. Never a query path. */
  private[graft] def oneHopForExplain(queries: DataFrame, qId: String,
      qVec: String, corpus: DataFrame, cId: String, cVec: String,
      edges: DataFrame, beam: Int, metric: Metric = Cosine): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("__qid"),
      col(qVec).as("__qv")))
    val vecs = corpus.select(col(cId).cast("long").as("__vid"),
      col(cVec).as("__cv"))
    val e = edges.select(col("src").cast("long").as("__node"),
      col("dst").cast("long").as("__dst")).localCheckpoint()
    val entry = corpus.agg(min(col(cId)).cast("long").as("__node"))
    val f0 = q.select(col("__qid")).crossJoin(broadcast(entry))
      .localCheckpoint()
    val fParts = frontierPartitions(f0.count(), beam,
      queries.sparkSession.sparkContext.defaultParallelism)
    hopFrame(f0, f0, e, vecs, q, beam, metric, fParts)
  }

  /** The visited set of one stored-graph walk — (`qId`, `__node`) rows —
    * for consumers that rank the SAME traversal several ways (the
    * filtered/unfiltered stored twins): the walk is the expensive part
    * (hops sequential rounds), the ranking a cheap bounded join, so
    * twins memoize this frame and pay one traversal. Filtered-ANN over
    * the stored graph ([[SimilaritySearch.topKFilteredIvf]]'s graph-tier
    * sibling — filtered HNSW in the vector stores) IS the composition
    * `rankVisited(visitedStored(...), ..., pred = Some(...))`: the walk
    * traverses the FULL graph (predicate-pruned edges would disconnect
    * it and strand whole filtered regions, the documented failure mode
    * of naive filtered graph search), and only the ranking restricts to
    * predicate-matching visited nodes. */
  def visitedStored(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, indexTable: String,
      hops: Int, beam: Int, metric: Metric = Cosine): DataFrame = {
    val edges = PageRank.symmetrize(
      queries.sparkSession.table(indexTable).select("src", "dst"))
    walkFrontiers(queries, qId, qVec, corpus, cId, cVec, edges, hops, beam,
      metric, None).reduce(_ unionAll _)
  }

  /** Exact top-`k` ranking over a walk's visited set, optionally
    * restricted to nodes satisfying `pred` (filtered-ANN semantics: the
    * traversal saw the full graph; only the ranking filters). The work is
    * a join of the bounded visited set against the corpus vectors —
    * O(|Q|·(1 + hops·beam)) rows, never a corpus scan. */
  def rankVisited(visited: DataFrame, queries: DataFrame, qId: String,
      qVec: String, corpus: DataFrame, cId: String, cVec: String, k: Int,
      metric: Metric = Cosine,
      pred: Option[org.apache.spark.sql.Column] = None,
      hintBroadcastVisited: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("__qid"),
      col(qVec).as("__qv")))
    val rc = pred.map(corpus.filter).getOrElse(corpus)
    val vecs = rc.select(col(cId).cast("long").as("__vid"),
      col(cVec).as("__cv"))
    // `hintBroadcastVisited` pins the visited set as the broadcast build
    // side so the corpus-vector join is a map-side lookup over the corpus
    // scan — right when the QUERY BATCH is bounded (the stored-serving
    // twins: visited is |Q|·(1 + hops·beam) rows and the corpus dwarfs
    // it; at tiny test SFs the optimizer inverts and broadcasts the
    // corpus, which PlanSpec forbids for that path). Left OFF for the
    // general walk path: |visited| grows linearly with the fleet, and a
    // 10⁶-query batch's visited set must be allowed to shuffle instead
    // of blowing the broadcast limit — there the optimizer/AQE pick by
    // actual sizes.
    val vh = if (hintBroadcastVisited) broadcast(visited) else visited
    val cands = vh
      .join(vecs, col("__node") === col("__vid"))
      .join(q, "__qid")
      .select(col("__qid").as(qId),
        metric.dist(col("__qv"), col("__cv")).as("dist"),
        col("__node").as("__cid"))
    KnnJoin.topkOfCandidates(cands, qId, cId, k, isString = false)
  }

  /** Frontier partition target for a walk: ~4096 (query, node) rows per
    * partition, ≥ 1, capped at the cluster's parallelism. */
  private[graft] def frontierPartitions(nQueries: Long, beam: Int,
      maxParallelism: Int): Int =
    math.max(1L, math.min(maxParallelism.toLong,
      nQueries * beam / 4096L + 1L)).toInt

  /** HNSW-style HIERARCHICAL search (Malkov & Yashunin, TPAMI'18 — the
    * log-layered refinement of the flat NSW walk; the reference's own
    * Milvus index is HNSW, `load_skill_vectors_milvus.py:53-68`): a
    * deterministic 1/`layerMod` node sample forms an upper layer with its
    * own kNN edge list; a cheap coarse walk over that small layer picks
    * per-query entry points, and the layer-0 beam search starts from them
    * instead of a fixed corner of the graph. This is what bounds walk
    * length at scale — the upper layer's diameter shrinks by the sample
    * rate, so a few coarse hops land the walker near its target and the
    * layer-0 budget is spent refining, not crossing the graph.
    *
    * Layer assignment hashes the node id ([[Sampling.hashBucket]] — md5,
    * so the oracle replays it); upper-layer edges are the same
    * [[PageRank.directedKnnEdges]] construction at `upperDegree`,
    * symmetrized. At 100 TB the upper layer is corpus/`layerMod` rows —
    * its edge build runs the same stored-ANN probe path as layer 0, and
    * the coarse walk touches `upperHops`·`upperBeam`·`upperDegree` nodes
    * per query. Everything stays deterministic, so the DuckDB oracle
    * replays both walks hop for hop ([[hierSearchCtes]]). */
  def hierarchicalSearch(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, edges: DataFrame,
      hops: Int, beam: Int, k: Int, layerMod: Int, upperDegree: Int,
      upperHops: Int, upperBeam: Int, nEntries: Int,
      metric: Metric = Cosine): DataFrame = {
    require(layerMod >= 2 && upperDegree >= 1 && nEntries >= 1)
    val upper = corpus
      .filter(Sampling.hashBucket(col(cId), layerMod) === 0L)
      .select(col(cId), col(cVec))
    val upperEdges = PageRank.symmetrize(
      PageRank.directedKnnEdges(upper, cId, cVec, upperDegree, metric))
    val entries = beamSearch(queries, qId, qVec, upper, cId, cVec,
      upperEdges, upperHops, upperBeam, nEntries, metric)
      .select(col(qId), col(cId))
    beamSearch(queries, qId, qVec, corpus, cId, cVec, edges, hops, beam, k,
      metric, entries = Some(entries))
  }

  /** The ANN-built layout's identity: the IVF model that generated the
    * build candidates and the probe width join degree + metric — an
    * append against a different quantizer or probe budget is a different
    * graph and must rebuild, exactly the [[IvfIndex.append]] invariant. */
  def graphAnnFingerprint(k: Int, model: IvfIndex.Model, nProbe: Int,
      metric: Metric): String =
    s"knngraph-ann|$metric|$k|${IvfIndex.modelFingerprint(model, metric)}|p$nProbe"

  /** ANN-candidate DIRECTED top-`k` edge build — the scale replacement
    * for [[PageRank.directedKnnEdges]]'s brute construction (the r8
    * verdict's one remaining quadratic-compute maintenance path):
    * candidates for each node are the corpus vectors sharing one of its
    * `nProbe` nearest IVF lists ([[IvfIndex.probeAssign]], a zero-shuffle
    * literal-centroid projection), exact-scored and bounded-heap top-k'd
    * per source. Compute is O(n · nProbe · avg-list) instead of O(n²);
    * the one shuffle is the list-keyed equi-join. The candidate side uses
    * the SINGLE-list assignment, so a (src, cand) pair meets at most once
    * and the heap never sees duplicates. Deterministic end to end (seed
    * quantizer + (dist, id) ties) — the DuckDB oracle replays the whole
    * construction ([[ivfEdgeCtesSql]]). A node whose true neighbor hides
    * in an unprobed list misses that edge; the stored-walk recall gate
    * (eval_graph_stored_recall's 0.9 floor) is what prices that
    * approximation. The brute form stays as the oracle twin for the
    * in-memory census graph ([[PageRank.directedKnnEdges]]). */
  def ivfCandidateEdges(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfIndex.Model, nProbe: Int,
      metric: Metric = Cosine): DataFrame = {
    val probes = IvfIndex.probeAssign(
      corpus.select(col(idCol).as("__src"), col(vecCol).as("__avec")),
      "__avec", model, nProbe, metric)
    val (keyCol, isString) = KnnJoin.keyColumn(corpus, idCol)
    val cands = IvfIndex.assign(
      corpus.select(keyCol, col(vecCol).as("__cvec")),
      "__cid", "__cvec", model, metric)
    val scored = probes.join(cands, "list_id")
      .filter(col("__cid") =!= col("__src"))
      .select(col("__src"),
        metric.dist(col("__avec"), col("__cvec")).as("dist"), col("__cid"))
    KnnJoin.topkOfCandidates(scored, "__src", "dst", k, isString)
      .select(col("__src").as("src"), col("dst"))
  }

  /** Persist the DIRECTED top-`k` edge list as a src-bucketed table — the
    * stored face of the graph tier (build once, walk many), the same
    * write-side contract as the LSH/PQ layouts: bucketed by the probe key,
    * fingerprint-stamped. Edges come from [[ivfCandidateEdges]] — the
    * stored tier's build must never pay the O(n²) brute construction. */
  def writeIndexIvf(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfIndex.Model, nProbe: Int, tableName: String,
      path: String, numBuckets: Int, metric: Metric = Cosine): Unit = {
    // a fresh build supersedes the path's delete history — including a
    // stale sibling backup from a CRASHED earlier compaction
    Tombstones.clearForRebuild(corpus.sparkSession, path)
    Bucketed.writeBucketedKeys(
      ivfCandidateEdges(corpus, idCol, vecCol, k, model, nProbe, metric),
      tableName, path, Seq("src"), numBuckets)
    graft.Layouts.stampFingerprint(corpus.sparkSession, tableName,
      graphAnnFingerprint(k, model, nProbe, metric))
  }

  /** The edge frame a beam-insert append writes: each delta node runs the
    * stored graph's own beam search (entry = min base id, the walk's
    * standard determinism) and keeps the exact top-`k` of its VISITED
    * set — Malkov & Yashunin's insert algorithm, O(Δ·hops·beam·degree)
    * compute instead of the old delta-broadcast full-corpus scan's
    * O(Δ·n). Candidates are exact-scored base vectors probed BY ID
    * through the walk's keyed joins; the corpus is never scanned per
    * delta row. Base nodes' stored lists stay as built (insert-only NSW
    * maintenance — the symmetric read view restores delta↔base
    * connectivity); the drift metrics schedule the rebuild. The delta
    * must be DISJOINT from the indexed base (the append contract every
    * layout here shares) — a node already in the graph would rank itself
    * at distance 0 and burn an edge slot on a self-loop. */
  def appendEdgesBeam(delta: DataFrame, baseCorpus: DataFrame,
      idCol: String, vecCol: String, k: Int, tableName: String, hops: Int,
      beam: Int, metric: Metric = Cosine): DataFrame = {
    val baseEdges = PageRank.symmetrize(
      delta.sparkSession.table(tableName).select("src", "dst"))
    beamSearch(
      delta.select(col(idCol).as("__did"), col(vecCol).as("__dvec")),
      "__did", "__dvec", baseCorpus, idCol, vecCol, baseEdges, hops, beam,
      k, metric)
      .select(col("__did").as("src"), col(idCol).as("dst"))
  }

  /** O(Δ·hops·beam·degree) append of [[appendEdgesBeam]]'s edges into a
    * [[writeIndexIvf]] layout, fingerprint-enforced like every other
    * appendable index. */
  def appendToIndexBeam(delta: DataFrame, baseCorpus: DataFrame,
      idCol: String, vecCol: String, k: Int, model: IvfIndex.Model,
      nProbe: Int, tableName: String, numBuckets: Int, hops: Int,
      beam: Int, metric: Metric = Cosine): Unit = {
    graft.Layouts.checkFingerprint(delta.sparkSession, tableName,
      graphAnnFingerprint(k, model, nProbe, metric), "graph append")
    Bucketed.appendBucketedKeys(
      appendEdgesBeam(delta, baseCorpus, idCol, vecCol, k, tableName,
        hops, beam, metric),
      tableName, Seq("src"), numBuckets)
  }

  /** DuckDB twin of [[ivfCandidateEdges]] (cosine, ties (dist, dst)):
    * seed centroids = the `lists` lowest-id rows of `corpusName`
    * (IvfIndex.fitSeeds), one shared ranking CTE feeds the single-list
    * assignment (pick = 1) and the `nProbe`-wide probe side, candidates
    * meet on list_id with self excluded, per-src top-`k`. Ends in
    * `${prefix}e0(src, dst)` — the ANN sibling of
    * [[PageRank.edgeCtesFromSql]]. */
  def ivfEdgeCtesSql(corpusName: String, idCol: String, vecCol: String,
      k: Int, lists: Int, nProbe: Int, prefix: String): String =
    s"""${prefix}cent AS (SELECT CAST(row_number() OVER (ORDER BY $idCol) AS INT) - 1 AS list_id,
       |    $vecCol AS centroid
       |  FROM (SELECT $idCol, $vecCol FROM $corpusName ORDER BY $idCol LIMIT $lists)),
       |${prefix}pk AS MATERIALIZED (SELECT t.$idCol, t.$vecCol, ${prefix}cent.list_id,
       |    row_number() OVER (PARTITION BY t.$idCol
       |      ORDER BY 1.0 - list_cosine_similarity(t.$vecCol, ${prefix}cent.centroid),
       |        ${prefix}cent.list_id) AS pick
       |  FROM $corpusName t CROSS JOIN ${prefix}cent),
       |${prefix}nd AS (SELECT p.$idCol AS src, a.$idCol AS dst,
       |      1.0 - list_cosine_similarity(p.$vecCol, a.$vecCol) AS dist
       |    FROM (SELECT * FROM ${prefix}pk WHERE pick <= $nProbe) p
       |    JOIN (SELECT * FROM ${prefix}pk WHERE pick = 1) a USING (list_id)
       |    WHERE a.$idCol <> p.$idCol),
       |${prefix}e0 AS (SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
       |    FROM ${prefix}nd) WHERE rn <= $k)""".stripMargin

  /** [[beamSearch]] over a stored ([[writeIndexIvf]] + appends) edge table:
    * the index supplies the (symmetrized) edges, the corpus frame supplies
    * vectors for scoring — identical walk semantics. */
  def beamSearchStored(queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String, indexTable: String,
      hops: Int, beam: Int, k: Int, metric: Metric = Cosine): DataFrame = {
    val edges = PageRank.symmetrize(
      queries.sparkSession.table(indexTable).select("src", "dst"))
    beamSearch(queries, qId, qVec, corpus, cId, cVec, edges, hops, beam, k,
      metric)
  }

  /** DuckDB twin: the walk unrolled hop for hop. `qCte`/`cCte` must define
    * q(job_id, qvec) and c(skill_id, svec) with DOUBLE[] vectors; the edge
    * CTEs mirror PageRank.directedKnnEdges + symmetrize at degree `gk`.
    * Ends in gtop(job_id, skill_id, rank, dist-unrounded). */
  def beamSearchCtes(qCte: String, cCte: String, gk: Int, hops: Int,
      beam: Int, k: Int): String =
    beamSearchCtesWithEdges(qCte, cCte,
      PageRank.edgeCtesSql("skill_id", "svec", gk) + ",\n" +
        "es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
      hops, beam, k)

  /** [[beamSearchCtes]] over a caller-supplied edge block (a CTE chain
    * ending in `es(src, dst)`, both directions present) — the stored/
    * appended-graph oracles substitute their own edge construction. */
  def beamSearchCtesWithEdges(qCte: String, cCte: String, esCtes: String,
      hops: Int, beam: Int, k: Int): String =
    walkCtes(qCte, cCte, esCtes, hops, beam) + ",\n" + rankTail(hops, k)

  /** The ranked-output tail over a walk's visited set v`h``walkSuffix`:
    * ends in gtop`suffix`(job_id, skill_id, rank, dist-unrounded), CTE
    * names suffixed so several depths can coexist (the hops curve);
    * `walkSuffix` points at a suffixed walk's visited set (the hierarchy's
    * upper layer). */
  def rankTail(h: Int, k: Int, suffix: String = "",
      walkSuffix: String = "", qName: String = "q",
      corpusName: String = "c"): String =
    s"""gsc$suffix AS (SELECT v.job_id, v.node AS skill_id,
       |    1.0 - list_cosine_similarity(q.qvec, cv.svec) AS dist
       |  FROM v$h$walkSuffix v JOIN $qName q ON q.job_id = v.job_id
       |  JOIN $corpusName cv ON cv.skill_id = v.node),
       |gtop$suffix AS (SELECT job_id, skill_id, CAST(rn AS BIGINT) AS rank, dist
       |  FROM (SELECT job_id, skill_id, dist,
       |      row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS rn
       |    FROM gsc$suffix) WHERE rn <= $k)""".stripMargin

  /** The walk itself, no ranking tail: head + every hop CTE, ending in
    * v`hops` (the visited set). */
  def walkCtes(qCte: String, cCte: String, esCtes: String,
      hops: Int, beam: Int): String =
    s"""$qCte, $cCte,
       |$esCtes,
       |${walkBodyCtes(hops, beam)}""".stripMargin

  /** The hop-CTE chain of one walk, without the q/c/edge heads — so two
    * walks (the hierarchy's upper + lower layers) can coexist in one
    * query. CTE names carry `suffix`; candidates expand over `esName`
    * (src, dst, both directions); scores and the default min-id entry read
    * `corpusName`(skill_id, svec); `v0Sql` overrides the entry frontier
    * with a caller-supplied (job_id, node) SELECT (per-query entries);
    * `qName` points at the walk's own (job_id, qvec) query CTE — the
    * beam-insert append oracle walks the DELTA as queries next to the
    * fleet's real `q` in one chain. */
  def walkBodyCtes(hops: Int, beam: Int, suffix: String = "",
      corpusName: String = "c", esName: String = "es",
      v0Sql: Option[String] = None, qName: String = "q"): String = {
    val head = v0Sql match {
      case Some(sql) =>
        s"""v0$suffix AS ($sql),
           |f0$suffix AS (SELECT * FROM v0$suffix)""".stripMargin
      case None =>
        s"""en$suffix AS (SELECT min(skill_id) AS node FROM $corpusName),
           |v0$suffix AS (SELECT q.job_id, en$suffix.node FROM $qName q CROSS JOIN en$suffix),
           |f0$suffix AS (SELECT * FROM v0$suffix)""".stripMargin
    }
    val hopCtes = (1 to hops).map { t =>
      s"""c$t$suffix AS MATERIALIZED (SELECT DISTINCT f${t - 1}$suffix.job_id, $esName.dst AS node
         |  FROM f${t - 1}$suffix JOIN $esName ON $esName.src = f${t - 1}$suffix.node),
         |a$t$suffix AS (SELECT cc.job_id, cc.node FROM c$t$suffix cc
         |  LEFT JOIN v${t - 1}$suffix v ON v.job_id = cc.job_id AND v.node = cc.node
         |  WHERE v.node IS NULL),
         |s$t$suffix AS (SELECT a.job_id, a.node,
         |    1.0 - list_cosine_similarity(q.qvec, cv.svec) AS d
         |  FROM a$t$suffix a JOIN $qName q ON q.job_id = a.job_id
         |  JOIN $corpusName cv ON cv.skill_id = a.node),
         |f$t$suffix AS MATERIALIZED (SELECT job_id, node FROM (
         |    SELECT job_id, node,
         |      row_number() OVER (PARTITION BY job_id ORDER BY d, node) AS rn
         |    FROM s$t$suffix) WHERE rn <= $beam),
         |v$t$suffix AS MATERIALIZED (SELECT * FROM v${t - 1}$suffix UNION ALL SELECT * FROM f$t$suffix)""".stripMargin
    }
    (Seq(head) ++ hopCtes).mkString(",\n")
  }

  /** DuckDB twin of [[hierarchicalSearch]]: upper-layer subset (md5 bucket
    * 0 of `layerMod`) → upper kNN edges at `upperDegree` → coarse walk →
    * top-`nEntries` entry selection → layer-0 walk from those entries →
    * ranked tail. Ends in gtop(job_id, skill_id, rank, dist-unrounded);
    * layer-0 edges come from the caller-supplied `esCtes` (ending in
    * `es`), mirroring the Scala signature. */
  def hierSearchCtesWithEdges(qCte: String, cCte: String, esCtes: String,
      layerMod: Int, upperDegree: Int, upperHops: Int, upperBeam: Int,
      nEntries: Int, hops: Int, beam: Int, k: Int): String = {
    val cu =
      s"""cu AS (SELECT skill_id, svec FROM c
         |  WHERE ('0x' || substr(md5(CAST(skill_id AS VARCHAR)), 1, 8))::BIGINT % $layerMod = 0)""".stripMargin
    val upperEdges =
      PageRank.edgeCtesFromSql("cu", "cu", "skill_id", "svec", upperDegree, "u") +
        ",\nues AS MATERIALIZED (SELECT src, dst FROM ue0 UNION SELECT dst, src FROM ue0)"
    val upperWalk = walkBodyCtes(upperHops, upperBeam, "u", "cu", "ues")
    val entryTail = rankTail(upperHops, nEntries, "u", "u")
    val lowerWalk = walkBodyCtes(hops, beam, "", "c", "es",
      Some("SELECT job_id, skill_id AS node FROM gtopu"))
    Seq(s"$qCte, $cCte", cu, upperEdges, upperWalk, entryTail, esCtes,
      lowerWalk, rankTail(hops, k)).mkString(",\n")
  }

  /** Exact-top-`k` + recall-summary SQL tail shared by the single-leg
    * walk recall gates (eval_graph_recall, eval_graph_stored_recall —
    * the hier gate's two-leg compare keeps its own form): requires
    * q(job_id, qvec) / c(skill_id, svec) CTEs and a ranked
    * `topCte`(job_id, skill_id); emits the exact ranking, per-query
    * match counts, and the final one-row summary SELECT with the
    * in-plan-mirrored floor column. ONE copy so the recall-metrology
    * contract (e6 integerization, ratio scales, the k denominator, the
    * DISTINCT query universe) cannot drift between gates. */
  def recallSummarySql(topCte: String, k: Int, floor: Double): String = {
    val er = graft.functions.ExactRound
    val e6 = (x: String) => er.e6Sql(x)
    val rr = (n: String, d: String) => er.ratioRound6IntSql(n, 6, d)
    s"""ed AS (SELECT q.job_id, c.skill_id,
       |    1.0 - list_cosine_similarity(q.qvec, c.svec) AS dist
       |  FROM q CROSS JOIN c),
       |etop AS (SELECT job_id, skill_id FROM (
       |    SELECT job_id, skill_id,
       |      row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS rn
       |    FROM ed) WHERE rn <= $k),
       |m AS (SELECT g.job_id, count(*) AS n FROM $topCte g
       |  JOIN etop e ON e.job_id = g.job_id AND e.skill_id = g.skill_id
       |  GROUP BY 1),
       |perq AS (SELECT q2.job_id, CAST(coalesce(m.n, 0) AS BIGINT) AS n_matches,
       |    ${er.ratioRound6IntSql("coalesce(m.n, 0)", 0, s"$k")} AS recall
       |  FROM (SELECT DISTINCT job_id FROM etop) q2 LEFT JOIN m USING (job_id))
       |SELECT ${rr(s"sum(${e6("n_matches")})", "count(*)")} AS avg_matches,
       |  ${rr(s"sum(${e6("recall")})", "count(*)")} AS avg_recall,
       |  count(*) AS n_queries,
       |  CAST($floor AS DOUBLE) AS min_recall,
       |  true AS recall_ok FROM perq""".stripMargin
  }

  /** [[hierSearchCtesWithEdges]] with the standard degree-`gk` layer-0
    * edge construction (the sibling of [[beamSearchCtes]]). */
  def hierSearchCtes(qCte: String, cCte: String, gk: Int, layerMod: Int,
      upperDegree: Int, upperHops: Int, upperBeam: Int, nEntries: Int,
      hops: Int, beam: Int, k: Int): String =
    hierSearchCtesWithEdges(qCte, cCte,
      PageRank.edgeCtesSql("skill_id", "svec", gk) + ",\n" +
        "es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
      layerMod, upperDegree, upperHops, upperBeam, nEntries, hops, beam, k)
}
