package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pipeline
import graft.io.Tables
import DocSql.toksCte

/** The composed training-data pipeline under one oracle
  * ([[graft.Pipeline.prepareTrainingData]]): quality filter → near-dup
  * cluster dedup → chunk → pack, pinned end to end by a single DuckDB
  * query assembled from the same CTE mirrors the stage-level queries use.
  * Gating the COMPOSITION matters beyond the stages: a threshold applied
  * to the wrong intermediate, a dedup run before cleaning, or a pack over
  * the un-deduped corpus all keep every stage green while this row turns
  * red. */
object PipelineQueries extends graft.QueryModule {

  private val C = Pipeline.TrainingConfig() // one source for both engines

  // pipeline_skills_for_jobs fixture split over documents: jobs embed their
  // text, skills carry lang as the dedup "level". Seed IVF quantizer +
  // probes < lists keeps every stage oracle-replayable while the recall
  // pins stay non-trivial (< 1).
  private val SfjDim = 64
  private val SfjK = 10
  private val SfjLists = 4
  private val SfjProbes = 2
  private val SfjCfg = Pipeline.Config(dim = SfjDim, k = SfjK,
    lists = SfjLists, nProbe = SfjProbes)

  /** Raw-crawl promotion size: the rank-weighted selection keeps the m
    * highest authority×quality pages. */
  private val RawCrawlM = 25

  /** One index build per (session, dir): entry point B with the seeded
    * quantizer; the memo carries (index path, centroid model). */
  private object SfjLayout {
    def ensure(s: SparkSession, dir: String): (String, graft.operators.IvfIndex.Model) =
      graft.Layouts.once(s, s"sfj:$dir") {
        val path = s"/tmp/graft_sfj/${graft.Layouts.tag(dir)}"
        val skills = Tables.documents(s, dir).filter(col("doc_id") >= 10)
          .select(col("doc_id").as("abbreviation"),
            col("text").as("level_description"), col("lang").as("level"))
        (path, Pipeline.buildIndex(skills, SfjCfg, path, seeded = true))
      }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The reference's entry point C as ONE row: Pipeline.skillsForJobs
    // (embed jobs → probe-pruned IVF search → recall + best-sim eval vs the
    // exact oracle → first-wins dedup → wide pivot) composed end to end and
    // pinned by a single oracle. The stages are individually green
    // elsewhere; this row goes red if the COMPOSITION drifts — a stage
    // reordered, an eval run against the wrong ranking, a pivot over the
    // un-deduped top-k. Checksums fold the pivot body: rank-weighted skill
    // ids and rank-weighted level hashes summed over all report cells.
    "pipeline_skills_for_jobs" -> ((s, dir) => {
      val (path, model) = SfjLayout.ensure(s, dir)
      val jobs = Tables.documents(s, dir).filter(col("doc_id") < 10)
        .select(col("doc_id").as("job_code"), col("text").as("gpt_job_description"))
      val res = Pipeline.skillsForJobs(s, jobs, path, model, SfjCfg)
      val skillSum = (0 until SfjK).map(i =>
        coalesce(col(s"skill$i"), lit(0L)) * lit((i + 1).toLong)).reduce(_ + _)
      val levelSum = (0 until SfjK).map(i =>
        coalesce(graft.functions.TextFunctions.tokenHash(col(s"level$i")), lit(0L))
          * lit((i + 1).toLong)).reduce(_ + _)
      res.report.agg(count(lit(1)).as("n_jobs"),
          sum(skillSum).as("skills_checksum"),
          sum(levelSum).as("levels_checksum"))
        .crossJoin(res.recall.select(col("avg_matches"), col("avg_recall")))
        .crossJoin(res.similarity.select(col("avg_avg_sim")))
    }),
    "pipeline_training_data" -> ((s, dir) => {
      val td = Pipeline.prepareTrainingData(Tables.documents(s, dir), "doc_id", "text", C)
      Tables.documents(s, dir).agg(count(lit(1)).as("n_docs_in"))
        .crossJoin(td.cleaned.agg(count(lit(1)).as("n_cleaned")))
        .crossJoin(td.kept.agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens_kept")))
        .crossJoin(td.chunks.agg(count(lit(1)).as("n_chunks")))
        .crossJoin(td.shards.select(col("grp"), col("shard_idx")).distinct()
          .agg(count(lit(1)).as("n_shards")))
    }),
    // The daily-crawl batch end to end (Pipeline.ingestCrawlBatch): Gopher
    // integer gate → CDC chunk-store probe against EVERYTHING already
    // ingested → quality score → top-m promotion. One row; red if a gate
    // is bypassed, the probe hits the wrong store, or the promotion reads
    // unfiltered docs.
    // The RAW-crawl pipeline in one pin — the round-19 capabilities
    // composed end to end over ONE fetched corpus: WARC records (with the
    // adversarial HTML wrapping each doc's escaped text PLUS the planted
    // anchor block) → Content-Length verification → state-machine text
    // extraction → Gopher word-count gate over the EXTRACTED tokens →
    // outlink extraction + canonicalization against each record's own
    // WARC-Target-URI → global frontier dedup → and (r14 verdict "next
    // round" #6: CONSUME the frontier) the CCNet/OpenWebText selection
    // shape — the parsed outlinks become the crawl graph, exact-e9
    // PageRank ranks every gated page, and the top-m promotion scores
    // authority × quality (pr_e9 × token count, all integer): gate →
    // rank-weighted select, replayed by the oracle through the same
    // power iterations. A torn record, a leaked HTTP header, an
    // extraction drift, a gate applied to the raw instead of extracted
    // tokens, a frontier URL that dodged canonicalization, or a
    // selection that ignored the authority prior all redden the single
    // row.
    "pipeline_raw_crawl" -> ((s, dir) => {
      val g = graft.functions.CleanFunctions.Gopher
      val path = graft.Layouts.once(s, s"rawcrawl:$dir") {
        val p = s"/tmp/graft_rawcrawl/${graft.Layouts.tag(dir)}"
        val (l1, l2, l3, d) = CleanQueries.plantedTargets(s, dir)
        val esc = CleanQueries.escapeHtml(col("text"))
        val html = concat(
          lit("<html><head><script>if (a<b) { x(); }</script></head><body><p>"),
          esc, lit("</p>"), CleanQueries.plantedAnchors(l1, l2, l3),
          lit("</body></html>"))
        graft.io.Warc.write(d, "doc_id", CleanQueries.plantedBase, html, p)
        p
      }
      val rec = graft.io.Warc.read(s, path)
      val body = graft.io.Warc.httpBody(col("payload"))
      val pages = rec.select(col("record_id").as("doc_id"), col("clen_ok"),
        graft.functions.CleanFunctions.htmlExtract(body).as("__t"),
        graft.functions.CleanFunctions.htmlOutlinks(body,
          col("target_uri")).as("__l"))
        .localCheckpoint() // ONE WARC scan + parse feeds all four legs
      val gated = pages
        .withColumn("__nt",
          size(graft.functions.TextFunctions.tokens(col("__t"))).cast("long"))
        .filter(col("__nt") >= g.MinToks && col("__nt") <= g.MaxToks)
        .localCheckpoint() // shared by the census, the graph, and the select
      // the crawl graph: gated pages → their canonical outlink targets
      val edges = gated
        .select(col("doc_id").as("src"), explode(col("__l")).as("__u"))
        .select(col("src"),
          regexp_extract(col("__u"), "doc/([0-9]+)", 1).cast("long").as("dst"))
        .distinct()
      val pr = graft.operators.PageRank.pagerank(edges,
        CleanQueries.CrawlPrIters)
      // rank-weighted selection: authority prior × quality proxy, exact
      // integers; top-m via TakeOrdered (never a global window), ranks
      // materialized over the m survivors only
      val scored = gated.select(col("doc_id"), col("__nt"))
        .join(pr, col("doc_id") === col("id"))
        .select(col("doc_id"), (col("__nt") * col("pr_e9")).as("__score"))
      val topM = scored.orderBy(col("__score").desc, col("doc_id"))
        .limit(RawCrawlM)
      val sel = topM.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__score").desc, col("doc_id"))).cast("long"))
      pages.agg(count(lit(1)).as("n_fetched"),
          sum(when(col("clen_ok"), 1L).otherwise(0L)).as("n_clen_ok"))
        .crossJoin(gated.agg(count(lit(1)).as("n_gated"),
          sum(graft.functions.TextFunctions.tokenHash(col("__t")))
            .as("text_checksum")))
        .crossJoin(gated.select(explode(col("__l")).as("__u")).distinct()
          .agg(count(lit(1)).as("frontier_size")))
        .crossJoin(sel.agg(count(lit(1)).as("n_selected"),
          coalesce(sum(col("rank") * col("doc_id")), lit(0L)).cast("long")
            .as("sel_checksum")))
    }),
    "pipeline_crawl_ingest" -> ((s, dir) => {
      val batch = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
      val r = Pipeline.ingestCrawlBatch(s,
        DedupQueries.CdcLayout.ensure(s, dir), batch, "doc_id", "text")
      batch.agg(count(lit(1)).as("n_batch"))
        .crossJoin(r.gated.agg(count(lit(1)).as("n_gated")))
        .crossJoin(r.fresh.agg(count(lit(1)).as("n_fresh")))
        .crossJoin(r.scored.agg(
          ER.roundDiv(sum(col("q_e6")), count(lit(1))).as("mean_q_e6")))
        .crossJoin(r.selected.agg(count(lit(1)).as("n_selected"),
          coalesce(sum(col("rank") * col("doc_id")), lit(0L)).cast("long")
            .as("sel_checksum")))
    }))

  private def ER = graft.functions.ExactRound

  private lazy val crawlIngestSql: String = {
    val enIn = graft.functions.TextFunctions.langWords.head._2
      .map(w => s"'$w'").mkString("(", ", ", ")")
    val ic = Pipeline.IngestConfig()
    val qual = DocSql.qualitySql("f.toks", "d.text")
    s"""WITH ${DedupQueries.cdcChunkCtesWhere("TRUE")},
       |b AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0),
       |g0 AS (SELECT tokd.doc_id, tokd.toks,
       |    CAST(len(toks) AS BIGINT) AS nt,
       |    CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS ch,
       |    CAST(len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT) AS al,
       |    CAST(len(list_filter(toks, t -> t IN $enIn)) AS BIGINT) AS st
       |  FROM tokd JOIN b USING (doc_id)),
       |gated AS (SELECT doc_id, toks FROM g0
       |  WHERE nt >= ${graft.functions.CleanFunctions.Gopher.MinToks}
       |    AND nt <= ${graft.functions.CleanFunctions.Gopher.MaxToks}
       |    AND ch >= nt * 3 AND ch <= nt * 10
       |    AND al * 5 >= nt * 4 AND st >= 2),
       |base AS (SELECT DISTINCT chunk_hash FROM chk WHERE doc_id % 10 <> 0),
       |dch AS (SELECT chk.doc_id, chk.chunk_hash, chk.n_tokens
       |  FROM chk JOIN gated USING (doc_id)),
       |kn AS (SELECT dch.doc_id,
       |    CAST(sum(dch.n_tokens) AS BIGINT) AS tt,
       |    CAST(coalesce(sum(CASE WHEN base.chunk_hash IS NOT NULL THEN dch.n_tokens END), 0) AS BIGINT) AS kt
       |  FROM dch LEFT JOIN base USING (chunk_hash) GROUP BY 1),
       |fresh AS (SELECT gated.doc_id, gated.toks FROM gated JOIN kn USING (doc_id)
       |  WHERE kn.kt * 100 <= kn.tt * ${ic.maxKnownPct}),
       |q AS (SELECT f.doc_id, ${ER.e6Sql(qual)} AS q_e6
       |  FROM fresh f JOIN documents d USING (doc_id)),
       |r AS (SELECT doc_id, q_e6,
       |    CAST(row_number() OVER (ORDER BY q_e6 DESC, doc_id) AS BIGINT) AS rank
       |  FROM q),
       |sel AS (SELECT * FROM r WHERE rank <= ${ic.m}),
       |c1 AS (SELECT count(*) AS n_batch FROM b),
       |c2 AS (SELECT count(*) AS n_gated FROM gated),
       |c3 AS (SELECT count(*) AS n_fresh FROM fresh),
       |c4 AS (SELECT ${ER.roundDivSql("sum(q_e6)", "count(*)")} AS mean_q_e6 FROM q),
       |c5 AS (SELECT count(*) AS n_selected,
       |    CAST(coalesce(sum(rank * doc_id), 0) AS BIGINT) AS sel_checksum FROM sel)
       |SELECT c1.n_batch, c2.n_gated, c3.n_fresh, c4.mean_q_e6,
       |  c5.n_selected, c5.sel_checksum
       |FROM c1, c2, c3, c4, c5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "pipeline_crawl_ingest" -> crawlIngestSql,
    // Every number replayed from the source table: the expected extracted
    // text is the whitespace-collapsed doc text plus the six visible
    // anchor tokens; the gate runs on THOSE tokens; the frontier is the
    // planted-target image over the gated slice, deduplicated globally;
    // the selection leg replays the SAME exact-e9 power iterations over
    // the gated crawl graph and promotes the top-m by authority×quality.
    "pipeline_raw_crawl" -> {
      val g = graft.functions.CleanFunctions.Gopher
      s"""WITH nn0 AS (SELECT count(*) AS n FROM documents),
         |x AS (SELECT doc_id,
         |    trim(regexp_replace(text, '\\s+', ' ', 'g')) || ' a b c m dup j' AS xt
         |  FROM documents),
         |x2 AS (SELECT doc_id, xt,
         |    len(list_filter(string_split_regex(lower(xt), '\\s+'),
         |      t -> t <> '')) AS nt
         |  FROM x),
         |g AS (SELECT doc_id, xt, CAST(nt AS BIGINT) AS nt FROM x2
         |  WHERE nt >= ${g.MinToks} AND nt <= ${g.MaxToks}),
         |d AS (SELECT g.doc_id,
         |    'http://ex.org/doc/' || CAST((doc_id*3)%n AS VARCHAR) AS l1,
         |    'http://ex.org/doc/' || CAST((doc_id*7)%n AS VARCHAR) || '?q=a&b' AS l2,
         |    'http://ex.org/doc/' || CAST((doc_id*11)%n AS VARCHAR) AS l3
         |  FROM g, nn0),
         |fr AS (SELECT DISTINCT u FROM (SELECT l1 AS u FROM d
         |  UNION ALL SELECT l2 FROM d UNION ALL SELECT l3 FROM d) z),
         |e AS (SELECT DISTINCT src, dst FROM (
         |    SELECT g.doc_id AS src, (g.doc_id*3)%n AS dst FROM g, nn0
         |    UNION ALL SELECT g.doc_id, (g.doc_id*7)%n FROM g, nn0
         |    UNION ALL SELECT g.doc_id, (g.doc_id*11)%n FROM g, nn0) u),
         |pr AS (WITH ${graft.operators.PageRank.pagerankRoundsSql(
                  CleanQueries.CrawlPrIters, 85, "doc_id")}),
         |sc AS (SELECT g.doc_id, g.nt * pr.pr_e9 AS score
         |  FROM g JOIN pr USING (doc_id)),
         |r AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         |      AS rank
         |  FROM sc),
         |sel AS (SELECT * FROM r WHERE rank <= $RawCrawlM)
         |SELECT (SELECT count(*) FROM documents) AS n_fetched,
         |  (SELECT count(*) FROM documents) AS n_clen_ok,
         |  (SELECT count(*) FROM g) AS n_gated,
         |  (SELECT CAST(sum(${DocSql.tokenHashSql("xt")}) AS BIGINT) FROM g)
         |    AS text_checksum,
         |  (SELECT count(*) FROM fr) AS frontier_size,
         |  (SELECT count(*) FROM sel) AS n_selected,
         |  (SELECT CAST(coalesce(sum(rank * doc_id), 0) AS BIGINT) FROM sel)
         |    AS sel_checksum""".stripMargin
    },
    // Entry point C replayed whole: hashTF embed → seed centroids → assign →
    // probe 2 of 4 → ANN ranking; exact ranking; recall + best-sim eval;
    // K×10-overfetch first-wins dedup by level; rank-weighted pivot
    // checksums. Assembled from the same CTE mirrors the stage queries pin.
    "pipeline_skills_for_jobs" ->
      s"""WITH ${DocSql.toksCte},
         |${DocSql.embedCte(SfjDim)},
         |qv AS (SELECT doc_id AS job_id, vec AS qvec FROM nv WHERE doc_id < 10),
         |sk AS (SELECT n.doc_id AS skill_id, n.vec AS svec, d.lang AS level
         |  FROM nv n JOIN documents d USING (doc_id) WHERE n.doc_id >= 10),
         |cent AS (SELECT CAST(row_number() OVER (ORDER BY skill_id) AS INT) - 1 AS list_id,
         |    svec AS centroid
         |  FROM (SELECT skill_id, svec FROM sk ORDER BY skill_id LIMIT $SfjLists)),
         |asg AS (SELECT skill_id, svec, level, list_id FROM (
         |    SELECT s.skill_id, s.svec, s.level, cent.list_id,
         |      row_number() OVER (PARTITION BY s.skill_id
         |        ORDER BY 1.0 - list_cosine_similarity(s.svec, cent.centroid), cent.list_id) AS pick
         |    FROM sk s CROSS JOIN cent) WHERE pick = 1),
         |pr AS (SELECT job_id, qvec, list_id FROM (
         |    SELECT q.job_id, q.qvec, cent.list_id,
         |      row_number() OVER (PARTITION BY q.job_id
         |        ORDER BY 1.0 - list_cosine_similarity(q.qvec, cent.centroid), cent.list_id) AS pick
         |    FROM qv q CROSS JOIN cent) WHERE pick <= $SfjProbes),
         |annr AS (SELECT job_id, skill_id FROM (
         |    SELECT pr.job_id, a.skill_id,
         |      row_number() OVER (PARTITION BY pr.job_id
         |        ORDER BY 1.0 - list_cosine_similarity(pr.qvec, a.svec), a.skill_id) AS rank
         |    FROM pr JOIN asg a USING (list_id)) WHERE rank <= $SfjK),
         |exd AS (SELECT q.job_id, s.skill_id, s.level,
         |    1.0 - list_cosine_similarity(q.qvec, s.svec) AS dist
         |  FROM qv q CROSS JOIN sk s),
         |exr AS (SELECT job_id, skill_id,
         |    CAST(row_number() OVER (PARTITION BY job_id ORDER BY dist, skill_id) AS BIGINT) AS rank
         |  FROM exd QUALIFY rank <= $SfjK),
         |mt AS (SELECT a.job_id, count(*) AS n FROM annr a
         |    JOIN exr o ON a.job_id = o.job_id AND a.skill_id = o.skill_id
         |    GROUP BY 1),
         |perq AS (SELECT q2.job_id,
         |    CAST(coalesce(mt.n, 0) AS BIGINT) AS n_matches,
         |    ${ER.ratioRound6IntSql("coalesce(mt.n, 0)", 0, s"$SfjK")} AS recall
         |  FROM (SELECT DISTINCT job_id FROM exr) q2 LEFT JOIN mt USING (job_id)),
         |hv AS (SELECT h.job_id, s.svec FROM annr h JOIN sk s USING (skill_id)),
         |best AS (SELECT r.job_id, s.svec AS bvec
         |    FROM (SELECT job_id, skill_id FROM exr WHERE rank = 1) r
         |    JOIN sk s USING (skill_id)),
         |perqs AS (SELECT hv.job_id,
         |    round(avg(list_cosine_similarity(hv.svec, b.bvec)), 6) AS avg_sim
         |  FROM hv JOIN best b ON hv.job_id = b.job_id GROUP BY hv.job_id),
         |over_r AS (SELECT *, row_number() OVER (PARTITION BY job_id
         |      ORDER BY dist, skill_id) AS rank0 FROM exd),
         |capped AS (SELECT * FROM over_r WHERE rank0 <= ${SfjK * 10}),
         |firsts AS (SELECT *, row_number() OVER (PARTITION BY job_id, level
         |      ORDER BY rank0) AS pick FROM capped),
         |rr AS (SELECT job_id, skill_id, level,
         |    row_number() OVER (PARTITION BY job_id ORDER BY rank0) AS rank
         |    FROM firsts WHERE pick = 1 QUALIFY rank <= $SfjK)
         |SELECT
         |  (SELECT count(DISTINCT job_id) FROM rr) AS n_jobs,
         |  (SELECT CAST(sum(rank * skill_id) AS BIGINT) FROM rr) AS skills_checksum,
         |  (SELECT CAST(sum(rank * coalesce(${DocSql.tokenHashSql("level")}, 0)) AS BIGINT)
         |    FROM rr) AS levels_checksum,
         |  (SELECT ${ER.ratioRound6IntSql(s"sum(${ER.e6Sql("n_matches")})", 6, "count(*)")}
         |    FROM perq) AS avg_matches,
         |  (SELECT ${ER.ratioRound6IntSql(s"sum(${ER.e6Sql("recall")})", 6, "count(*)")}
         |    FROM perq) AS avg_recall,
         |  (SELECT ${ER.ratioRound6IntSql(s"sum(${ER.e6Sql("avg_sim")})", 6, "count(*)")}
         |    FROM perqs) AS avg_avg_sim""".stripMargin,
    "pipeline_training_data" ->
      s"""WITH RECURSIVE $toksCte,
         |${DocSql.shingleHashCte(C.gramN)},
         |tot AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(CASE WHEN len(toks) >= ${C.gramN} THEN len(toks) - ${C.gramN - 1}
         |      ELSE 0 END AS BIGINT) AS n_grams
         |  FROM tokd),
         |dis AS (SELECT doc_id, count(*) AS n_distinct FROM shd GROUP BY 1),
         |cleaned AS (SELECT t.doc_id, t.n_tokens
         |  FROM tot t LEFT JOIN dis d USING (doc_id)
         |  WHERE t.n_tokens >= ${C.minTokens}
         |    AND (CASE WHEN t.n_grams = 0 THEN 0.0
         |      ELSE ${graft.functions.ExactRound.ratioRound6IntSql(
                  "t.n_grams - coalesce(d.n_distinct, 0)", 0, "t.n_grams")}
         |      END) <= ${C.maxRepRatio}),
         |csh AS (SELECT shd.doc_id, shd.ghv FROM shd JOIN cleaned USING (doc_id)),
         |dfc AS (SELECT ghv, count(*) AS df FROM csh GROUP BY 1),
         |pf AS (SELECT doc_id, ghv FROM (
         |    SELECT g.doc_id, g.ghv,
         |      row_number() OVER (PARTITION BY g.doc_id ORDER BY dfc.df, g.ghv) AS r,
         |      count(*) OVER (PARTITION BY g.doc_id) AS m
         |    FROM csh g JOIN dfc USING (ghv))
         |  WHERE r <= m - ceil(${C.minJaccard} * m) + 1),
         |cands AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM pf a JOIN pf b ON a.ghv = b.ghv AND a.doc_id < b.doc_id),
         |gl AS (SELECT doc_id, list(ghv) AS g, count(*) AS m FROM csh GROUP BY 1),
         |jj AS (SELECT c.a_id, c.b_id,
         |    ${graft.functions.ExactRound.ratioRound6IntSql(
              "len(list_intersect(a.g, b.g))", 0,
              "a.m + b.m - len(list_intersect(a.g, b.g))")} AS jaccard
         |  FROM cands c JOIN gl a ON c.a_id = a.doc_id JOIN gl b ON c.b_id = b.doc_id),
         |pairs AS (SELECT DISTINCT a_id, b_id FROM jj WHERE jaccard >= ${C.minJaccard}),
         |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |  UNION ALL SELECT b_id, a_id FROM pairs),
         |reach(id, x) AS (
         |  SELECT doc_id, doc_id FROM cleaned
         |  UNION
         |  SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.x),
         |cl AS (SELECT id AS doc_id, min(x) AS cluster_id FROM reach GROUP BY 1),
         |kept AS (SELECT c.doc_id, cleaned.n_tokens
         |  FROM cl c JOIN cleaned USING (doc_id) WHERE c.doc_id = c.cluster_id),
         |packed AS (SELECT DISTINCT doc_id % ${C.packGroups} AS grp,
         |    (sum(n_tokens) OVER (PARTITION BY doc_id % ${C.packGroups} ORDER BY doc_id)
         |      - n_tokens) // ${C.packBudget} AS shard_idx
         |  FROM kept)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_docs_in,
         |  (SELECT count(*) FROM cleaned) AS n_cleaned,
         |  (SELECT count(*) FROM kept) AS n_kept,
         |  (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM kept) AS n_tokens_kept,
         |  (SELECT CAST(coalesce(sum(((n_tokens - 1) // ${C.stride}) + 1), 0) AS BIGINT)
         |    FROM kept) AS n_chunks,
         |  (SELECT count(*) FROM packed) AS n_shards""".stripMargin)
}
