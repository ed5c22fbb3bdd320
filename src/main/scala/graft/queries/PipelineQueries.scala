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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_training_data" -> ((s, dir) => {
      val td = Pipeline.prepareTrainingData(Tables.documents(s, dir), "doc_id", "text", C)
      Tables.documents(s, dir).agg(count(lit(1)).as("n_docs_in"))
        .crossJoin(td.cleaned.agg(count(lit(1)).as("n_cleaned")))
        .crossJoin(td.kept.agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens_kept")))
        .crossJoin(td.chunks.agg(count(lit(1)).as("n_chunks")))
        .crossJoin(td.shards.select(col("grp"), col("shard_idx")).distinct()
          .agg(count(lit(1)).as("n_shards")))
    }))

  val oracles: Map[String, String] = Map(
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
         |      ELSE round(1.0 - coalesce(d.n_distinct, 0) * 1.0 / t.n_grams, 6)
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
         |    round(len(list_intersect(a.g, b.g)) * 1.0
         |      / (a.m + b.m - len(list_intersect(a.g, b.g))), 6) AS jaccard
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
