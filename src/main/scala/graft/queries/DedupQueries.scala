package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.{Dedup, Embedder}
import DocSql.{toksCte, tokenHashSql}

/** Deduplication queries over `documents.parquet` (BASELINE.json north star).
  * Five distinct dedup families — exact content hash, inverted-index n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine — each replayed
  * exactly by the DuckDB oracle, constants included (the MinHash hash-family
  * parameters are interpolated from the same Scala values the operator
  * uses, so Spark and SQL cannot drift).
  *
  * Thresholds are tuned to the driver-planted near-dup structure: the sf0.01
  * corpus carries 25 pairs with 3-gram Jaccard ≥ 0.5 (max 0.989), which LSH
  * banding (8 bands × 2 rows) recovers in full.
  */
object DedupQueries extends graft.QueryModule {

  private val N = 3 // token shingle width
  private val MinJ = 0.5
  private val MaxHamming = 1
  private val MinCos = 0.95
  private val Dim = 64
  // near-dup pairs (cos ≥ 0.95 ⇒ ‖a−b‖ ≤ 0.316) sit ≈ 0.316/√64 ≈ 0.04
  // apart per projection — bucketLength 5× that keeps per-table recall high
  private val CosBucketLen = 0.2

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactAssign(Tables.documents(s, dir), "doc_id", "text")),
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardJoin(Tables.documents(s, dir), "doc_id", "text", N, MinJ)),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshJoin(Tables.documents(s, dir), "doc_id", "text", N, MinJ)),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")),
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", MaxHamming)),
    "dedup_embed_cos_pairs" -> ((s, dir) =>
      Dedup.cosinePairs(
        Embedder.hashTfEmbed(Tables.documents(s, dir), "doc_id", "text", Dim),
        "doc_id", "embedding", MinCos)),
    // The LSH-candidate scale path, oracle-gated next to the brute-force
    // verifier above: RpLsh's md5-derived planes make the candidate set
    // itself replayable in SQL. On THIS corpus (hashTF vectors are all
    // moderately similar, buckets run fat) brute force can win locally, but
    // the banded plan is the one that survives a 100× corpus — so the oracle
    // gate protects it, not just the verifier.
    "dedup_embed_cos_lsh" -> ((s, dir) =>
      Dedup.cosinePairsLsh(
        Embedder.hashTfEmbed(Tables.documents(s, dir), "doc_id", "text", Dim),
        "doc_id", "embedding", MinCos, Dim, CosBucketLen)))

  // ---- DuckDB mirrors -----------------------------------------------------

  private val sigExpr = "[" + (0 until Dedup.NumHashes).map { j =>
    s"list_min(list_transform(ghs, x -> (${Dedup.hashA(j)}*x + ${Dedup.hashB(j)}) % ${Dedup.MinhashP}))"
  }.mkString(", ") + "]"

  private val jaccardTail =
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |j AS (SELECT a_id, b_id, shared,
       |    round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
       |  FROM shared JOIN sizes sa ON a_id = sa.doc_id
       |  JOIN sizes sb ON b_id = sb.doc_id)
       |SELECT a_id, b_id, shared, jaccard FROM j WHERE jaccard >= $MinJ""".stripMargin

  private val simhashCte =
    s"""bs AS (SELECT doc_id, list_transform(generate_series(0, 31), i ->
       |    coalesce(list_sum(list_transform(toks, t ->
       |      CASE WHEN ((${tokenHashSql("t")} >> i) & 1) = 1
       |        THEN 1 ELSE -1 END)), 0)) AS sums
       |  FROM tokd),
       |sh AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(generate_series(0, 31),
       |    i -> CASE WHEN sums[i+1] > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)), 0) AS BIGINT) AS simhash
       |  FROM bs)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, md5(text) AS content_hash,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS rep_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""WITH $toksCte,
         |${DocSql.shinglesCte(N)},
         |ghj AS (SELECT doc_id, ${tokenHashSql("gram")} AS ghv FROM shd),
         |shared AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
         |  FROM ghj a JOIN ghj b ON a.ghv = b.ghv AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |$jaccardTail""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $toksCte,
         |${DocSql.shinglesCte(N)},
         |gh AS (SELECT doc_id, ${tokenHashSql("gram")} AS ghv FROM shd),
         |sigs AS (SELECT doc_id, $sigExpr AS sig
         |  FROM (SELECT doc_id, list(ghv) AS ghs FROM gh GROUP BY doc_id)),
         |bk AS (SELECT doc_id, unnest(list_transform(generate_series(0, ${Dedup.LshBands - 1}),
         |    k -> {'band': k, 'bh': (sig[k*2+1]*31 + sig[k*2+2]) % ${Dedup.MinhashP}})) AS u
         |  FROM sigs),
         |buckets AS (SELECT doc_id, u.band AS band, u.bh AS bh FROM bk),
         |cands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |shared AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
         |  FROM shd a JOIN shd b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |  JOIN cands c ON c.a_id = a.doc_id AND c.b_id = b.doc_id
         |  GROUP BY 1, 2),
         |$jaccardTail""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $toksCte,
         |$simhashCte
         |SELECT doc_id, simhash FROM sh""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""WITH $toksCte,
         |$simhashCte
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $MaxHamming""".stripMargin,
    "dedup_embed_cos_pairs" ->
      s"""WITH $toksCte,
         |${DocSql.embedCte(Dim)}
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(list_cosine_similarity(a.vec, b.vec), 6) AS cos_sim
         |FROM nv a JOIN nv b ON a.doc_id < b.doc_id
         |WHERE round(list_cosine_similarity(a.vec, b.vec), 6) >= $MinCos""".stripMargin,
    "dedup_embed_cos_lsh" ->
      s"""WITH $toksCte,
         |${DocSql.embedCte(Dim)},
         |bk AS (${graft.operators.RpLsh.bucketsSql("nv", "doc_id", "vec", Dim, CosBucketLen, 3)}),
         |cands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bk a JOIN bk b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |SELECT c.a_id, c.b_id,
         |  round(list_cosine_similarity(va.vec, vb.vec), 6) AS cos_sim
         |FROM cands c JOIN nv va ON va.doc_id = c.a_id
         |  JOIN nv vb ON vb.doc_id = c.b_id
         |WHERE round(list_cosine_similarity(va.vec, vb.vec), 6) >= $MinCos""".stripMargin)
}
