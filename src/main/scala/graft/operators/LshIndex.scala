package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.L2

/** X2 — random-projection LSH ANN search, the batch analog of the
  * reference's HNSW L2 index build + search (`load_skill_vectors_milvus.py:
  * 53-68`, `milvus_search:117-143`). An online graph index is out of scope
  * (BASELINE.json); a bucketed projection join gives the same contract —
  * approximate L2 neighbors with tunable recall — and only hash-colliding
  * pairs are ever compared, never |Q|×|C|.
  *
  * Planes come from [[RpLsh]] (md5-derived, constants shared with the DuckDB
  * oracle), so unlike the earlier MLlib BucketedRandomProjectionLSH build the
  * whole search result is hash-checkable cross-engine — the reference's own
  * methodology for every ANN backend (`skills_for_jobs.py:354-387`).
  */
object LshIndex {

  /** Approximate L2 top-k per query: bucket-collision candidates (AND over
    * `numPlanes` projections per table, OR over `numTables` hash tables) →
    * exact L2 on candidates only → bounded-heap top-k (shuffle
    * |Q|·k·partitions, same reduce shape as [[KnnJoin.exact]]). Corpus
    * buckets larger than `maxBucket` are dropped before the join
    * ([[Salt.capBuckets]]) — a constant-ish vector region otherwise feeds one
    * reducer |bucket|×|colliding queries| rows. Queries that collide with
    * nothing return no rows — the LSH contract. Ties break on (dist, id).
    * Output: (queryIdCol, idCol, rank, dist). */
  def annTopK(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int, dim: Int,
      bucketLength: Double, numTables: Int = 3, numPlanes: Int = 1,
      maxBucket: Long = Dedup.DefaultMaxBucket): DataFrame = {
    val qb = RpLsh.bucketize(queries, queryIdCol, queryVecCol, dim, bucketLength,
      numTables, numPlanes)
    val cb = Salt.capBuckets(
      RpLsh.bucketize(corpus, idCol, vecCol, dim, bucketLength, numTables, numPlanes),
      Seq("tbl", "bucket"), maxBucket)
    val candIds = qb.join(cb, Seq("tbl", "bucket"))
      .select(col(queryIdCol), col(idCol)).distinct()
    val (keyCol, isString) = KnnJoin.keyColumn(corpus, idCol)
    val qv = queries.select(col(queryIdCol), col(queryVecCol).as("__qvec"))
    val cv = corpus.select(keyCol, col(vecCol).as("__cvec"))
    val cands = candIds
      .join(broadcast(qv), Seq(queryIdCol))
      .join(cv, col(idCol) === col("__cid"))
      .select(col(queryIdCol),
        L2.dist(col("__qvec"), col("__cvec")).as("dist"),
        col("__cid"))
    KnnJoin.topkOfCandidates(cands, queryIdCol, idCol, k, isString)
  }
}
