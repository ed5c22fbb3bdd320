package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector

/** X2 — random-projection LSH, the batch analog of the reference's HNSW L2
  * index build + search (`load_skill_vectors_milvus.py:53-68`,
  * `milvus_search:117-143`). An online graph index is out of scope
  * (BASELINE.json); MLlib's BucketedRandomProjectionLSH gives the same
  * contract — approximate L2 neighbors with tunable recall — as a batch
  * bucket join: only hash-colliding pairs are compared, never |Q|×|C|.
  *
  * Deterministic for a fixed seed, but the gaussian projection planes come
  * from the JVM RNG, so results are checked by recall tests rather than the
  * DuckDB oracle (driver records a rows-only check for its query).
  */
object LshIndex {

  /** Approximate L2 top-k per query via hash-bucket join + window rank.
    * Ties break on (dist, id). Output: (queryIdCol, idCol, rank, dist). */
  def annTopK(queries: DataFrame, queryIdCol: String, queryVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      bucketLength: Double, numHashTables: Int = 3, seed: Long = 42L): DataFrame = {
    val qf = queries.select(col(queryIdCol),
      array_to_vector(col(queryVecCol).cast("array<double>")).as("features"))
    val cf = corpus.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(cf)
    val joined = model.approxSimilarityJoin(qf, cf, Double.MaxValue, "dist")
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(idCol))
    joined.select(
        col(s"datasetA.$queryIdCol").as(queryIdCol),
        col(s"datasetB.$idCol").as(idCol),
        col("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rank"), col("dist"))
  }
}
