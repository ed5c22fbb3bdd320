package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Exact-integer distributed k-means (Lloyd 1982) over e6-scaled embedding
  * vectors — the cluster-then-balance primitive of training-data curation
  * (SemDeDup's clustering stage, Abbas et al. 2023; DoReMi-style mixture
  * balancing when no domain labels exist, Xie et al. 2023): cluster the
  * corpus in embedding space, then cap/reweight per cluster so no dense
  * region dominates the training mix.
  *
  * Unlike the MLlib KMeans behind the IVF tier (float-parallel, only
  * recall-gated), EVERY quantity here is an exact integer — e6-scaled
  * coordinates ([[ExactRound.eScaled]]), integer squared-L2 distances,
  * [[ExactRound.roundDiv]] centroid means — so the full fixpoint replays
  * hash-exactly in the DuckDB oracle, round for round. Fixed-round pin
  * (the LPA/PageRank convention: k-means can cycle on ties, a fixed round
  * count is the deterministic contract).
  *
  * Scale shape per round: the assignment is a broadcast-LITERAL argmin
  * projection fused into the scan (k centroid literals — the
  * [[IvfIndex.assign]] pattern; zero shuffle), and the centroid update is
  * ONE keyed aggregate emitting k·d cells (posexplode → (cluster, dim)
  * roundDiv means) — the shuffle carries k·d cells, never the corpus.
  * The k·d-cell collect per round is a bounded model fetch (the
  * IVF-centroid / PQ-codebook convention); centroids ARE the model.
  * Distances stay inside Long: e6 coords ≤ ~10⁶, so a per-dim square is
  * ≤ 4·10¹² and a 64-dim sum ≤ 3·10¹⁴ ≪ 2⁶³.
  */
object KMeansExact {

  /** e6-scaled integer view of a double-vector column: (idCol, __v). */
  def scaledVectors(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol),
      transform(col(vecCol), x => ExactRound.eScaled(x, 6)).as("__v"))

  /** Integer squared L2 between an array<long> column and a literal. */
  private def sqDist(v: Column, c: Array[Long]): Column =
    aggregate(zip_with(v, lit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Add `__cid` (and `__d`, the exact distance to the winning centroid)
    * to a [[scaledVectors]] frame: literal-centroid argmin, ties → lowest
    * cluster id — a pure projection fused into the scan. */
  def assign(sv: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    require(centroids.nonEmpty, "KMeansExact.assign: no centroids")
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col("__v"), c).as("d"), lit(i).as("cid"))
    }
    sv.withColumn("__w", element_at(array_sort(array(scored.toSeq: _*)), 1))
      .withColumn("__cid", col("__w").getField("cid"))
      .withColumn("__d", col("__w").getField("d"))
      .drop("__w")
  }

  /** Seeds = the `k` lowest-id vectors (the [[IvfIndex.fitSeeds]]
    * determinism convention), then `rounds` Lloyd rounds. The per-round
    * centroid means are computed by SPARK's own roundDiv column (collected
    * as k·d long cells), so no driver-side arithmetic can drift from the
    * oracle's roundDivSql. An emptied cluster keeps its previous centroid
    * (documented; the oracle mirrors it with a LEFT JOIN coalesce). */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int): Array[Array[Long]] = {
    require(k >= 1 && rounds >= 0, s"need k>=1, rounds>=0; got $k, $rounds")
    val sv = scaledVectors(corpus, idCol, vecCol).localCheckpoint()
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents: Array[Array[Long]] = sv
      .orderBy(col(idCol)).limit(k)
      .select(col("__v")).as[Seq[Long]].collect().map(_.toArray)
    for (_ <- 1 to rounds) {
      val cells = assign(sv, cents)
        .select(col("__cid"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__cid", "__dim")
        .agg(ExactRound.roundDiv(sum(col("__x")), count(lit(1))).as("__cv"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
      cents = cents.zipWithIndex.map { case (old, cid) =>
        if (cells.contains((cid, 0)))
          old.indices.map(d => cells((cid, d))).toArray
        else old
      }
    }
    cents
  }

  /** DuckDB twin of seeds + `rounds` Lloyd rounds over
    * `svCte`(idCol, v BIGINT[]): ends in ct`rounds`(cid, v). Distances use
    * the inner-product identity Σ(a−c)² = a·a + c·c − 2·a·c — each dot is
    * an integer-valued DOUBLE below 2⁵³ (64 dims × 10¹² per term), so the
    * BIGINT cast is exact and matches Spark's pure-long fold. MATERIALIZED
    * per round (the iterative-oracle convention). */
  def fitCtesSql(svCte: String, idCol: String, k: Int, rounds: Int): String = {
    val head =
      s"""ct0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY $idCol) AS INT) - 1 AS cid, v
         |  FROM (SELECT $idCol, v FROM $svCte ORDER BY $idCol LIMIT $k))""".stripMargin
    val roundCtes = (1 to rounds).map { t =>
      s"""a$t AS MATERIALIZED (SELECT $idCol, v, cid FROM (
         |    SELECT s.$idCol, s.v, ct.cid,
         |      row_number() OVER (PARTITION BY s.$idCol ORDER BY
         |        ${distSql("s.v", "ct.v")}, ct.cid) AS pick
         |    FROM $svCte s CROSS JOIN ct${t - 1} ct) WHERE pick = 1),
         |u$t AS (SELECT cid, dim,
         |    CAST(${ExactRound.roundDivSql("sum(x)", "count(*)")} AS BIGINT) AS cv
         |  FROM (SELECT cid, unnest(v) AS x,
         |      unnest(range(1, len(v) + 1)) AS dim FROM a$t)
         |  GROUP BY 1, 2),
         |ct$t AS MATERIALIZED (SELECT p.cid, coalesce(nu.v, p.v) AS v
         |  FROM ct${t - 1} p LEFT JOIN
         |    (SELECT cid, list(cv ORDER BY dim) AS v FROM u$t GROUP BY 1) nu
         |    ON nu.cid = p.cid)""".stripMargin
    }
    (Seq(head) ++ roundCtes).mkString(",\n")
  }

  /** The exact integer squared-L2 SQL between two BIGINT[] expressions
    * (inner-product identity; see [[fitCtesSql]]). */
  def distSql(a: String, c: String): String =
    s"CAST(list_inner_product($a, $a) + list_inner_product($c, $c) - 2 * list_inner_product($a, $c) AS BIGINT)"
}
