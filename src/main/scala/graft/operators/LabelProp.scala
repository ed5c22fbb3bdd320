package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a similarity graph (Zhu &
  * Ghahramani CMU-CALD-02-107; Raghavan et al.'s LPA community variant) —
  * the weak-supervision move a curation pipeline makes when a small slice
  * of the corpus carries trusted labels (human-rated quality, verified
  * domain, license class) and the rest must inherit them: seeds stay
  * CLAMPED, every other node takes the majority label of its labeled
  * neighbors each round, ties to the smallest label so the trajectory is
  * deterministic and the oracle replays it round for round.
  *
  * Scale shape: per round ONE |E| keyed join (edges × current labels),
  * one (node, label) counting aggregate whose fanout is the node degree,
  * and one per-node argmax window bounded by the label vocabulary —
  * nothing all-pairs, nothing driver-side; rounds `localCheckpoint` like
  * every iterative operator here. A node with no labeled neighbor keeps
  * its previous state (possibly unlabeled), so coverage grows
  * monotonically outward from the seeds. Plain LPA can oscillate on
  * bipartite structures, so the pin is the fixed-round state, not a
  * convergence claim (the PageRank convention, not the k-core one).
  */
object LabelProp {

  /** `iters` clamped-majority rounds. `nodes` = (id), `seeds` = (id,
    * label) with label ≥ 0; returns (id, label) where label is −1 for
    * nodes still unlabeled after `iters` rounds. */
  def propagate(symEdges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 0)
    val e = symEdges.select(col("src"), col("dst")).localCheckpoint()
    val sd = seeds.select(col("id"), col("label").cast("long").as("__seed"))
      .distinct().localCheckpoint()
    var cur = nodes.select(col("id")).distinct()
      .join(sd, Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(-1L)).as("label"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val votes = e
        .join(cur.select(col("id").as("dst"), col("label").as("__nl")), "dst")
        .filter(col("__nl") >= 0L)
        .groupBy(col("src"), col("__nl"))
        .agg(count(lit(1)).as("__cnt"))
      val w = Window.partitionBy("src")
        .orderBy(col("__cnt").desc, col("__nl"))
      val best = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("src").as("id"), col("__nl").as("__maj"))
      cur = cur.join(best, Seq("id"), "left")
        .join(sd, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__seed"), col("__maj"), col("label")).as("label"))
        .localCheckpoint()
    }
    cur
  }

  /** SQL mirror: CTE block over `symCte(src, dst)`, `ndCte(id)` and
    * `sdCte(id, label)`, ending in `lp$iters(id, label)`. Same clamped
    * majority, same (count DESC, label ASC) tie-break, MATERIALIZED per
    * round. */
  def propagateCtesSql(symCte: String, ndCte: String, sdCte: String,
      iters: Int): String = {
    val head =
      s"""lp0 AS MATERIALIZED (SELECT n.id,
         |    CAST(coalesce(s.label, -1) AS BIGINT) AS label
         |  FROM $ndCte n LEFT JOIN $sdCte s ON s.id = n.id)""".stripMargin
    val rounds = (1 to iters).map { t =>
      s"""lpv$t AS (SELECT e.src, p.label AS nl, count(*) AS cnt
         |  FROM $symCte e JOIN lp${t - 1} p ON p.id = e.dst
         |  WHERE p.label >= 0 GROUP BY 1, 2),
         |lpb$t AS (SELECT src AS id, nl FROM (
         |    SELECT src, nl, row_number() OVER (PARTITION BY src
         |      ORDER BY cnt DESC, nl) AS rn FROM lpv$t) WHERE rn = 1),
         |lp$t AS MATERIALIZED (SELECT p.id,
         |    CAST(coalesce(s.label, b.nl, p.label) AS BIGINT) AS label
         |  FROM lp${t - 1} p
         |  LEFT JOIN lpb$t b ON b.id = p.id
         |  LEFT JOIN $sdCte s ON s.id = p.id)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n")
  }
}
