package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("triangle: symmetric graph keeps all nodes equal, mass conserved to rounding") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val pr = PageRank.pagerank(edges, 5).collect()
      .map(r => r.getAs[Long]("pr_e9"))
    assert(pr.length === 3)
    assert(pr.distinct.length === 1, s"symmetric nodes diverged: ${pr.toSeq}")
    // per-iteration rounding drifts mass by a few e-9 units, never more
    assert(math.abs(pr.sum - 1000000000L) <= 30, s"mass drifted: ${pr.sum}")
  }

  test("star: the hub accumulates more mass than any leaf") {
    val spokes = (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L)))
    val pr = PageRank.pagerank(spokes.toDF("src", "dst"), 5).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("pr_e9"))).toMap
    val hub = pr(0L)
    (1L to 5L).foreach(l => assert(hub > pr(l),
      s"hub $hub not above leaf ${pr(l)}"))
  }

  test("personalized PageRank: mass decays with distance from the seed; " +
      "components unreachable from seeds score 0") {
    // path 1-2-3-4-5 seeded at 1, plus a disconnected pair 6-7
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .flatMap(p => Seq(p, (p._2, p._1))).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val ppr = PageRank.personalizedPagerank(edges, seeds, 5).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("ppr_e9"))).toMap
    // a bipartite path oscillates between odd/even distances at finite
    // iteration counts, so assert order-free proximity properties: the
    // far end is the component minimum, the mass peak sits next to the
    // seed, and total mass is conserved to rounding
    val comp = Seq(1L, 2L, 3L, 4L, 5L).map(ppr)
    assert(comp.forall(_ > ppr(5L) - 1) && ppr(5L) === comp.min,
      s"the far end should hold the least mass: $ppr")
    assert(Seq(1L, 2L).contains(
      Seq(1L, 2L, 3L, 4L, 5L).maxBy(ppr)), s"peak should hug the seed: $ppr")
    assert(math.abs(comp.sum - 1000000000L) <= 50, s"mass drifted: $ppr")
    assert(ppr(6L) === 0L && ppr(7L) === 0L,
      s"no teleport and no path from seeds → exactly zero: $ppr")
  }

  test("linkPredictionRA: exact RA terms, adjacency excluded, hub cap") {
    // path 1-2-3 plus 3-4: candidates (1,3) via z=2 [deg 2], (2,4) via
    // z=3 [deg 2], (1,... ) none else. Pair (1,2) adjacent → excluded.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
      .flatMap(p => Seq(p, (p._2, p._1))).toDF("src", "dst")
    val got = PageRank.linkPredictionRA(edges, 10, 64).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_common"), r.getAs[Long]("ra_e9"))).toSet
    assert(got === Set((1L, 3L, 1L, 500000000L), (2L, 4L, 1L, 500000000L)))
    // star 0-{1..5}: every leaf pair shares hub 0 (deg 5 → 200000000);
    // capping maxHub below 5 removes the hub as a wedge generator
    val star = (1L to 5L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val open = PageRank.linkPredictionRA(star, 100, 64).collect()
    assert(open.length === 10 &&
      open.forall(_.getAs[Long]("ra_e9") === 200000000L))
    assert(PageRank.linkPredictionRA(star, 100, 4).count() === 0L)
  }

  test("knnEdges: symmetric, self-free, min-degree k") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val c = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("skill_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("svec"))
    val e = PageRank.knnEdges(c, "skill_id", "svec", 3)
    assert(e.filter(col("src") === col("dst")).count() === 0)
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    assert(e.exceptAll(rev).count() === 0, "edge set is not symmetric")
    val minDeg = e.groupBy("src").count().agg(min("count")).collect().head.getLong(0)
    assert(minDeg >= 3, s"a node lost its own top-k edges: minDeg=$minDeg")
  }
}
