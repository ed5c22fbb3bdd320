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
