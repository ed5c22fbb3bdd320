package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphSearch, PageRank}

/** Stored-graph lifecycle guards: fingerprint enforcement on append, and
  * walk determinism (the property the oracle replay stands on). */
class GraphSearchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus = {
    import graft.io.Tables
    Tables.embeddings(spark, dir).limit(60)
      .select(col("vec_id").as("skill_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("svec"))
  }

  test("append with a different degree than the build is rejected") {
    val tag = s"gs_${System.nanoTime()}"
    GraphSearch.writeIndex(corpus, "skill_id", "svec", 3,
      s"graft_test_$tag", s"/tmp/graft_test_graph/$tag", 4)
    val delta = corpus.limit(5)
    val ex = intercept[IllegalArgumentException] {
      GraphSearch.appendToIndex(delta, corpus, "skill_id", "svec", 4,
        s"graft_test_$tag", 4)
    }
    assert(ex.getMessage.contains("fingerprint"))
    // matching degree appends cleanly
    GraphSearch.appendToIndex(delta, corpus, "skill_id", "svec", 3,
      s"graft_test_$tag", 4)
    assert(spark.table(s"graft_test_$tag").count() == 60L * 3 + 5 * 3)
  }

  test("the beam walk is deterministic run to run") {
    val q = corpus.limit(4).select(col("skill_id").as("job_id"),
      col("svec").as("qvec"))
    val edges = PageRank.symmetrize(
      PageRank.directedKnnEdges(corpus, "skill_id", "svec", 3))
    def run() = GraphSearch.beamSearch(q, "job_id", "qvec", corpus,
      "skill_id", "svec", edges, hops = 3, beam = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("duplicate stage depths are rejected") {
    val q = corpus.limit(2).select(col("skill_id").as("job_id"),
      col("svec").as("qvec"))
    val edges = PageRank.symmetrize(
      PageRank.directedKnnEdges(corpus, "skill_id", "svec", 3))
    intercept[IllegalArgumentException] {
      GraphSearch.beamSearchAtStages(q, "job_id", "qvec", corpus,
        "skill_id", "svec", edges, Seq(2, 2), beam = 4, k = 5)
    }
  }

  test("a large query fleet walks with per-hop parallelism, results unchanged") {
    // 10⁴ queries: each corpus vector re-labeled into many query ids. The
    // frontier must NOT serialize through one partition (the r7 verdict's
    // coalesce(1) nit) — with |Q|·beam = 40 000 rows per hop the frontier
    // partition target is > 1 — and per-query results must be identical to
    // the same walk run query-by-query (spot-checked on one id).
    val base = corpus.limit(10)
    val fleet = base.crossJoin(spark.range(0, 1000).select(col("id")))
      .select((col("skill_id") * 1000 + col("id")).as("job_id"),
        col("svec").as("qvec"))
    val edges = PageRank.symmetrize(
      PageRank.directedKnnEdges(corpus, "skill_id", "svec", 3))
    val walked = GraphSearch.beamSearch(fleet, "job_id", "qvec", corpus,
      "skill_id", "svec", edges, hops = 2, beam = 4, k = 3)
    // the frontier target spreads a 10⁴-query fleet (the final ranked
    // output may still AQE-coalesce; the sizing rule is what's pinned)
    assert(GraphSearch.frontierPartitions(10000L, 4, 32) > 1)
    assert(GraphSearch.frontierPartitions(20L, 32, 32) == 1)
    val target = base.limit(1).select((col("skill_id") * 1000).as("j"))
      .head().getLong(0)
    val fleetRows = walked.filter(col("job_id") === target)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val solo = GraphSearch.beamSearch(
      fleet.filter(col("job_id") === target),
      "job_id", "qvec", corpus, "skill_id", "svec", edges,
      hops = 2, beam = 4, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(fleetRows == solo)
    assert(fleetRows.nonEmpty)
  }
}
