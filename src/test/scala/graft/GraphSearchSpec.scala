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
}
