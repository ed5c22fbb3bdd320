package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def tok(pairs: (Boolean, String)*) = pairs.toDF("ga", "t")

  test("identical snapshots have zero divergence") {
    val t = tok((true, "a"), (true, "b"), (true, "b"),
      (false, "a"), (false, "b"), (false, "b"))
    val r = Drift.jsdSummary(t).collect().head
    assert(r.getAs[Long]("jsd_e6") === 0L)
    assert(r.getAs[Long]("n_vocab") === 2L)
    assert(r.getAs[Long]("n_tokens_a") === 3L)
    assert(r.getAs[Long]("n_tokens_b") === 3L)
  }

  test("disjoint vocabularies hit the JSD ceiling ln 2") {
    val t = tok((true, "a"), (true, "b"), (false, "x"), (false, "y"))
    val jsd = Drift.jsdSummary(t).collect().head.getAs[Long]("jsd_e6")
    assert(jsd === 693147L, s"expected ln(2)*1e6, got $jsd")
  }

  test("topMovers ranks by probability shift with deterministic ties") {
    // a: 3/4 vs 1/4 → delta .5; b: 1/4 vs 1/4 → 0; x: 0 vs 2/4 → .5
    val t = tok((true, "a"), (true, "a"), (true, "a"), (true, "b"),
      (false, "a"), (false, "b"), (false, "x"), (false, "x"))
    val rows = Drift.topMovers(t, 2).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("delta_e6")))
    // both deltas are 500000; the tie breaks lexically: a before x
    assert(rows.toSeq === Seq(("a", 500000L), ("x", 500000L)))
  }
}
