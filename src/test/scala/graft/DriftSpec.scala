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

  test("streaming drift: per-batch rows equal the batch operator per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reference = Seq("a", "a", "b").toDF("t")
    val b1 = Seq("a", "b")            // close to reference
    val b2 = Seq("x", "x", "y")       // disjoint vocabulary
    val input = MemoryStream[String]
    val got = scala.collection.mutable.Map[Long, Long]()
    val query = Drift.jsdStream(input.toDF().toDF("t"), reference)(
      (df, id) => got(id) = df.collect().head.getAs[Long]("jsd_e6"))
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
    } finally query.stop()
    def batchOf(ts: Seq[String]): Long = Drift.jsdSummary(
      reference.select(org.apache.spark.sql.functions.lit(true).as("ga"), $"t")
        .unionByName(ts.toDF("t").select(
          org.apache.spark.sql.functions.lit(false).as("ga"), $"t")))
      .collect().head.getAs[Long]("jsd_e6")
    assert(got(0L) === batchOf(b1))
    assert(got(1L) === batchOf(b2))
    assert(got(1L) > got(0L), "disjoint batch should drift more")
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
