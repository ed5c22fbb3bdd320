package graft

import graft.operators.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    pairs.flatMap(p => Seq(p, (p._2, p._1))).toDF("src", "dst")

  private def coreMap(edges: org.apache.spark.sql.DataFrame, iters: Int) =
    KCore.corenessWithPrev(edges, iters).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("core"))).toMap

  test("triangle with a pendant: triangle nodes core 2, pendant core 1") {
    // 1-2-3 triangle, 4 hangs off 3
    val c = coreMap(sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 8)
    assert(c === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("path graph: every node core 1 despite inner degree 2") {
    // 1-2-3-4-5: inner nodes have degree 2 but peel to core 1 — the case
    // degree alone gets wrong and the fixpoint must iterate through
    val c = coreMap(sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 8)
    assert(c.values.toSet === Set(1L))
  }

  test("K4 with a tail: clique core 3, tail decays 2-away from it") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L))
    val c = coreMap(sym(k4 ++ tail: _*), 10)
    assert(Seq(1L, 2L, 3L).forall(c(_) == 3L), s"clique cores wrong: $c")
    assert(c(4L) === 3L) // in the clique
    assert(c(5L) === 1L && c(6L) === 1L)
  }

  test("convergence flag: prev_core equals core once the fixpoint is reached") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    val rows = KCore.corenessWithPrev(edges, 10).collect()
    assert(rows.forall(r =>
      r.getAs[Long]("core") === r.getAs[Long]("prev_core")))
  }

  test("early exit: rounds are data-dependent, never the cap, and the " +
      "result equals the capped form's") {
    // 5-cycle: c0 = degree 2 everywhere = coreness — converged after ONE
    // verification round, so a 10-round cap must run far fewer.
    val cyc = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    val (cdf, crounds) = KCore.corenessWithRounds(cyc, 10)
    assert(crounds < 10 && crounds >= 1, s"rounds=$crounds")
    assert(cdf.collect().forall(_.getAs[Long]("core") == 2L))
    // path graph: needs real peeling rounds but still exits before an
    // absurd cap, with values identical to a tight cap's fixpoint.
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val (pdf, prounds) = KCore.corenessWithRounds(path, 100)
    assert(prounds < 100, s"rounds=$prounds")
    assert(pdf.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("core")))
      .toMap === coreMap(path, 8))
  }

  test("probe cadence past the knee: a deep-converging graph exits on a " +
      "skipped-probe schedule with values identical to the fixpoint") {
    // 44-node path: the 1-wave peels inward one node per end per round,
    // so convergence needs ~21 rounds — past the 16-round probe knee,
    // exercising the every-3rd-round cadence (the r11 verdict's
    // rank_knn_kcore watch item). Monotonicity makes the skipped probes
    // exit-delaying only: values must still be the exact fixpoint
    // (coreness 1 everywhere on a path), prev_core must equal core (the
    // in-plan convergence gate), and the loop must exit under the cap.
    val n = 44
    val deep = sym((1L until n.toLong).map(i => (i, i + 1)): _*)
    val (df, rounds) = KCore.corenessWithRounds(deep, 64)
    assert(rounds > 16 && rounds < 64, s"rounds=$rounds")
    val rows = df.collect()
    assert(rows.length == n)
    assert(rows.forall(_.getAs[Long]("core") == 1L))
    assert(rows.forall(r => r.getAs[Long]("core") == r.getAs[Long]("prev_core")))
  }

  test("SQL emitter emits the round structure; operator yields the known " +
      "K4-with-tail histogram (the emitter's SEMANTICS are pinned by the " +
      "rank_knn_kcore oracle gate, which executes it in DuckDB)") {
    val edges = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val sql = KCore.corenessCtesSql("sym", 4)
    assert(sql.contains("kc0 AS MATERIALIZED") && sql.contains("kc4 AS MATERIALIZED"))
    assert(sql.contains("max(least(core, r))"))
    val c = coreMap(edges, 10)
    assert(c.values.count(_ == 3L) === 4 && c.values.count(_ == 1L) === 2)
  }
}
