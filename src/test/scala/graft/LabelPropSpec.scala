package graft

import graft.operators.LabelProp

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    pairs.flatMap(p => Seq(p, (p._2, p._1))).toDF("src", "dst")

  private def run(edges: org.apache.spark.sql.DataFrame,
      nodes: Seq[Long], seeds: Seq[(Long, Long)], iters: Int) =
    LabelProp.propagate(edges, nodes.map(Tuple1(_)).toDF("id"),
      seeds.toDF("id", "label"), iters)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("label"))).toMap

  test("two clusters inherit their own seed's label; bridge stays put") {
    // cluster A: 1-2-3 triangle seeded 7 at node 1
    // cluster B: 5-6-7 triangle seeded 9 at node 5; 4 bridges 3 and 5
    val e = sym((1L, 2L), (2L, 3L), (1L, 3L), (5L, 6L), (6L, 7L), (5L, 7L),
      (3L, 4L), (4L, 5L))
    val out = run(e, 1L to 7L, Seq(1L -> 7L, 5L -> 9L), 4)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 7L), s"cluster A wrong: $out")
    assert(Seq(5L, 6L, 7L).forall(out(_) == 9L), s"cluster B wrong: $out")
    // the bridge sees one vote for each label → tie → smaller label wins
    assert(out(4L) === 7L, s"tie must break to the smaller label: $out")
  }

  test("seeds stay clamped even when outvoted by neighbors") {
    // star: center 0 seeded 5; all leaves seeded 1 — center must keep 5
    val e = sym((0L, 1L), (0L, 2L), (0L, 3L))
    val out = run(e, 0L to 3L, Seq(0L -> 5L, 1L -> 1L, 2L -> 1L, 3L -> 1L), 3)
    assert(out(0L) === 5L && Seq(1L, 2L, 3L).forall(out(_) == 1L))
  }

  test("nodes unreachable from any seed remain -1") {
    val e = sym((1L, 2L), (3L, 4L))
    val out = run(e, 1L to 4L, Seq(1L -> 2L), 5)
    assert(out(2L) === 2L)
    assert(out(3L) === -1L && out(4L) === -1L)
  }

  test("zero iterations returns the seeded state unchanged") {
    val e = sym((1L, 2L))
    val out = run(e, Seq(1L, 2L), Seq(1L -> 3L), 0)
    assert(out === Map(1L -> 3L, 2L -> -1L))
  }
}
