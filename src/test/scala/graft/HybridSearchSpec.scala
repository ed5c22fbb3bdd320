package graft

import org.apache.spark.sql.functions._
import graft.operators.HybridSearch

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalTopK ranks by distinct-token overlap, ties to the lowest id") {
    val q = Seq((1L, "alpha beta gamma")).toDF("qid", "text")
    val c = Seq(
      (10L, "alpha beta gamma extra"),   // 3 shared
      (11L, "alpha beta unrelated"),     // 2 shared
      (12L, "alpha alpha alpha"),        // 1 shared (distinct!)
      (13L, "nothing common here")       // 0 → absent
    ).toDF("cid", "text")
    val r = HybridSearch.lexicalTopK(q, "qid", "text", c, "cid", "text", 10)
      .select($"cid", $"rank", $"overlap").as[(Long, Long, Long)]
      .collect().sortBy(_._2)
    assert(r.map(_._1).toSeq == Seq(10L, 11L, 12L))
    assert(r.map(_._3).toSeq == Seq(3L, 2L, 1L))
  }

  test("fuse: hits on both lists outrank single-list hits; ranks deterministic") {
    val dense = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("qid", "cid", "rank")
    val lex = Seq((1L, 101L, 1L), (1L, 102L, 2L)).toDF("qid", "cid", "rank")
    val f = HybridSearch.fuse(dense, lex, "qid", "cid", 10)
      .select($"cid", $"rank", $"rrf_score").as[(Long, Long, Double)]
      .collect().sortBy(_._2)
    // 101 appears in both lists (1/62 + 1/61) and must win over 100 (1/61).
    assert(f.head._1 == 101L)
    assertNear(f.head._3, 1.0 / 62 + 1.0 / 61, 1e-6)
    assert(f.map(_._1).toSet == Set(100L, 101L, 102L))
    // 100 (dense rank 1) beats 102 (lexical rank 2): 1/61 > 1/62.
    assert(f(1)._1 == 100L && f(2)._1 == 102L)
  }
}
