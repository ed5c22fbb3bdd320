package graft

import org.apache.spark.sql.functions._
import graft.operators.Contrastive
import graft.functions.VectorFunctions.{asDouble, Cosine}

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  test("hard negatives: nearest differently-labeled, self and same-label excluded") {
    // Anchor 1 (label 0) at e0. Corpus: 10 same-label (excluded) at e0,
    // 11 diff-label at e0 (dist 0 — the hardest), 12 diff-label at e1
    // (dist 1), 13 diff-label opposite (dist 2), plus anchor itself in the
    // corpus under id 1 with label 0.
    def v(x: Double, y: Double) = Seq(x, y, 0.0, 0.0)
    val corpus = Seq(
      (1L, v(1, 0), 0L), (10L, v(1, 0), 0L), (11L, v(1, 0), 1L),
      (12L, v(0, 1), 2L), (13L, v(-1, 0), 1L)
    ).toDF("skill_id", "svec", "label")
    val anchors = Seq((1L, v(1, 0), 0L)).toDF("anchor_id", "avec", "albl")
    val got = Contrastive.hardNegatives(anchors, "anchor_id", "avec", "albl",
        corpus, "skill_id", "svec", "label", 3, Cosine)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("skill_id"), r.getAs[Long]("label"), r.getAs[Long]("rank")))
    assert(got.toSeq === Seq((11L, 1L, 1L), (12L, 2L, 2L), (13L, 1L, 3L)))
  }

  test("on the fixture corpus: k rows per anchor, labels always differ") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val c = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("skill_id"), asDouble(col("embedding")).as("svec"),
        col("label").cast("long").as("label"))
    val anchors = c.filter(col("skill_id") < 40)
      .select(col("skill_id").as("anchor_id"), col("svec").as("avec"),
        col("label").as("albl"))
    val negs = Contrastive.hardNegatives(anchors, "anchor_id", "avec", "albl",
      c, "skill_id", "svec", "label", 5, Cosine)
    val joined = negs.join(
      anchors.select(col("anchor_id"), col("albl")), "anchor_id")
    assert(joined.count() === anchors.count() * 5)
    assert(joined.filter(col("label") === col("albl")).count() === 0)
    assert(negs.filter(col("anchor_id") === col("skill_id")).count() === 0)
  }
}
