package graft

import org.apache.spark.sql.functions._
import graft.operators.{BinaryQuant, KnnJoin}

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  private def vec(bits: Seq[Int], dim: Int = 64): Seq[Double] =
    (0 until dim).map(i => if (bits.contains(i)) 1.0 else -1.0)

  test("packWord sets exactly the positive dims' bits, word-local") {
    // bits 0, 5, 31 in word 0; bits 32 (=bit 0 of word 1), 63 (=bit 31) in word 1
    val df = Seq((1L, vec(Seq(0, 5, 31, 32, 63)))).toDF("id", "v")
    val row = BinaryQuant.quantize(df, "id", "v", 64).collect().head
    assert(row.getAs[Long]("code_0") === ((1L << 0) | (1L << 5) | (1L << 31)))
    assert(row.getAs[Long]("code_1") === ((1L << 0) | (1L << 31)))
    assert(row.getAs[Long]("n_ones") === 5L)
  }

  test("zero and negative dims pack to zero bits") {
    val df = Seq((1L, Seq.fill(64)(0.0)), (2L, Seq.fill(64)(-3.5))).toDF("id", "v")
    val rows = BinaryQuant.quantize(df, "id", "v", 64).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("code_0") === 0L && r.getAs[Long]("code_1") === 0L)
      assert(r.getAs[Long]("n_ones") === 0L)
    }
  }

  test("hammingTopK distances equal the bit-diff count; ties break on id") {
    // Query bits {0}: 101 → {0} dist 0; 102 → {0,1} dist 1; 100 → {0,1,2}
    // dist 2; 103 → {1} dist 2. The dist-2 tie breaks on id: 100 before 103.
    val corpus = Seq(
      (100L, vec(Seq(0, 1, 2))),
      (101L, vec(Seq(0))),
      (102L, vec(Seq(0, 1))),
      (103L, vec(Seq(1)))
    ).toDF("skill_id", "svec")
    val q = Seq((1L, vec(Seq(0)))).toDF("job_id", "qvec")
    val got = BinaryQuant.hammingTopK(q, "job_id", "qvec",
        corpus, "skill_id", "svec", 64, 4)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("skill_id"), r.getAs[Double]("dist")))
    assert(got.toSeq === Seq((101L, 0.0), (102L, 1.0), (100L, 2.0), (103L, 2.0)))
  }

  test("hammingRefine returns exact cosine order on the shortlist; self at rank 1") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val corpus = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("skill_id"), col("v").as("svec"))
    // Queries ARE corpus members: refine must put each at rank 1, dist 0.
    val q = corpus.filter(col("skill_id") < 25)
      .select(col("skill_id").as("job_id"), col("svec").as("qvec"))
    val r1 = BinaryQuant.hammingRefine(q, "job_id", "qvec",
        corpus, "skill_id", "svec", 64, 5)
      .filter(col("rank") === 1).collect()
    assert(r1.length === 5)
    r1.foreach { r =>
      assert(r.getAs[Long]("job_id") === r.getAs[Long]("skill_id"))
      assertNear(r.getAs[Double]("dist"), 0.0, 1e-12)
    }
  }

  test("binary recall at 64 dims stays usable (SimHash estimator sanity)") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("job_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("qvec"))
    val c = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("skill_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("svec"))
    val ham = BinaryQuant.hammingTopK(q, "job_id", "qvec", c, "skill_id", "svec", 64, 10)
    val ex = KnnJoin.exact(q, "job_id", "qvec", c, "skill_id", "svec", 10,
      graft.functions.VectorFunctions.Cosine)
    val rec = graft.operators.Eval.recallSummary(
        graft.operators.Eval.recallAtK(ham, ex, "job_id", "skill_id"))
      .collect().head.getAs[Double]("avg_recall")
    // Collapse detector, not a quality gate: 64 sign bits rank coarsely
    // (observed ≈0.22 on this corpus — random ranking would give k/N ≈
    // 0.02), and the production face is the refine cascade, whose output
    // is cosine-exact. A packing/distance bug sends this to ≈0.02.
    assert(rec >= 0.1, s"binary recall collapsed: $rec")
  }
}
