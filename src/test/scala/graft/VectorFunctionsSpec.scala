package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(vecs: Seq[(Seq[Double], Seq[Double])],
      f: (Column, Column) => Column): Seq[Double] =
    vecs.toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  test("dot / norm / cosine / l2 on hand-computed vectors") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(4.0, -5.0, 6.0)
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      dotProduct(col("a"), col("b")).as("dot"),
      l2Norm(col("a")).as("na"),
      cosineSimilarity(col("a"), col("b")).as("cos"),
      l2Distance(col("a"), col("b")).as("l2")).head()
    assertNear(r.getDouble(0), 12.0)
    assertNear(r.getDouble(1), math.sqrt(14.0))
    assertNear(r.getDouble(2), 12.0 / (math.sqrt(14.0) * math.sqrt(77.0)))
    assertNear(r.getDouble(3), math.sqrt(9.0 + 49.0 + 9.0))
  }

  test("zero vector cosine is NaN (reference numpy divide semantics)") {
    val r = eval1(Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))), cosineSimilarity)
    assert(r.head.isNaN)
  }

  // Seeded random sweeps stand in for scalacheck properties (one Spark job for
  // all cases instead of one per generated sample).
  private val rnd = new scala.util.Random(42)
  private def randVec(d: Int): Seq[Double] = Seq.fill(d)(rnd.nextDouble() * 200 - 100)

  test("property: cosine in [-1,1], cos(a,a)=1, symmetry (20 seeded cases)") {
    val cases = Seq.fill(20)((randVec(8), randVec(8)))
    val ab = eval1(cases, cosineSimilarity)
    val ba = eval1(cases.map(_.swap), cosineSimilarity)
    val aa = eval1(cases.map(c => (c._1, c._1)), cosineSimilarity)
    cases.indices.foreach { i =>
      assert(ab(i) >= -1.0 - 1e-9 && ab(i) <= 1.0 + 1e-9)
      assertNear(ab(i), ba(i), 1e-9)
      assertNear(aa(i), 1.0, 1e-9)
    }
  }

  test("property: l2 distance >= 0, d(a,a)=0, symmetry (20 seeded cases)") {
    val cases = Seq.fill(20)((randVec(6), randVec(6)))
    val ab = eval1(cases, l2Distance)
    val ba = eval1(cases.map(_.swap), l2Distance)
    val aa = eval1(cases.map(c => (c._1, c._1)), l2Distance)
    cases.indices.foreach { i =>
      assert(ab(i) >= 0.0)
      assertNear(ab(i), ba(i), 1e-9)
      assertNear(aa(i), 0.0, 1e-9)
    }
  }

  test("text round-trip preserves values and null elements") {
    val df = Seq(Tuple1(Seq[java.lang.Double](1.5, null, -2.25))).toDF("v")
    val r = df.select(textToVec(vecToText(col("v"))).as("rt")).head().getSeq[Any](0)
    assert(r == Seq(1.5, null, -2.25))
  }

  test("l2Normalize yields a unit-norm vector") {
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
    val n = df.select(l2Normalize(col("v")).as("n")).head().getSeq[Double](0)
    assertNear(n(0), 0.6); assertNear(n(1), 0.8)
    assertNear(math.sqrt(n.map(x => x * x).sum), 1.0)
  }

  test("metric dispatch by name") {
    assert(Metric("cosine") == Cosine)
    assert(Metric("L2") == L2)
    assert(Metric("ip") == InnerProduct)
    intercept[IllegalArgumentException](Metric("hamming"))
  }

  test("JL projection roughly preserves pairwise distances (deterministic planes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 12L).map { i =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i, v.map(x => (x / n).toFloat).toSeq)
    }
    val proj = graft.operators.RpLsh.project(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 64, 16)
      .as[(Long, Seq[Double])].collect().toMap
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.toMap.view.mapValues(_.map(_.toDouble)).toMap
    val ratios = for {
      i <- 0L until 12L; j <- (i + 1) until 12L
    } yield dist(proj(i), proj(j)) / dist(orig(i), orig(j))
    // 16 projected dims ⇒ per-pair distortion stddev ≈ 1/√16; loose bounds
    assert(ratios.forall(r => r > 0.3 && r < 2.2),
      s"distance ratio escaped JL bounds: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean distortion off: $mean")
  }
}
