package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The fused codegen expression must be bit-identical to the HOF reference
  * formulations — same sums in the same order — including the edge cases
  * (nulls, length mismatch, zero vectors, float inputs). */
class VectorDistanceExprSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private def vec(d: Int): Seq[Double] = Seq.fill(d)(rnd.nextDouble() * 4 - 2)

  private def hof(kind: String): (Column, Column) => Column = kind match {
    case "cosine" => cosineDistance
    case "l2" => l2Distance
    case "negdot" => negDotProduct
  }

  test("fused == HOF on random double vectors, all kinds") {
    val cases = Seq.fill(50)((vec(16), vec(16)))
    val df = cases.toDF("a", "b")
    for (kind <- Seq("cosine", "l2", "negdot")) {
      val rows = df.select(
        fusedDistance(kind)(col("a"), col("b")).as("fast"),
        hof(kind)(col("a"), col("b")).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1), // bit-exact, no tolerance
          s"$kind: fused ${r.getDouble(0)} != hof ${r.getDouble(1)}")
      }
    }
  }

  test("fused == HOF on float vectors (widened)") {
    val df = Seq.fill(20)((vec(8).map(_.toFloat), vec(8).map(_.toFloat)))
      .toDF("a", "b")
    val rows = df.select(
      fusedDistance("cosine")(col("a"), col("b")).as("fast"),
      cosineDistance(col("a").cast("array<double>"), col("b").cast("array<double>")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null element, length mismatch, null array → null; zero vector → NaN") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (null, Seq[java.lang.Double](1.0, 1.0)),
      (Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](1.0, 1.0)))
      .toDF("a", "b")
    val r = df.select(fusedDistance("cosine")(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))
    assert(r(3).getDouble(0).isNaN)
  }

  test("interpreted eval path matches codegen (eval on literals)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Seq(1.0, 2.0, 3.0); val b = Seq(4.0, -5.0, 6.0)
    val e = graft.functions.expr.VectorDistance(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType)), "cosine")
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(fusedDistance("cosine")(col("a"), col("b"))).head().getDouble(0)
    assert(interpreted == viaDf)
  }

  test("unknown kind rejected at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.expr.VectorDistance(
        org.apache.spark.sql.GraftExpressionBridge.expression(lit(1)),
        org.apache.spark.sql.GraftExpressionBridge.expression(lit(2)), "hamming")
    }
  }
}
