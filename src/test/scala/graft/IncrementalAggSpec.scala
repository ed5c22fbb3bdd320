package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1.25, 10.00), ("a", 2.50, 5.25), ("b", 0.75, 1.00),
    ("b", 9.00, 2.00), ("c", 4.00, 4.00))
  private val gs = Seq("k")
  private val vs = Seq("x", "y")

  test("merging split batches equals the one-shot partials, any split") {
    val df = rows.toDF("k", "x", "y")
    val whole = IncrementalAgg.partials(df, gs, vs).collect()
      .map(_.toSeq).toSet
    for (splitAt <- 1 until rows.length) {
      val b1 = IncrementalAgg.partials(rows.take(splitAt).toDF("k", "x", "y"), gs, vs)
      val b2 = IncrementalAgg.partials(rows.drop(splitAt).toDF("k", "x", "y"), gs, vs)
      val fwd = IncrementalAgg.merge(Seq(b1, b2), gs, vs).collect().map(_.toSeq).toSet
      val rev = IncrementalAgg.merge(Seq(b2, b1), gs, vs).collect().map(_.toSeq).toSet
      assert(fwd === whole, s"splitAt=$splitAt diverged")
      assert(rev === whole, s"splitAt=$splitAt order-dependent")
    }
  }

  test("cent-space state is exact integers") {
    val p = IncrementalAgg.partials(rows.toDF("k", "x", "y"), gs, vs)
      .filter(col("k") === "a").collect().head
    assert(p.getAs[Long]("n_rows") === 2L)
    assert(p.getAs[Long]("x_sum_e2") === 375L)
    assert(p.getAs[Long]("x_min_e2") === 125L)
    assert(p.getAs[Long]("y_max_e2") === 1000L)
  }
}
