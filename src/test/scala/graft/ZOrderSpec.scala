package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent bit-twiddling model of the Morton interleave. */
  private def zModel(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("zValue matches the bit-interleave model on random inputs") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(2048).toLong, rnd.nextInt(2048).toLong))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue($"a", $"b", 11).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == zModel(a, b, 11), s"($a,$b)") }
  }

  test("zValue is monotone in each key within a fixed other-key") {
    // Locality sanity: for fixed b, z grows with a (interleave preserves
    // per-dimension order).
    val df = (0L until 64L).map(a => (a, 5L)).toDF("a", "b")
      .select(ZOrder.zValue($"a", $"b", 7).as("z"))
    val zs = df.as[Long].collect()
    assert(zs.sameElements(zs.sorted))
  }

  test("writeZOrdered produces files with pairwise-disjoint z-ranges") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(2000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val path = s"/tmp/graft_zorder_spec/${java.util.UUID.randomUUID}"
    ZOrder.writeZOrdered(rows.toDF("a", "b"), "a", "b", 10, path, 8)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(perFile.length > 1, "expected multiple output files")
    perFile.sliding(2).foreach {
      case Array((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA <= loB, s"overlapping z-ranges: $fa hi=$hiA vs $fb lo=$loB")
      case _ =>
    }
    // round-trip: no rows lost, z recomputes identically
    val back = spark.read.parquet(path)
      .select($"a", $"b", $"zval",
        ZOrder.zValue($"a", $"b", 10).as("z2"))
    assert(back.filter($"zval" =!= $"z2").count() == 0)
    assert(back.count() == 2000)
  }
}
