package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1L to 5000L).map(i => (i, i % 100)).toDF("fk", "grp")
  private lazy val keys = (1L to 5000L by 50).map(Tuple1(_)).toDF("k")

  test("semiReduce keeps every true match (no false negatives)") {
    val pruned = BloomPrune.semiReduce(fact, "fk", keys, "k", fpp = 0.03)
    val matches = fact.join(keys, col("fk") === col("k"), "left_semi")
    assert(pruned.join(keys, col("fk") === col("k"), "left_semi").count() ==
      matches.count())
    // The prune is a prune: far fewer survivors than fact rows (100 true
    // members + bloom FPs at ~3%).
    val n = pruned.count()
    assert(n >= 100 && n < 1000, s"pruned to $n of 5000")
  }

  test("pruned exact join equals the un-pruned join") {
    val plain = fact.join(keys, col("fk") === col("k"))
      .groupBy("grp").count().as[(Long, Long)].collect().toMap
    val viaBloom = BloomPrune.semiReduce(fact, "fk", keys, "k")
      .join(keys, col("fk") === col("k"))
      .groupBy("grp").count().as[(Long, Long)].collect().toMap
    assert(viaBloom == plain)
  }

  test("null keys are dropped, probe rejects non-integral keys") {
    val withNull = Seq(Some(1L), None, Some(9999L)).toDF("fk")
    val pruned = BloomPrune.semiReduce(withNull, "fk", keys, "k")
    assert(!pruned.as[Option[Long]].collect().contains(None))
    val strings = Seq("a").toDF("fk")
    intercept[Exception] {
      BloomPrune.semiReduce(strings, "fk", keys, "k").collect()
    }
    // The KEYS side must be integral too: a string build would insert via
    // putBinary while the probe hashes longs — silent false negatives.
    intercept[IllegalArgumentException] {
      BloomPrune.semiReduce(fact, "fk", Seq("a", "b").toDF("k"), "k")
    }
  }

  test("mightContain matches the driver-side filter bit-for-bit") {
    val bytes = BloomPrune.buildFilterBytes(keys, "k", 0.03)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val expected = (1L to 200L).filter(bf.mightContainLong).toSet
    val got = (1L to 200L).map(Tuple1(_)).toDF("fk")
      .filter(BloomPrune.mightContain(col("fk"), bytes))
      .as[Long].collect().toSet
    assert(got == expected)
    assert((1L to 5000L by 50).toSet.subsetOf(
      (1L to 5000L).filter(bf.mightContainLong).toSet))
  }
}
