package graft

import org.apache.spark.sql.functions._
import graft.operators.Salt

class SaltSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows on one hot key + a few cold keys
  private lazy val skewed = ((1 to 10000).map(i => ("hot", i.toLong, i.toDouble)) ++
    (1 to 50).map(i => (s"cold$i", i.toLong, i.toDouble)))
    .toDF("k", "id", "v")

  test("saltedAgg equals plain aggregation (sum + count + avg recombine)") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Salt.saltedAgg(skewed, Seq("k"), Seq(col("id")), buckets = 16,
      firstPhase = Seq(sum("v").as("s"), count(lit(1)).as("n")),
      secondPhase = Seq(sum("s").as("s"), sum("n").as("n")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n)) =>
      assertNear(salted(k)._1, s, 1e-6); assert(salted(k)._2 == n)
    }
  }

  test("saltedAgg actually spreads the hot key over buckets") {
    val phase1Groups = skewed
      .withColumn("__salt", pmod(xxhash64(col("id")), lit(16L)))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(phase1Groups > 8, s"salt should spread the hot key, got $phase1Groups buckets")
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, "k").groupBy("label").count()
      .as[(String, Long)].collect().toMap
    val salted = Salt.saltedJoin(skewed, dim, "k", Seq(col("id")), buckets = 8)
      .groupBy("label").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("deterministic: same input → identical salted results") {
    val a = Salt.saltedAgg(skewed, Seq("k"), Seq(col("id")), 16,
      Seq(sum("v").as("s")), Seq(sum("s").as("s"))).collect().map(_.toSeq).toSet
    val b = Salt.saltedAgg(skewed, Seq("k"), Seq(col("id")), 16,
      Seq(sum("v").as("s")), Seq(sum("s").as("s"))).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
