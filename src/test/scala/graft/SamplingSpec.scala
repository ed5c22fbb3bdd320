package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "payload")

  test("hashSample: deterministic, near-nominal rate, repartition-stable") {
    val a = Sampling.hashSample(rows, "id", 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 2000.0 - 0.2) < 0.05, s"rate ${a.size / 2000.0}")
  }

  test("hashSplit: total, disjoint, near-nominal shares, stable under growth") {
    val split = Sampling.hashSplit(rows, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 2000)
    val shares = split.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(shares("train") - 0.8) < 0.05)
    assert(math.abs(shares("val") - 0.1) < 0.03)
    // growth stability: assignments of old rows unchanged when corpus doubles
    val grown = (1L to 4000L).map(i => (i, s"row$i")).toDF("id", "payload")
    val splitGrown = Sampling.hashSplit(grown, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    split.foreach { case (id, s) => assert(splitGrown(id) == s) }
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException](
      Sampling.hashSplit(rows, "id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("weightedSample: deterministic, repartition-stable, weight-sensitive, excludes w<=0") {
    val weighted = rows.withColumn("w",
      when(col("id") === 7L, lit(1000000L))  // overwhelming weight
        .when(col("id") % 10 === 0, lit(0L)) // ineligible
        .otherwise(lit(1L)))
    val a = Sampling.weightedSample(weighted, "id", "w", 20)
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSample(weighted.repartition(7), "id", "w", 20)
      .select("id").as[Long].collect().toSeq
    assert(a.toSet == b.toSet, "sample must not depend on physical layout")
    assert(a.size == 20)
    assert(a.contains(7L), "a ~1e6x weight must dominate the top-20")
    assert(!a.exists(_ % 10 == 0), "zero-weight rows can never be sampled")
  }

  test("temperatureMixture: flattens skew, caps rare groups at 1, stays deterministic") {
    // 1600 "en" vs 100 each of four rare langs.
    val skewed = ((1L to 1600L).map(i => (i, "en")) ++
      (1601L to 2000L).map(i => (i, s"rare${i % 4}"))).toDF("id", "grp")
    val kept = Sampling.temperatureMixture(skewed, "grp", "id", 0.5)
    val rates = kept.groupBy("grp").agg(max("rate").as("r"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // τ=0.5 flattens: rare groups keep a HIGHER rate than the dominant one.
    assert(rates("rare1")._1 > rates("en")._1)
    // Rare rates cap at 1 (kept in full) under this budget.
    assert(rates("rare1")._1 == 1.0 && rates("rare1")._2 == 100L)
    // Budget is approximately honored overall.
    val total = kept.count()
    assert(total > 700 && total < 1300, s"kept $total of 2000 at budget 0.5")
    // Deterministic + repartition-stable verdicts.
    val again = Sampling.temperatureMixture(skewed.repartition(7), "grp", "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(skewed, "grp", "id", 0.0)
    }
    // Null groups are budgeted by the groupBy, so the rate join must keep
    // them too (null-safe equality) instead of silently dropping the rows.
    val withNulls = ((1L to 100L).map(i => (i, Option("g"))) ++
      (101L to 200L).map(i => (i, Option.empty[String]))).toDF("id", "grp")
    val keptNull = Sampling.temperatureMixture(withNulls, "grp", "id", 0.8)
      .filter(col("grp").isNull).count()
    assert(keptNull > 20, s"null group should be sampled, kept $keptNull")
  }

  test("tokenBudget: token-share targets, first-past-the-post fill, repartition-stable") {
    import spark.implicits._
    // Group a: 10 docs × 10 tokens (100); group b: 5 docs × 10 tokens (50).
    // Budget 60 → targets round(60·100/150)=40 and round(60·50/150)=20.
    val docs = ((1 to 10).map(i => ("a", i.toLong, 10L)) ++
      (11 to 15).map(i => ("b", i.toLong, 10L))).toDF("src", "id", "nt")
    val out = Sampling.tokenBudget(docs, "src", "id", "nt", 60L)
    val perGroup = out.groupBy("src")
      .agg(sum($"n_tokens").as("kept"), max($"target_tokens").as("tgt"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(perGroup("a") == ((40L, 40L)), s"got $perGroup")
    assert(perGroup("b") == ((20L, 20L)), s"got $perGroup")
    // First-past-the-post: a doc crossing the boundary is kept, so a
    // non-divisible budget overshoots by < 1 document.
    val odd = Sampling.tokenBudget(docs, "src", "id", "nt", 55L)
      .filter($"src" === "a")
      .agg(sum($"n_tokens"), max($"target_tokens")).as[(Long, Long)].head()
    assert(odd._2 == 37L && odd._1 == 40L, s"got $odd") // 4 docs cover target 37
    // Repartition-stable: the kept SET is identical from any layout.
    val a = out.select($"id").as[Long].collect().toSet
    val b = Sampling.tokenBudget(docs.repartition(7), "src", "id", "nt", 60L)
      .select($"id").as[Long].collect().toSet
    assert(a == b)
  }

  test("stratifiedSample: exact quota per stratum (or all rows if fewer)") {
    val strat = rows.withColumn("g", (col("id") % 4).cast("string"))
    val out = Sampling.stratifiedSample(strat, "g", "id", 10)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(out.values.forall(_ == 10) && out.size == 4)
    val tiny = strat.filter(col("id") <= 6) // stratum sizes 1-2
    val outTiny = Sampling.stratifiedSample(tiny, "g", "id", 10).count()
    assert(outTiny == 6)
  }
}
