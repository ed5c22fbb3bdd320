package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeansExact

/** Pins the exact-kmeans contracts the oracle replay stands on:
  * deterministic seeds, integer argmin with lowest-cid ties, roundDiv
  * means, and the empty-cluster keep rule. */
class KMeansExactSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))

  test("two separated blobs: 2 rounds recover the blob means exactly") {
    // blob A around (0, 0): ids 1-3; blob B around (10, 10): ids 4-6.
    // Seeds = ids 1, 2 (both in A) — round 1 must still split A/B because
    // B's points sit nearer whichever seed, then means separate fully.
    val c = vecs(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.2, 0.0), 3L -> Seq(0.1, 0.1),
      4L -> Seq(10.0, 10.0), 5L -> Seq(10.2, 10.0), 6L -> Seq(10.1, 10.1))
    val cents = KMeansExact.fit(c, "id", "v", 2, 2)
    // e6-scaled exact means: A = (0.1, 0.033333ish via roundDiv), B likewise
    val assigned = KMeansExact.assign(
      KMeansExact.scaledVectors(c, "id", "v"), cents)
      .select($"id", $"__cid").as[(Long, Int)].collect().toMap
    assert(Set(1L, 2L, 3L).map(assigned) != Set(4L, 5L, 6L).map(assigned))
    assert(Set(1L, 2L, 3L).map(assigned).size == 1)
    assert(Set(4L, 5L, 6L).map(assigned).size == 1)
    // the blob-B centroid is the exact roundDiv mean of its e6 coords
    val bCid = assigned(4L)
    assert(cents(bCid).toSeq == Seq(10100000L, 10033333L))
  }

  test("distance ties break toward the lowest cluster id") {
    // a point equidistant from two identical centroids
    val c = vecs(1L -> Seq(1.0), 2L -> Seq(1.0), 3L -> Seq(5.0))
    val sv = KMeansExact.scaledVectors(c, "id", "v")
    val a = KMeansExact.assign(sv,
      Array(Array(3000000L), Array(3000000L)))
      .select($"id", $"__cid").as[(Long, Int)].collect()
    assert(a.forall(_._2 == 0))
  }

  test("an emptied cluster keeps its previous centroid; means are roundDiv") {
    // seeds = ids 1, 2 — IDENTICAL vectors, so the tie rule sends every
    // point to cluster 0 and cluster 1 empties in round 1: it must keep
    // its seed centroid verbatim, while cluster 0's mean is the exact
    // roundDiv (5000000 / 3 rounds half away from zero -> 1666667).
    val c = vecs(1L -> Seq(0.0), 2L -> Seq(0.0), 3L -> Seq(5.0))
    val cents = KMeansExact.fit(c, "id", "v", 2, 1)
    assert(cents(0).toSeq == Seq(1666667L), cents(0).toSeq.toString)
    assert(cents(1).toSeq == Seq(0L))
  }

  test("fitCtesSql emits the round structure the oracle gates execute") {
    val sql = KMeansExact.fitCtesSql("sv", "id", 4, 3)
    assert(sql.contains("ct0 AS MATERIALIZED") && sql.contains("ct3 AS MATERIALIZED"))
    assert(sql.contains("list_inner_product"))
    assert(sql.contains("coalesce(nu.v, p.v)"))
  }
}
