package graft

import org.apache.spark.sql.functions._

/** The storage-sweep contract ([[Caches.sweepCheckpoints]]): dead
  * localCheckpoint blocks are freed between bench queries, while blocks a
  * registered (memo-shared) frame still depends on are protected — and the
  * frame keeps answering correctly after the sweep. */
class CachesSpec extends SparkSpec {

  private def liveCheckpointIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.collect {
      case (id, rdd)
          if org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(rdd) =>
        id
    }.toSet

  test("sweep frees unprotected checkpoints, keeps memo-protected ones") {
    Caches.clear()
    Caches.sweepCheckpoints(spark.sparkContext) // start from a clean slate
    val before = liveCheckpointIds

    // a dead checkpoint: nothing references it after this block
    val dead = spark.range(0, 100).select(col("id")).localCheckpoint()
    dead.count()

    // a protected checkpoint: a memo-registered frame reads it
    val memo = Caches.memo(spark, s"caches-spec-${System.nanoTime()}")(
      spark.range(0, 50).select((col("id") * 2).as("x")).localCheckpoint())
    assert(memo.count() == 50)

    val added = liveCheckpointIds -- before
    assert(added.size == 2, s"expected 2 new checkpoints, saw $added")

    Caches.sweepCheckpoints(spark.sparkContext)
    val after = liveCheckpointIds -- before
    assert(after.size == 1, s"expected only the protected checkpoint, saw $after")
    assert(Caches.protectedRddIds.intersect(after).nonEmpty)
    // the protected frame still answers after the sweep
    assert(memo.agg(sum(col("x"))).head().getLong(0) == 49L * 50L)

    Caches.clear()
    Caches.sweepCheckpoints(spark.sparkContext)
    assert((liveCheckpointIds -- before).isEmpty)
  }
}
