package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm

/** The stored LM's lifecycle algebra: O(delta) append ≡ rebuild,
  * delete ∘ append ≡ id (exact decrement), compaction purges net-zero
  * without changing any score, and scoring is insensitive to how counts
  * were split across ingest batches. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select($"doc_id", $"text")
  private def delta = docs.filter($"doc_id" % 10 === 0)
  private def base = docs.filter($"doc_id" % 10 =!= 0)

  private def scores(t: NgramLm.LmTables): Seq[String] =
    NgramLm.scoreDocs(spark, t, delta, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq

  test("append ingest equals a from-scratch rebuild; split counts are invisible to scoring") {
    val whole = NgramLm.buildStore(base, "text", "lmspec_whole",
      "/tmp/graft_lmspec_whole", 4)
    val half1 = base.filter($"doc_id" % 2 === 1)
    val half2 = base.filter($"doc_id" % 2 === 0)
    val grown = NgramLm.buildStore(half1, "text", "lmspec_grown",
      "/tmp/graft_lmspec_grown", 4)
    NgramLm.appendToStore(grown, half2, "text", 4)
    assert(scores(grown) == scores(whole),
      "base+append must score identically to the one-shot build")
  }

  test("delete is an exact decrement: delete ∘ reingest ≡ id, and deletion equals never-trained") {
    val dead = base.filter($"doc_id" % 4 === 1)
    val t = NgramLm.buildStore(base, "text", "lmspec_del",
      "/tmp/graft_lmspec_del", 4)
    val full = scores(t)
    NgramLm.deleteFromStore(t, dead, "text", 4)
    val afterDelete = scores(t)
    // truth: a model that never saw the dead docs
    val live = NgramLm.buildStore(base.filter($"doc_id" % 4 =!= 1), "text",
      "lmspec_live", "/tmp/graft_lmspec_live", 4)
    assert(afterDelete == scores(live))
    assert(afterDelete != full, "the fixture must actually change scores")
    // compaction purges net-zero grams; no score moves
    NgramLm.compactStore(spark, t, 4)
    assert(spark.table(t.uni).filter($"__c" <= 0L).count() == 0)
    assert(spark.table(t.bi).filter($"__c" <= 0L).count() == 0)
    assert(scores(t) == afterDelete)
    // reingest restores the original model exactly (count stores CAN
    // resurrect — the honest contrast with id-tombstones)
    NgramLm.appendToStore(t, dead, "text", 4)
    assert(scores(t) == full)
  }

  test("streaming scoring equals the batch operator per micro-batch (frozen model)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = NgramLm.buildStore(base, "text", "lmspec_stream",
      "/tmp/graft_lmspec_stream", 4)
    val rows = delta.select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val query = NgramLm.scoreStream(spark, t,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text") { (df, id) =>
      got(id) = df.orderBy("doc_id").collect().map(_.toString).toSeq
    }
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
    } finally query.stop()
    def batchOf(docs: Seq[(Long, String)]): Seq[String] =
      NgramLm.scoreDocs(spark, t, docs.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) == batchOf(b1), "micro-batch 0 must equal its batch twin")
    assert(got(1L) == batchOf(b2), "micro-batch 1 must equal its batch twin")
  }

  test("the maintained (total, V) normalizer equals a from-scratch recount at every lifecycle step") {
    def recount(t: NgramLm.LmTables): (Long, Long, Long) = {
      val r = spark.table(t.uni).groupBy("t")
        .agg(sum($"__c").as("n")).filter($"n" > 0L)
        .agg(coalesce(sum($"n"), lit(0L)).cast("long"), count(lit(1))).head()
      val nb = spark.table(t.bi).groupBy("p", "t")
        .agg(sum($"__c").as("n")).filter($"n" > 0L).count()
      (r.getLong(0), r.getLong(1), nb)
    }
    def stats(t: NgramLm.LmTables): (Long, Long, Long) = {
      val r = spark.table(t.stats)
        .agg(coalesce(sum($"__tot"), lit(0L)).cast("long"),
          coalesce(sum($"__nv"), lit(0L)).cast("long"),
          coalesce(sum($"__nb"), lit(0L)).cast("long")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val half1 = base.filter($"doc_id" % 2 === 1)
    val half2 = base.filter($"doc_id" % 2 === 0)
    val dead = base.filter($"doc_id" % 4 === 1)
    val t = NgramLm.buildStore(half1, "text", "lmspec_stats",
      "/tmp/graft_lmspec_stats", 4)
    assert(stats(t) == recount(t), "build must seed the exact normalizer")
    NgramLm.appendToStore(t, half2, "text", 4)
    assert(stats(t) == recount(t), "append must add new-token mass and vocab")
    NgramLm.deleteFromStore(t, dead, "text", 4)
    assert(stats(t) == recount(t),
      "delete must remove leaving mass and zero-net vocabulary")
    NgramLm.appendToStore(t, dead, "text", 4)
    assert(stats(t) == recount(t), "reingest must restore the normalizer")
    NgramLm.compactStore(spark, t, 4)
    assert(spark.table(t.stats).count() == 1L,
      "compaction collapses the addends to one row")
    assert(stats(t) == recount(t), "compaction changes layout, never the sums")
    // simulate the documented crash window — counts appended, stats addend
    // lost — and verify the explicit repair verb restores consistency
    import graft.operators.Bucketed
    Bucketed.appendBucketedKeys(
      Seq(("zzzcrashtoken", 3L)).toDF("t", "__c"), t.uni, Seq("t"), 4)
    assert(stats(t) != recount(t), "the simulated crash must actually skew")
    NgramLm.recountStats(spark, t)
    assert(stats(t) == recount(t), "recountStats is the crash-window repair")
    assert(spark.table(t.stats).count() == 1L)
  }

  test("stupid-backoff and Kneser-Ney share the store but score differently; OOV stays finite in all three") {
    val t = NgramLm.buildStore(base, "text", "lmspec_backoff",
      "/tmp/graft_lmspec_backoff", 4)
    val interp = NgramLm.scoreDocs(spark, t, delta, "doc_id", "text")
      .orderBy("doc_id").collect()
    val backoff = NgramLm.scoreDocsBackoff(spark, t, delta, "doc_id", "text")
      .orderBy("doc_id").collect()
    val kn = NgramLm.scoreDocsKneserNey(spark, t, delta, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(interp.map(_.getLong(0)).toSeq == backoff.map(_.getLong(0)).toSeq,
      "same docs, same bigram positions")
    assert(interp.map(_.getLong(1)).toSeq == backoff.map(_.getLong(1)).toSeq)
    assert(kn.map(_.getLong(0)).toSeq == interp.map(_.getLong(0)).toSeq)
    assert(kn.map(_.getLong(1)).toSeq == interp.map(_.getLong(1)).toSeq)
    assert(interp.map(_.get(2)).toSeq != backoff.map(_.get(2)).toSeq,
      "interpolated vs backoff must actually differ on this corpus")
    assert(kn.map(_.get(2)).toSeq != interp.map(_.get(2)).toSeq,
      "KN vs interpolated must actually differ on this corpus")
    // fully-OOV text stays finite in every scheme (the floored paths)
    val oovDf = Seq((1L, "zzzunseen wordsthatneverappear anywhere else"))
      .toDF("doc_id", "text")
    Seq[(org.apache.spark.sql.SparkSession, NgramLm.LmTables,
        org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.DataFrame](
      NgramLm.scoreDocsBackoff, NgramLm.scoreDocsKneserNey).foreach { f =>
      val oov = f(spark, t, oovDf, "doc_id", "text").collect()
      assert(oov.length == 1 && !oov.head.isNullAt(2))
    }
  }

  test("unseen grams score finitely through the add-one OOV floor") {
    val t = NgramLm.buildStore(base.limit(50), "text", "lmspec_oov",
      "/tmp/graft_lmspec_oov", 4)
    val scored = NgramLm.scoreDocs(spark, t,
      Seq((1L, "zzzunseen wordsthatneverappear anywhere else"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val rows = scored.collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 3L) // 4 tokens -> 3 bigram positions
    assert(!rows.head.isNullAt(2), "OOV text must score, not NULL/-inf")
  }
}
