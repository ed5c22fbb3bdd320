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
