package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  /** The operator's portable token hash, recomputed host-side. */
  private def h(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  // a token that ENDS a chunk (hash ≡ 0 mod the default modulus) and
  // filler tokens that don't
  private val brk = Iterator.from(0).map(i => s"w$i")
    .find(w => h(w) % Cdc.DefaultModulus == 0).get
  private val plain = Iterator.from(0).map(i => s"p$i")
    .filter(w => h(w) % Cdc.DefaultModulus != 0).take(6).toSeq

  test("chunk boundary falls AFTER the break token; trailing partial chunk kept") {
    val text = s"${plain(0)} ${plain(1)} $brk ${plain(2)} ${plain(3)}"
    val out = Cdc.chunks(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("chunk_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_tokens") == 3) // p0 p1 brk
    assert(out(1).getAs[Long]("n_tokens") == 2) // p2 p3
    assert(out(0).getAs[String]("chunk_hash") !=
      out(1).getAs[String]("chunk_hash"))
  }

  test("stats counts duplicate chunk copies across documents") {
    val shared = s"${plain(0)} ${plain(1)} $brk"
    val docs = Seq(
      (1L, s"$shared ${plain(2)} ${plain(3)}"),
      (2L, s"$shared ${plain(4)} ${plain(5)}")).toDF("doc_id", "text")
    val st = Cdc.stats(Cdc.chunks(docs, "doc_id", "text")).collect().head
    assert(st.getAs[Long]("total_chunks") == 4)
    assert(st.getAs[Long]("distinct_chunks") == 3) // shared collapses
    assert(st.getAs[Long]("dup_tokens") == 3)      // one extra copy of 3 tokens
  }

  test("store lifecycle: build, probe, O(delta) append, re-probe") {
    val tag = s"cdcspec${System.nanoTime()}"
    val base = Seq((1L, s"${plain(0)} ${plain(1)} $brk ${plain(2)}"))
      .toDF("doc_id", "text")
    val t = Cdc.buildStore(base, "doc_id", "text", Cdc.DefaultModulus,
      tag, s"/tmp/graft_cdc_spec/$tag", 2)
    // delta doc 10 repeats the base's first chunk; doc 11 is all-new
    val delta = Seq(
      (10L, s"${plain(0)} ${plain(1)} $brk ${plain(4)}"),
      (11L, s"${plain(5)} ${plain(3)}")).toDF("doc_id", "text")
    val probe1 = Cdc.probeStore(spark, t, delta, "doc_id", "text",
      Cdc.DefaultModulus).collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("n_known_chunks"), r.getAs[Long]("known_tokens"))).toMap
    assert(probe1(10L) == (1L, 3L)) // the shared 3-token chunk is held
    assert(probe1(11L) == (0L, 0L))
    Cdc.appendToStore(t, delta, "doc_id", "text", Cdc.DefaultModulus, 2)
    // after append every delta chunk is held
    val probe2 = Cdc.probeStore(spark, t, delta, "doc_id", "text",
      Cdc.DefaultModulus).collect()
    assert(probe2.forall(r =>
      r.getAs[Long]("n_known_chunks") == r.getAs[Long]("n_chunks")))
    // recount invariants equal a from-scratch build over the union
    val recount = spark.table(t.chunks)
      .agg(count_distinct(col("chunk_hash")), sum(col("__c")))
      .as[(Long, Long)].collect().head
    val fresh = Cdc.chunks(base.union(delta), "doc_id", "text")
      .agg(count_distinct(col("chunk_hash")), count(lit(1)))
      .as[(Long, Long)].collect().head
    assert(recount == fresh)
  }

  test("pathological document: chunking stays linear in doc length, never quadratic") {
    // 200k tokens in ONE document — the per-doc window sort is the only
    // place doc length (not corpus size) bounds the work (the SpanDedup
    // pathological-bound argument applied to CDC).
    val n = 200000
    val text = (0 until n).map(i => plain(i % plain.size)).mkString(" ")
    val t0 = System.nanoTime()
    val st = Cdc.stats(Cdc.chunks(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text")).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(st.getAs[Long]("total_tokens") == n.toLong)
    // 6 distinct filler tokens → no breaks (none hash to 0 mod 16), one chunk
    assert(st.getAs[Long]("total_chunks") >= 1)
    assert(secs < 120, s"200k-token single doc took $secs s — not linear")
  }

  test("streaming ingest probes then appends per micro-batch") {
    val tag = s"cdcstream${System.nanoTime()}"
    val base = Seq((1L, s"${plain(0)} ${plain(1)} $brk"))
      .toDF("doc_id", "text")
    val t = Cdc.buildStore(base, "doc_id", "text", Cdc.DefaultModulus,
      tag, s"/tmp/graft_cdc_spec/$tag", 2)
    val input = MemoryStream[(Long, String)]
    val results = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val q = Cdc.ingestStream(spark, t,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      Cdc.DefaultModulus, 2) { (batchStats, _) =>
      batchStats.collect().foreach(r => results(r.getLong(0)) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_known_chunks")))
    }
    try {
      // batch 1: repeats the base chunk → fully known
      input.addData((20L, s"${plain(0)} ${plain(1)} $brk"))
      q.processAllAvailable()
      // batch 2: repeats BATCH 1's new content? all-new chunk then
      input.addData((21L, s"${plain(2)} ${plain(3)}"))
      q.processAllAvailable()
      // batch 3: repeats batch 2's chunk — known only because batch 2 appended
      input.addData((22L, s"${plain(2)} ${plain(3)}"))
      q.processAllAvailable()
      assert(results(20L) == (1L, 1L))
      assert(results(21L) == (1L, 0L))
      assert(results(22L) == (1L, 1L))
    } finally q.stop()
  }
}
