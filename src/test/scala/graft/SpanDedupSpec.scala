package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // Docs 1 and 2 share the 5-token run "the quick brown fox jumps"; doc 3
  // repeats its own 5-token run twice back to back; doc 4 is clean; doc 5
  // is too short to hold a window.
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over a lazy dog tonight"),
    (2L, "yesterday the quick brown fox jumps again and again somewhere"),
    (3L, "alpha beta gamma delta eps alpha beta gamma delta eps"),
    (4L, "completely unique words never repeated anywhere else at all"),
    (5L, "tiny doc")
  ).toDF("id", "text")

  test("duplicateSpans: cross-doc and in-doc repeats found, merged maximal") {
    val spans = SpanDedup.duplicateSpans(corpus, "id", "text", 5)
      .as[(Long, Long, Long)].collect().toSet
    // Doc 1: "the quick brown fox jumps" at tokens 1-5; doc 2 at 2-6.
    assert(spans.contains((1L, 1L, 5L)), s"got $spans")
    assert(spans.contains((2L, 2L, 6L)), s"got $spans")
    // Doc 3: windows at start 1 and 6 share a hash; starts 1..6 all sit in
    // doubled text and chain into ONE maximal span 1-10.
    assert(spans.contains((3L, 1L, 10L)), s"got $spans")
    assert(!spans.exists(_._1 == 4L) && !spans.exists(_._1 == 5L))
  }

  test("spanStats: exact token accounting, zero rows for clean docs") {
    val st = SpanDedup.spanStats(corpus, "id", "text", 5)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(st(1L) == ((10L, 1L, 5L)))
    assert(st(3L) == ((10L, 1L, 10L)))
    assert(st(4L) == ((9L, 0L, 0L)))
    assert(st(5L) == ((2L, 0L, 0L)))
  }

  test("removeSpans: duplicated spans cut, kept tokens rejoined in order") {
    val cl = SpanDedup.removeSpans(corpus, "id", "text", 5)
      .as[(Long, String)].collect().toMap
    assert(cl(1L) == "over a lazy dog tonight")
    assert(cl(2L) == "yesterday again and again somewhere")
    assert(cl(3L) == "")
    assert(cl(4L) == "completely unique words never repeated anywhere else at all")
    assert(cl(5L) == "tiny doc")
  }

  test("incremental spans against a stored index equal the batch run restricted to the delta") {
    import org.apache.spark.sql.functions.col
    val delta = corpus.filter($"id" % 2 === 0)   // docs 2, 4
    val rest = corpus.filter($"id" % 2 =!= 0)    // docs 1, 3, 5
    val tag = specTag()
    val t = SpanDedup.buildIndex(rest, "id", "text", 5,
      tag, s"/tmp/graft_spidx_spec/$tag", 4)
    try {
      val inc = SpanDedup.incrementalSpanStats(spark, t, delta, "id", "text", 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val batch = SpanDedup.spanStats(corpus, "id", "text", 5)
        .join(delta.select(col("id")), Seq("id"), "left_semi")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(inc == batch)
      // Non-vacuous: doc 2 shares its span with indexed doc 1.
      assert(inc.exists(r => r._1 == 2L && r._3 > 0))
      // Streaming-leak guard: per-batch probes must not register cache
      // entries — a long-running incrementalSpanStream would accumulate
      // one registry entry + pinned executor storage per micro-batch.
      val before = Caches.size
      SpanDedup.incrementalSpanStats(spark, t,
        delta.withColumn("text", concat($"text", lit(" tail"))),
        "id", "text", 5).collect()
      assert(Caches.size == before,
        "incremental span probe registered cache entries for a per-batch delta")
    } finally spark.sql(s"DROP TABLE IF EXISTS ${t.counts}")
  }

  /** The one place document LENGTH (not corpus size) bounds a sort: the
    * per-doc islands-merge window. A fully-duplicated 10^6-token document
    * (a 10-token phrase repeated 100k times) pushes ~10^6 marked positions
    * through ONE doc partition — linear memory and wall time (measured
    * ~15 s under the 4-thread test session), no OOM, one maximal span. */
  test("pathological 1e6-token document: islands merge stays linear, single span") {
    val phrase = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    val docs = Seq((1L, phrase * 100000), (2L, "clean words only here"))
      .toDF("id", "text")
    val st = SpanDedup.spanStats(docs, "id", "text", 5)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(st(1L) == ((1000000L, 1L, 1000000L)), s"got ${st(1L)}")
    assert(st(2L) == ((4L, 0L, 0L)))
  }

  test("appended count index: probes equal a from-scratch rebuild of the union") {
    val base = corpus.filter($"id".isin(1L, 5L))
    val delta1 = corpus.filter($"id" === 3L)
    // Doc 6 shares its opening 5-token run ONLY with doc 3 — the appended
    // batch — so its mark below proves the appended counts are live.
    val delta2 = corpus.filter($"id".isin(2L, 4L))
      .unionAll(Seq((6L, "alpha beta gamma delta eps and fresh trailing words"))
        .toDF("id", "text"))
    val tagApp = specTag()
    val tApp = SpanDedup.buildIndex(base, "id", "text", 5,
      tagApp, s"/tmp/graft_spidx_spec/$tagApp", 4)
    SpanDedup.appendToIndex(tApp, delta1, "id", "text", 5, 4)
    val tagFull = specTag()
    val tFull = SpanDedup.buildIndex(base.unionAll(delta1), "id", "text", 5,
      tagFull, s"/tmp/graft_spidx_spec/$tagFull", 4)
    try {
      // Recount invariants survive count splitting.
      val inv = (t: SpanDedup.IndexTable) => spark.table(t.counts)
        .agg(count_distinct($"__gh"), sum($"__c")).as[(Long, Long)].head()
      assert(inv(tApp) == inv(tFull))
      // Probe equivalence: a later batch sees the same spans either way.
      val viaApp = SpanDedup.incrementalSpanStats(spark, tApp, delta2, "id", "text", 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val viaFull = SpanDedup.incrementalSpanStats(spark, tFull, delta2, "id", "text", 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(viaApp == viaFull)
      // Non-vacuous both ways: doc 2 marks against BASE doc 1, doc 6 marks
      // against APPENDED doc 3 (its only span partner).
      assert(viaApp.exists(r => r._1 == 2L && r._3 > 0))
      assert(viaApp.exists(r => r._1 == 6L && r._3 > 0),
        "appended counts not visible to probes")
      // Compaction: one row per hash afterwards, content (invariants AND
      // probe results) unchanged.
      SpanDedup.compactIndex(spark, tApp, 4)
      val nRows = spark.table(tApp.counts).count()
      val invC = spark.table(tApp.counts)
        .agg(count_distinct($"__gh"), sum($"__c")).as[(Long, Long)].head()
      assert(nRows == invC._1, "compaction left split counts")
      assert(invC == inv(tFull))
      val viaCompacted = SpanDedup.incrementalSpanStats(spark, tApp, delta2, "id", "text", 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(viaCompacted == viaFull)
    } finally Seq(tApp.counts, tFull.counts)
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  /** Per-run unique tag (the DedupSpec convention): concurrent test JVMs
    * must never share an index path or table name. */
  private def specTag(): String =
    "spec_" + java.util.UUID.randomUUID.toString.replace("-", "").take(12)

  test("streaming incremental spans: per-batch results equal the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rest = corpus.filter($"id" % 2 =!= 0)
    val tag = specTag()
    val t = SpanDedup.buildIndex(rest, "id", "text", 5,
      tag, s"/tmp/graft_spidx_spec/$tag", 4)
    try {
      val rows = corpus.filter($"id" % 2 === 0).as[(Long, String)].collect().toSeq
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Long)]]()
      val query = SpanDedup.incrementalSpanStream(spark, t,
        input.toDF().toDF("id", "text"), "id", "text", 5)(
        (df, id) => got(id) = df.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq)
      try { input.addData(rows); query.processAllAvailable() } finally query.stop()
      val batch = SpanDedup.incrementalSpanStats(spark, t,
        rows.toDF("id", "text"), "id", "text", 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got(0L) == batch && batch.exists(_._3 > 0))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${t.counts}")
  }

  test("repartition-stable: same spans from a reshuffled corpus") {
    val a = SpanDedup.spanStats(corpus, "id", "text", 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = SpanDedup.spanStats(corpus.repartition(7), "id", "text", 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[A, (B, C, D)] = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
