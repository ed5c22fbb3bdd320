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
    } finally spark.sql(s"DROP TABLE IF EXISTS ${t.counts}")
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
