package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** The streaming faces must agree with their batch faces: same transform,
  * same results once all data has been processed. */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private val batch1 = Seq(
    Event(1L, ts(0), 100L, "click", 1.0),
    Event(2L, ts(5), 100L, "click", 2.0),
    Event(3L, ts(10), 200L, "view", 3.0))
  private val batch2 = Seq(
    Event(4L, ts(50), 100L, "click", 4.0), // 45-min gap → new session for user 100
    Event(5L, ts(55), 200L, "view", 5.0),  // 45-min gap → new session for user 200
    Event(6L, ts(60), 100L, "purchase", 6.0))

  test("stream-static enrichment matches the batch join and stays stateless") {
    val users = Seq((100L, "BUILDING", 7L), (200L, "MACHINERY", 3L))
      .toDF("c_custkey", "c_mktsegment", "c_nationkey")
    val input = MemoryStream[Event]
    val query = EventStreams.enrichWithUsers(input.toDF(), users)
      .writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2 :+ Event(7L, ts(61), 999L, "click", 7.0)) // unknown user
      query.processAllAvailable()
      val streamed = spark.table("enrich_t").collect().map(_.toSeq).toSet
      val batch = EventStreams.enrichWithUsers(
        (batch1 ++ batch2 :+ Event(7L, ts(61), 999L, "click", 7.0)).toDF(), users)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.exists(r => r(1) == 999L && r(3) == null)) // left-join pass-through
      // stateless: the progress report carries no stateOperators entries
      assert(query.lastProgress == null ||
        query.lastProgress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("stream-stream attribution join matches the batch interval join") {
    val pIn = MemoryStream[Event]
    val cIn = MemoryStream[Event]
    val query = EventStreams.attributeStream(pIn.toDF(), cIn.toDF(),
        horizonMinutes = 60, watermark = "2 hours")
      .writeStream.format("memory").queryName("attr_t")
      .outputMode("append").start()
    val clicks = batch1 ++ Seq(Event(4L, ts(50), 100L, "click", 4.0))
    val purchases = Seq(
      Event(6L, ts(60), 100L, "purchase", 6.0),  // clicks at 0,5,50 in window
      Event(8L, ts(70), 200L, "purchase", 8.0))  // event 3 sits exactly on the -60min boundary
    try {
      cIn.addData(clicks); query.processAllAvailable()
      pIn.addData(purchases); query.processAllAvailable()
      val streamed = spark.table("attr_t").collect().map(_.toSeq).toSet
      val batch = EventStreams.attributePurchases(
        purchases.toDF(), clicks.toDF(), horizonMinutes = 60)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // purchase 6 attributes to events 1, 2, 4 (within 60 min); purchase 8
      // to event 3, exactly on the inclusive -60min boundary
      assert(streamed.map(r => (r(0), r(3))) ==
        Set((6L, 1L), (6L, 2L), (6L, 4L), (8L, 3L)))
      // stream-stream join is stateful — but bounded by the watermark
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("streaming hourly counts (complete mode) match the batch transform") {
    val input = MemoryStream[Event]
    val query = EventStreams.hourlyTypeCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_t")
      .outputMode("complete").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val streamed = spark.table("hourly_t").collect().map(_.toSeq).toSet
      val batch = EventStreams.hourlyTypeCounts((batch1 ++ batch2).toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("stateful streaming sessionization matches batch sessionization across batches") {
    val input = MemoryStream[Event]
    val query = EventStreams.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val streamed = spark.table("sessions_t")
        .as[(Long, Long, Long)].collect().toSet
      val batch = EventStreams.sessionizeBatch((batch1 ++ batch2).toDF())
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      // sanity: user 100 got two sessions, events 1,2 in s1 and 4,6 in s2
      val byEvent = streamed.map(t => t._2 -> t._3).toMap
      assert(byEvent(1L) == 1L && byEvent(2L) == 1L)
      assert(byEvent(4L) == 2L && byEvent(6L) == 2L)
    } finally query.stop()
  }

  test("stateful streaming debounce matches the batch lag form across batches") {
    val input = MemoryStream[Event]
    val query = EventStreams.debounceStream(input.toDS())
      .writeStream.format("memory").queryName("debounce_t")
      .outputMode("append").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      // batch2's click (min 50) is 45 min after user 100's last click at
      // min 5 → kept; state must have survived the batch boundary
      input.addData(batch2); query.processAllAvailable()
      val streamed = spark.table("debounce_t")
        .select("event_id", "keep").as[(Long, Boolean)].collect().toMap
      // batch twin: the exact lag-form expressions events_debounce uses
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
      val us = EventStreams.tsMicros(col("ts"))
      val batch = (batch1 ++ batch2).toDF()
        .withColumn("__gap", us - lag(us, 1).over(w))
        .select(col("event_id"), (col("__gap").isNull ||
          col("__gap") >= EventStreams.DebounceGapUs).as("keep"))
        .as[(Long, Boolean)].collect().toMap
      assert(streamed == batch)
      // the 5-min gap between events 1 and 2 sits exactly ON the
      // threshold → kept (>=, both faces)
      assert(streamed(1L) && streamed(2L))
    } finally query.stop()
  }

  test("stateful streaming funnel matches batch funnel across batches") {
    val input = MemoryStream[Event]
    val query = EventStreams.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_t")
      .outputMode("append").start()
    // user 100: click@0, view@10, click@50, purchase@60 — the click BEFORE
    // the first view must not count; user 200: view only → step 1.
    val f1 = Seq(
      Event(1L, ts(0), 100L, "click", 1.0),
      Event(2L, ts(10), 100L, "view", 2.0),
      Event(3L, ts(12), 200L, "view", 3.0))
    val f2 = Seq(
      Event(4L, ts(50), 100L, "click", 4.0),
      Event(5L, ts(60), 100L, "purchase", 5.0))
    try {
      input.addData(f1); query.processAllAvailable()
      input.addData(f2); query.processAllAvailable()
      // append mode emits the user's standing per batch — the LAST row per
      // user is the final state, which must equal the batch face.
      val streamed = spark.table("funnel_t")
        .groupBy("user_id").agg(max(struct(col("furthest_step"),
          col("t1_us"), col("t2_us"), col("t3_us"))).as("s"))
        .select(col("user_id"), col("s.t1_us"), col("s.t2_us"), col("s.t3_us"),
          col("s.furthest_step"))
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.funnelBatch((f1 ++ f2).toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // user 100 reached step 3 via the click AFTER the view
      val u100 = batch.find(_.head == 100L).get
      assert(u100(4) == 3L)
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("streaming session windows emit closed sessions matching the batch face") {
    val input = MemoryStream[Event]
    val query = EventStreams.sessionWindows(
        input.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("swin_t")
      .outputMode("append").start()
    val early = Seq(
      Event(1L, ts(0), 100L, "click", 1.0),
      Event(2L, ts(5), 100L, "view", 2.0),
      Event(3L, ts(10), 200L, "view", 3.0))
    try {
      input.addData(early); query.processAllAvailable()
      // a far-future event advances the watermark past both early sessions
      input.addData(Event(9L, ts(600), 300L, "click", 9.0))
      query.processAllAvailable()
      val streamed = spark.table("swin_t").collect().map(_.toSeq).toSet
      val batchAll = EventStreams.sessionWindows(early.toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batchAll,
        s"closed sessions must match the batch face: $streamed vs $batchAll")
      assert(query.lastProgress.stateOperators.nonEmpty)
    } finally query.stop()
  }

  test("streaming dedup drops replayed event ids across batches") {
    val input = MemoryStream[Event]
    val query = EventStreams.dedupEventsStream(input.toDF())
      .select("event_id")
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch1); query.processAllAvailable() // full replay
      input.addData(batch2); query.processAllAvailable()
      val ids = spark.table("dedup_t").as[Long].collect().toSeq
      assert(ids.sorted == (1L to 6L).toSeq, s"got $ids")
    } finally query.stop()
  }

  test("streaming sliding windows match the batch face in complete mode") {
    // the stream face swaps exact distinct for the HLL sketch (Structured
    // Streaming rejects exact distinct agg), so parity is pinned on the
    // window keys + event counts, and the sketch column is bound-checked
    val input = MemoryStream[Event]
    val q = EventStreams.slidingActivityCountsSketch(input.toDF())
      .writeStream.format("memory").queryName("slide_t")
      .outputMode("complete").start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("slide_t")
        .select("w_start", "n_events").collect().map(_.toSeq).toSet
      val batch = EventStreams.slidingActivityCounts((batch1 ++ batch2).toDF())
        .select("w_start", "n_events").collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // every event lands in exactly 4 windows: n_events sums to 4x
      val total = spark.table("slide_t").agg(sum("n_events")).as[Long].head()
      assert(total == 4L * (batch1.size + batch2.size), s"got $total")
      // sketch distinct counts stay within 10% of exact (tiny data: exact)
      val users = spark.table("slide_t").agg(max("n_users")).as[Long].head()
      assert(users >= 1L && users <= 2L, s"got $users")
    } finally q.stop()
  }

  test("file-source streaming hourly counts run against the events table") {
    // copy a slice of the real events table into a stream-source dir
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    import graft.io.Tables
    Tables.events(spark, "/root/testdata/sf0.001").limit(200)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val query = EventStreams.hourlyTypeCountsStream(spark, dir)
      .writeStream.format("memory").queryName("hourly_file_t")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // append mode only emits watermark-finalized windows; just prove the
      // stream runs end to end and the schema matches the batch face
      val got = spark.table("hourly_file_t")
      assert(got.columns.toSeq == Seq("hour", "event_type", "n", "sum_value"))
    } finally query.stop()
  }
}
