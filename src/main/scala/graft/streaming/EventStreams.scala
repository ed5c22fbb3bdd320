package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time processing over the events table — batch and streaming faces
  * of the same transformations (SURVEY.md §2.10: the reference has no
  * streaming; this is the north-star streaming surface, built the Spark way:
  * one declarative transform applied to either a batch frame or a
  * `readStream` frame with a watermark).
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionAssign(user_id: Long, event_id: Long, session_id: Long)

  /** Session gap: events further apart than this start a new session. */
  val SessionGapUs: Long = 1800L * 1000000L // 30 min in microseconds

  /** Epoch-micros of an event-time column, NTZ-tolerant: `unix_micros` is
    * LTZ-only, and a parquet TIMESTAMP(MICROS) without isAdjustedToUTC now
    * reads as TIMESTAMP_NTZ (Spark 4 NTZ inference over the regenerated
    * testdata). The cast re-declares naive wall time as an instant in the
    * session zone — every entry point pins UTC, so this equals DuckDB's
    * `epoch_us` of the same naive column; on an LTZ column it's a no-op. */
  def tsMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Tumbling hourly counts per event type. Works unchanged on a batch frame
    * or a watermarked streaming frame (append mode emits finalized windows). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming face: parquet file source → 1h watermark → hourly counts. */
  def hourlyTypeCountsStream(spark: SparkSession, path: String): DataFrame = {
    val schema = graft.schema.Schemas.events
    hourlyTypeCounts(
      spark.readStream.schema(schema).parquet(path).withWatermark("ts", "1 hour"))
  }

  /** Stream-static dimension enrichment: each event joined to its user's
    * static attributes (customer dims keyed by custkey). In Structured
    * Streaming a stream-static equi-join is STATELESS — the static side is
    * (re)broadcast per micro-batch, nothing is buffered in state — so this
    * is the scale-safe way to attach dimensions to an event stream; the
    * batch face is the identical transform. Left join: events from unknown
    * users pass through with null dims. */
  def enrichWithUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
        broadcast(users.select(col("c_custkey").as("user_id"),
          col("c_mktsegment"), col("c_nationkey"))),
        Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"), col("c_nationkey"), col("value"))

  /** Streaming exact dedup: drop replayed event ids arriving within the
    * watermark horizon — the streaming face of Dedup.exactAssign for
    * at-least-once sources. State per id is dropped once the watermark
    * passes, so state size tracks the horizon, not the stream. */
  def dedupEventsStream(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark("event_id")

  /** Purchase→click attribution: every purchase joined to ALL of the same
    * user's clicks in the preceding `horizonMinutes` — the interval-join
    * shape ad attribution and conversion tracking run. One declarative
    * transform, two faces:
    *   - batch: an ordinary key + time-range join;
    *   - streaming ([[attributeStream]]): a watermarked STREAM-STREAM join —
    *     Structured Streaming buffers each side only within the watermark ±
    *     the interval bound, so state tracks the horizon, not the stream.
    * Output: (purchase_id, user_id, purchase_s, click_id, click_s). */
  def attributePurchases(purchases: DataFrame, clicks: DataFrame,
      horizonMinutes: Int = 60): DataFrame = {
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("__pts"))
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("__cts"))
    p.join(c, p("user_id") === c("user_id") &&
        col("__cts") <= col("__pts") &&
        col("__cts") >= col("__pts") - expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("purchase_id"), p("user_id"),
        date_format(col("__pts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_s"),
        col("click_id"),
        date_format(col("__cts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_s"))
  }

  /** The stream-stream face of [[attributePurchases]]: both sides
    * watermarked, the join condition carrying the event-time bounds that
    * let the engine expire buffered rows. */
  def attributeStream(purchases: DataFrame, clicks: DataFrame,
      horizonMinutes: Int = 60, watermark: String = "1 hour"): DataFrame =
    attributePurchases(
      purchases.withWatermark("ts", watermark),
      clicks.withWatermark("ts", watermark), horizonMinutes)

  /** Batch sessionization: a new session starts when the gap to the user's
    * previous event exceeds [[SessionGapUs]]. Pure window functions —
    * deterministic (ties ordered by event_id) and oracle-replayable.
    * Output: (user_id, event_id, session_id 1..n per user). */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(tsMicros(col("ts")), 1).over(w)
    val isNew = when(prevTs.isNull ||
      tsMicros(col("ts")) - prevTs > SessionGapUs, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("session_id"))
  }

  /** Streaming sessionization: per-user state (last event time, session
    * counter) via flatMapGroupsWithState. Within a micro-batch the group's
    * events are sorted by event time before folding, so replaying a batch
    * through the stream matches [[sessionizeBatch]] when arrivals respect
    * the watermark. */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionAssign] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), SessionAssign](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[(Long, Long)]) =>
          var (lastUs, sid) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            // epoch µs: getTime carries ms (incl. the nanos' ms part); add sub-ms µs
            val us = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            if (lastUs == Long.MinValue || us - lastUs > SessionGapUs) sid += 1
            lastUs = us
            SessionAssign(userId, e.event_id, sid)
          }
          state.update((lastUs, sid))
          out.iterator
      }
  }
}
