package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join as a bucketed EQUI-join — the range-join shape
  * engines like DuckDB/Trino special-case with an interval tree, rebuilt
  * here the distributed way (the "binning" range join of Spark literature,
  * e.g. Databricks' range-join optimization): Spark's own planner turns a
  * bare `l.start < r.end AND r.start < l.end` predicate into a
  * BroadcastNestedLoopJoin — O(|L|·|R|) and a driver-memory hazard — so
  * the operator instead:
  *
  *  1. explodes each interval into the fixed-width buckets it touches
  *     (`bucketWidth` in the interval's own units),
  *  2. hash-joins on the bucket id (shuffle-partitionable, AQE-skew-safe),
  *  3. keeps exactly ONE bucket's match per pair — the bucket holding
  *     `greatest(l.start, r.start)` — so no `distinct` pass is needed,
  *  4. applies the exact half-open overlap predicate
  *     `l.start < r.end AND r.start < l.end`.
  *
  * Intervals are HALF-OPEN `[start, end)` with non-negative integer
  * coordinates (epoch micros here; `DIV` is floor only for non-negatives —
  * enforced at the query seam, where the fixture's timestamps are
  * post-1970). Back-to-back sessions that merely touch do not overlap.
  *
  * 100 TB posture: work is |rows| × (interval span ÷ bucketWidth) — pick
  * `bucketWidth` near the median interval length so the blow-up stays
  * O(1)-ish per row; candidate volume per bucket is bounded by the
  * concurrency at that time slice (the join's true output complexity),
  * never by corpus size. A pathological bucket (a flash-crowd time slice)
  * is one hot KEY — AQE skew-join splits it; nothing is all-pairs.
  */
object IntervalJoin {

  /** All (left, right) pairs whose half-open intervals overlap. `left`
    * and `right` must have disjoint column names apart from the four
    * coordinate columns named here; every column of both rides through. */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    // Empty intervals (end == start) overlap nothing under half-open
    // semantics, and an inverted end < start would make sequence() count
    // DOWN, exploding bucket ids the interval never touches — both are
    // dropped up front rather than mis-joined.
    val lv = left.filter(col(lEnd) > col(lStart))
    val rv = right.filter(col(rEnd) > col(rStart))
    val lb = lv.withColumn("__lb", explode(expr(
      s"sequence($lStart DIV $bucketWidth, ($lEnd - 1) DIV $bucketWidth)")))
    val rb = rv.withColumn("__rb", explode(expr(
      s"sequence($rStart DIV $bucketWidth, ($rEnd - 1) DIV $bucketWidth)")))
    lb.join(rb,
        col("__lb") === col("__rb") &&
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        expr(s"greatest($lStart, $rStart) DIV $bucketWidth") === col("__lb"))
      .drop("__lb", "__rb")
  }
}
