package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Incremental view maintenance for ALGEBRAIC aggregates (count/sum/min/
  * max — the Gray et al. "Data Cube" classification): a stored
  * partial-aggregate table absorbs each delta batch with ONE keyed merge
  * over the GROUPS, never a rescan of the base data. This is the batch
  * face of what Structured Streaming's state store does per micro-batch,
  * and the maintenance pattern behind materialized views and rollup
  * tables at 100 TB: base-table cost is paid once at build, every refresh
  * is O(|delta| + |groups|).
  *
  * Value columns are pinned in integer cent-space ([[ExactRound.eScaled]]
  * at 2 digits) so the partials are EXACTLY mergeable — a float partial
  * sum would make the merged result depend on batch arrival order, which
  * is precisely what a maintained view must not do. `avg` and friends are
  * derived from (sum, count) at read time, not stored.
  *
  * Holistic aggregates (exact distinct, exact quantiles) are NOT
  * algebraic and deliberately absent — the engine's sketch gates
  * (`agg_distinct_sketch`, `agg_quantile_sketch`) are the mergeable
  * stand-ins for those at scale.
  */
object IncrementalAgg {

  /** Partial state per group: n_rows plus, per value column `v`,
    * `{v}_sum_e2` / `{v}_min_e2` / `{v}_max_e2` (exact integer cents). */
  def partials(df: DataFrame, groupCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && valCols.nonEmpty)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: valCols.flatMap { v =>
      val e2 = ExactRound.eScaled(col(v), 2).cast("long")
      Seq(sum(e2).as(s"${v}_sum_e2"), min(e2).as(s"${v}_min_e2"),
        max(e2).as(s"${v}_max_e2"))
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge any number of partial-state frames (same schema) into one:
    * counts and sums add, mins/maxes fold — associative and commutative,
    * so batch arrival order cannot matter. */
  def merge(states: Seq[DataFrame], groupCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    require(states.nonEmpty)
    val aggs: Seq[Column] = sum(col("n_rows")).as("n_rows") +:
      valCols.flatMap { v =>
        Seq(sum(col(s"${v}_sum_e2")).as(s"${v}_sum_e2"),
          min(col(s"${v}_min_e2")).as(s"${v}_min_e2"),
          max(col(s"${v}_max_e2")).as(s"${v}_max_e2"))
      }
    states.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
