package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Table profiling — the `ANALYZE TABLE`/data-quality surface: per-column
  * counts, null counts, distinct cardinalities, and value ranges, computed
  * in ONE scan regardless of how many columns are profiled (all aggregates
  * ride a single agg node; the per-column rows come from exploding the
  * 1-row result, not from re-scanning). At 100 TB profiling cost is the
  * scan — paying it once for N columns instead of N times is the whole
  * design.
  *
  * Doubles are decimal-summed (order-independent) and the mean is rounded
  * in exact integer space (ExactRound) — `round(<double quotient>, 6)` is
  * engine-sensitive on near-tie means and failed the r5 driver gate here.
  */
object Profile {

  /** One row per numeric column: (column, n_rows, n_null, n_distinct,
    * min_v, max_v, mean_v). `mean_v` is null for all-null columns. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    def aggsFor(c: String): Seq[Column] = Seq(
      count(lit(1)).as(s"__${c}_n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
      count_distinct(col(c)).as(s"__${c}_nd"),
      round(min(col(c)).cast("double"), 6).as(s"__${c}_min"),
      round(max(col(c)).cast("double"), 6).as(s"__${c}_max"),
      ExactRound.ratioRound6(sum(col(c).cast("decimal(28,8)")), 8,
        count(col(c))).as(s"__${c}_mean"))
    val all = cols.flatMap(aggsFor)
    val one = df.agg(all.head, all.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__${c}_n").as("n_rows"), col(s"__${c}_nn").as("n_null"),
        col(s"__${c}_nd").as("n_distinct"), col(s"__${c}_min").as("min_v"),
        col(s"__${c}_max").as("max_v"), col(s"__${c}_mean").as("mean_v"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
