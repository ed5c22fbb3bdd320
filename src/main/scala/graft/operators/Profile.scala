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
  * The profiled stats are pinned as MICRO-SCALED INTEGERS (`*_e6` BIGINT
  * columns): each row is prescaled with `floor(x·10⁶ + 0.5)` — one IEEE
  * multiply plus an exact floor, bit-identical on any engine reading the
  * same input, even for values off the decimal grid — then min/max/mean
  * stay in exact integer space end to end (decimal(38,0) sums; rounded
  * division in the integer `(2x+y) div 2y` form). No double ever reaches
  * the output, so no engine's rounding or decimal-typing rules can touch
  * the pin: the r5/r6 `round(<double quotient>, 6)` and DECIMAL-product
  * hash fails cannot recur by construction (ExactRound's scaladoc has the
  * version audit).
  */
object Profile {

  /** One row per numeric column: (column, n_rows, n_null, n_distinct,
    * min_e6, max_e6, mean_e6) with the value stats as micro-units (×10⁶)
    * BIGINTs. `mean_e6` is null for all-null columns; mean_e6 =
    * round(10⁶·Σx/n) over the micro-quantized rows. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    def aggsFor(c: String): Seq[Column] = {
      val e6 = ExactRound.e6(col(c))
      Seq(
        count(lit(1)).as(s"__${c}_n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
        count_distinct(col(c)).as(s"__${c}_nd"),
        min(e6).as(s"__${c}_min"),
        max(e6).as(s"__${c}_max"),
        ExactRound.roundDiv(sum(e6.cast("decimal(38,0)")), count(col(c)))
          .as(s"__${c}_mean"))
    }
    val all = cols.flatMap(aggsFor)
    val one = df.agg(all.head, all.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__${c}_n").as("n_rows"), col(s"__${c}_nn").as("n_null"),
        col(s"__${c}_nd").as("n_distinct"), col(s"__${c}_min").as("min_e6"),
        col(s"__${c}_max").as("max_e6"), col(s"__${c}_mean").as("mean_e6"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
