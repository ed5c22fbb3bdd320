package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Time-series densification: resample an event stream onto a dense
  * per-key bucket grid and fill the gaps — the standard preparation step
  * before any windowed model ingests irregular telemetry (a metric that
  * reports only on change must become a dense series before a rolling
  * mean, anomaly detector, or training-window slicer can read it).
  *
  * Scale shape: the dense grid is a per-key GENERATOR
  * (`sequence(lo, hi)` + explode — each key materializes only its own
  * span), never a join against a global calendar dimension, so the row
  * count is Σ_key span_k and the work stays partitioned by key. Gap
  * filling is two frames of per-key windows (carry-forward and
  * carry-back), bounded by the key's span; nothing global, nothing
  * driver-side. All filled values are exact integers (e6-scaled sums,
  * [[ExactRound.roundDiv]] interpolation), so the oracle replays the fill
  * bit for bit.
  *
  * Reference scope note: engine-completeness machinery — the reference
  * has no time dimension at all; this serves the events/product-analytics
  * family (SURVEY.md §2.10 stretch scope).
  */
object TimeSeries {

  /** Hour index of a timestamp column: epoch µs ÷ 3600·10⁶, FLOOR — an
    * exact long both engines compute identically (`//` in DuckDB floors;
    * a plain divide-and-cast truncates toward zero and would diverge by
    * one bucket on pre-1970 timestamps). `x − pmod(x, d)` is divisible by
    * d and ≤ 2⁵³ in magnitude, so the intermediate double quotient is
    * exact. */
  def hourIndex(ts: Column): Column = floorIndex(ts, 3600000000L)

  /** Dense hourly series per `keyCol` over `[min hour, max hour]` of each
    * key, from an event frame with `tsCol` and a non-negative double
    * `valueCol`. Output per (key, h_idx): observed `n_events` /
    * `sum_value_e6` (0 on gap hours), `is_gap` 0/1, `locf_e6`
    * (last-observation-carried-forward sum), and `interp_e6` (linear
    * interpolation between the surrounding observed hours on the integer
    * grid; equals the observed sum on observed hours). Both span
    * endpoints are observed by construction, so LOCF and interpolation
    * are total on the grid. */
  def gapFillHourly(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .select(col(keyCol).as("__k"), hourIndex(col(tsCol)).as("h_idx"),
        ExactRound.e6(col(valueCol)).as("__v"))
      .groupBy("__k", "h_idx")
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val span = hourly.groupBy("__k")
      .agg(min(col("h_idx")).as("__lo"), max(col("h_idx")).as("__hi"))
    val grid = span
      .select(col("__k"), explode(sequence(col("__lo"), col("__hi"))).as("h_idx"))
    val g = grid.join(hourly, Seq("__k", "h_idx"), "left")
    val back = Window.partitionBy("__k").orderBy("h_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("__k").orderBy("h_idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsIdx = when(col("__n").isNotNull, col("h_idx"))
    val w = g.select(col("__k"), col("h_idx"), col("__n"), col("__s"),
      last(col("__s"), ignoreNulls = true).over(back).as("__ps"),
      last(obsIdx, ignoreNulls = true).over(back).as("__pi"),
      first(col("__s"), ignoreNulls = true).over(fwd).as("__ns"),
      first(obsIdx, ignoreNulls = true).over(fwd).as("__ni"))
    w.select(col("__k").as(keyCol), col("h_idx"),
      coalesce(col("__n"), lit(0L)).as("n_events"),
      coalesce(col("__s"), lit(0L)).as("sum_value_e6"),
      when(col("__n").isNull, 1L).otherwise(0L).as("is_gap"),
      col("__ps").as("locf_e6"),
      when(col("__n").isNotNull, col("__s")).otherwise(
        ExactRound.roundDiv(
          col("__ps") * (col("__ni") - col("h_idx")) +
            col("__ns") * (col("h_idx") - col("__pi")),
          col("__ni") - col("__pi"))).as("interp_e6"))
  }

  /** DuckDB twin of [[gapFillHourly]] over a CTE `evCte(k, h_idx, v_e6)`
    * (pre-scaled e6 values): CTE block ending in `tsout` with the same
    * seven output columns (`k` as the key column name). */
  def gapFillCtesSql(evCte: String, keyOut: String): String = {
    val rd = ExactRound.roundDivSql(
      "prev_s * (nxt_i - h_idx) + nxt_s * (h_idx - prev_i)",
      "nxt_i - prev_i")
    s"""tshourly AS (SELECT k, h_idx, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(v_e6) AS BIGINT) AS s
       |  FROM $evCte GROUP BY 1, 2),
       |tsspan AS (SELECT k, min(h_idx) AS lo, max(h_idx) AS hi
       |  FROM tshourly GROUP BY 1),
       |tsgrid AS (SELECT k, unnest(generate_series(lo, hi)) AS h_idx FROM tsspan),
       |tsg AS (SELECT g.k, g.h_idx, h.n, h.s
       |  FROM tsgrid g LEFT JOIN tshourly h ON h.k = g.k AND h.h_idx = g.h_idx),
       |tsw AS (SELECT k, h_idx, n, s,
       |    last_value(s IGNORE NULLS) OVER pw AS prev_s,
       |    last_value(CASE WHEN n IS NOT NULL THEN h_idx END IGNORE NULLS)
       |      OVER pw AS prev_i,
       |    first_value(s IGNORE NULLS) OVER fw AS nxt_s,
       |    first_value(CASE WHEN n IS NOT NULL THEN h_idx END IGNORE NULLS)
       |      OVER fw AS nxt_i
       |  FROM tsg WINDOW
       |    pw AS (PARTITION BY k ORDER BY h_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    fw AS (PARTITION BY k ORDER BY h_idx
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |tsout AS (SELECT k AS $keyOut, h_idx,
       |    coalesce(n, 0) AS n_events, coalesce(s, 0) AS sum_value_e6,
       |    CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       |    prev_s AS locf_e6,
       |    CASE WHEN n IS NOT NULL THEN s ELSE $rd END AS interp_e6
       |  FROM tsw)""".stripMargin
  }

  /** Day index — [[hourIndex]]'s daily sibling, same floor discipline. */
  def dayIndex(ts: Column): Column = floorIndex(ts, 86400000000L)

  private def floorIndex(ts: Column, unitUs: Long): Column = {
    val us = graft.streaming.EventStreams.tsMicros(ts).cast("long")
    val d = lit(unitUs)
    ((us - pmod(us, d)) / d).cast("long")
  }

  /** Holt double exponential smoothing (level + trend, Holt 1957) at
    * α = β = ½ in exact e6 integers: each step halves with
    * [[ExactRound.roundDiv]] (ties away from zero), so the smoothed state
    * is an exact integer any engine reproduces — a float Holt fold would
    * pin nothing. Power-of-two smoothing constants are the
    * `events_decayed_value` discipline applied to a two-state recurrence.
    *
    * The fold is inherently sequential PER SERIES but embarrassingly
    * parallel ACROSS series, so each key's ordered values are gathered
    * into one array row (bounded by the series span — the same bound the
    * gap-fill grid already imposes) and folded with the `aggregate` HOF
    * inside codegen; no driver loop, no per-step shuffle. Init state:
    * level = first value, trend = 0 — the DuckDB mirror gets this for
    * free from `list_reduce`'s first-element seeding.
    *
    * Input: one row per (`keyCol`, `idxCol`) with an e6-scaled long
    * `valE6Col` (dense grid — run gap fill first). Output per key:
    * n_points, level_e6, trend_e6, forecast_e6 (= level + trend, the
    * one-step-ahead forecast). */
  def holtLinear(series: DataFrame, keyCol: String, idxCol: String,
      valE6Col: String): DataFrame = {
    val sorted = series
      .groupBy(keyCol)
      .agg(array_sort(collect_list(struct(col(idxCol).as("i"),
        col(valE6Col).cast("long").as("v")))).as("__s"))
    val half = (n: Column) => ExactRound.roundDiv(n, lit(2L))
    sorted.select(col(keyCol),
        size(col("__s")).cast("long").as("n_points"),
        aggregate(
          expr("slice(__s, 2, greatest(size(__s) - 1, 0))"),
          struct(element_at(col("__s"), 1).getField("v").as("l"),
            lit(0L).as("tr")),
          (acc, x) => {
            val newL = half(x.getField("v") + acc.getField("l") +
              acc.getField("tr"))
            val newTr = half(newL - acc.getField("l") + acc.getField("tr"))
            struct(newL.as("l"), newTr.as("tr"))
          }).as("__f"))
      .select(col(keyCol), col("n_points"),
        col("__f.l").as("level_e6"), col("__f.tr").as("trend_e6"),
        (col("__f.l") + col("__f.tr")).as("forecast_e6"))
  }

  /** DuckDB twin of the [[holtLinear]] fold: a RECURSIVE CTE stepping the
    * (level, trend) state down each series — NOT `list_reduce`, whose
    * struct accumulator (DuckDB 1.0) updates in place between field
    * evaluations, so a later field reading `a.l` sees the new level and
    * the fold silently diverges (observed: `{'l','tr'}` lambdas give
    * tr = 4 where the left fold gives 6). The caller's WITH must be
    * RECURSIVE and provide `hser(event_type, ys)`; this block ends in
    * `hfin(event_type, n_points, l, tr)`. */
  def holtRecursiveCtesSql: String = {
    def rdiv2(v: String): String =
      s"(CASE WHEN ($v) < 0 THEN -(((-($v)) + 1) // 2) ELSE (($v) + 1) // 2 END)"
    val newL = rdiv2("hser.ys[hst.i + 1] + hst.l + hst.tr")
    s"""hst(event_type, i, l, tr) AS (
       |  SELECT event_type, 1, ys[1], CAST(0 AS BIGINT) FROM hser
       |  UNION ALL
       |  SELECT hst.event_type, hst.i + 1,
       |    $newL,
       |    ${rdiv2(s"$newL - hst.l + hst.tr")}
       |  FROM hst JOIN hser ON hser.event_type = hst.event_type
       |  WHERE hst.i < len(hser.ys)),
       |hfin AS (SELECT hst.event_type, CAST(len(hser.ys) AS BIGINT) AS n_points,
       |    hst.l, hst.tr
       |  FROM hst JOIN hser ON hser.event_type = hst.event_type
       |  WHERE hst.i = len(hser.ys))""".stripMargin
  }
}
