package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gap fill: dense grid, zero counts, LOCF, and linear interpolation") {
    // key 1: observations at hours 0 (v=2.0), 0 again (v=1.0), 3 (v=8.0)
    //   → grid 0..3, gaps at 1 and 2; hourly sums e6: h0=3_000_000, h3=8_000_000
    //   interp: h1 = 3M + (8M-3M)·1/3 ≈ 4_666_667, h2 ≈ 6_333_333
    val ev = Seq((1L, ts(0, 10), 2.0), (1L, ts(0, 50), 1.0), (1L, ts(3), 8.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(ev, "user_id", "ts", "value")
      .orderBy("h_idx").collect()
    assert(out.length === 4)
    val base = out.head.getAs[Long]("h_idx")
    assert(out.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 0L, 0L, 1L))
    assert(out.map(_.getAs[Long]("is_gap")).toSeq === Seq(0L, 1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("sum_value_e6")).toSeq ===
      Seq(3000000L, 0L, 0L, 8000000L))
    assert(out.map(_.getAs[Long]("locf_e6")).toSeq ===
      Seq(3000000L, 3000000L, 3000000L, 8000000L))
    assert(out.map(_.getAs[Long]("interp_e6")).toSeq ===
      Seq(3000000L, 4666667L, 6333333L, 8000000L))
    assert(out.forall(_.getAs[Long]("h_idx") - base < 4))
  }

  test("hourIndex floors on pre-1970 timestamps (divide-and-cast would truncate)") {
    // 1969-12-31 23:30 UTC-epoch-wise is -30 min → hour index -1, not 0
    val df = Seq(Tuple1(Timestamp.valueOf("1969-12-31 23:30:00")))
      .toDF("ts")
      .select(TimeSeries.hourIndex(col("ts")).as("h"))
    assert(df.collect().head.getAs[Long]("h") === -1L)
    val pos = Seq(Tuple1(ts(1, 59))).toDF("ts")
      .select(TimeSeries.hourIndex(col("ts")).as("h")).collect().head.getAs[Long]("h")
    val pos2 = Seq(Tuple1(ts(2, 0))).toDF("ts")
      .select(TimeSeries.hourIndex(col("ts")).as("h")).collect().head.getAs[Long]("h")
    assert(pos2 === pos + 1, "hour boundary must advance the index by one")
  }

  test("single-observation key: one-row grid, no gaps, interp = observed") {
    val ev = Seq((7L, ts(5), 4.5)).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(ev, "user_id", "ts", "value").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("is_gap") === 0L)
    assert(r.getAs[Long]("sum_value_e6") === 4500000L)
    assert(r.getAs[Long]("interp_e6") === 4500000L)
    assert(r.getAs[Long]("locf_e6") === 4500000L)
  }

  test("keys densify independently: no cross-key bleed in windows") {
    val ev = Seq((1L, ts(0), 1.0), (1L, ts(2), 3.0),
      (2L, ts(10), 100.0), (2L, ts(11), 200.0))
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(ev, "user_id", "ts", "value")
    assert(out.count() === 5) // key 1: hours 0..2; key 2: hours 10..11
    val k1gap = out.filter(col("user_id") === 1L && col("is_gap") === 1L)
      .collect()
    assert(k1gap.length === 1)
    assert(k1gap.head.getAs[Long]("interp_e6") === 2000000L) // midpoint 1→3
    assert(out.filter(col("user_id") === 2L && col("is_gap") === 1L).count() === 0)
  }

  test("holtLinear: left fold with roundDiv halving, hand-computed") {
    // ys = [10, 20, 30]: (l,tr) = (10,0) -> (15,3) -> (24,6); forecast 30
    val ser = Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 2L, 30L),
      ("b", 0L, 7L)) // single point: level=first, trend=0
      .toDF("k", "i", "v")
    val got = TimeSeries.holtLinear(ser, "k", "i", "v").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("a") === ((3L, 24L, 6L, 30L)))
    assert(got("b") === ((1L, 7L, 0L, 7L)))
  }

  test("holtLinear: constant series pins level, zero trend; negative dips round away from zero") {
    val const = (0L until 10L).map(i => ("c", i, 5000000L)).toDF("k", "i", "v")
    val c = TimeSeries.holtLinear(const, "k", "i", "v").collect().head
    assert(c.getAs[Long]("level_e6") === 5000000L)
    assert(c.getAs[Long]("trend_e6") === 0L)
    // decreasing series: trend strictly negative
    val dec = (0L until 10L).map(i => ("d", i, 1000L - i * 100L)).toDF("k", "i", "v")
    val d = TimeSeries.holtLinear(dec, "k", "i", "v").collect().head
    assert(d.getAs[Long]("trend_e6") < 0L)
    assert(d.getAs[Long]("forecast_e6") < d.getAs[Long]("level_e6"))
  }
}
