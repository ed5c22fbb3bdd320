package graft

import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** [[graft.functions.ExactRound]] — the engine-proof quotient pin. The Spark
  * side must agree with the BigDecimal HALF_UP (away-from-zero) reference on
  * exact ties, the case legacy round(<double>, 6) gets wrong engine-to-engine
  * (CORRECTNESS_r05: profile_lineitem_numeric / report_source_quality). The
  * DuckDB twin is exercised by tools/check.py against the same queries. */
class ExactRoundSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: round(num/den, d) half away from zero, in exact arithmetic. */
  private def ref(num: BigDecimal, den: BigDecimal, d: Int): Double =
    (num / den).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ratioRound matches exact HALF_UP on ties, signs, and scales") {
    // (num, numScale, den, denScale, digits) — includes exact digit-7 ties
    // (1/128 = 0.0078125, 3/800 = 0.00375 at digits=4, …), negatives, and
    // the decimal-sum/count mean shape at each scale used by the queries.
    val cases = Seq(
      ("1.00000000", 8, "128", 0, 6),       // 0.0078125 → .007813 (tie up)
      ("-1.00000000", 8, "128", 0, 6),      // → -0.007813 (away from zero)
      ("3.000000", 6, "800", 0, 4),         // 0.00375 → 0.0038
      ("7.00000000", 8, "2", 0, 6),         // 3.5 exact
      ("1.000000", 6, "3", 0, 6),           // 0.333333… → truncating side
      ("2.000000", 6, "3", 0, 6),           // 0.666666…7 → rounding-up side
      ("123456.78901234", 8, "997", 0, 6),  // arbitrary mean
      ("-0.00000050", 8, "1", 0, 6),        // -5e-7 → -0.000001 (tie, away)
      ("0.00000049", 8, "1", 0, 6),         // → 0
      ("2.3562512345", 10, "4.5437952374", 10, 6), // ndcg shape: dec/dec
      ("999999.9999995", 7, "1", 0, 6),     // carry across the integer part
      ("1234.5678", 4, "1", 0, 2)           // decRound shape: sum at 2
    )
    for ((n, ns, d, ds, dg) <- cases) {
      val row = Seq((BigDecimal(n), BigDecimal(d))).toDF("num", "den")
        .select(ExactRound.ratioRound(
          col("num").cast(s"decimal(38,$ns)"), ns,
          col("den").cast(s"decimal(38,$ds)"), ds, dg).as("r"))
        .head()
      val expected = ref(BigDecimal(n), BigDecimal(d), dg)
      assert(row.getDouble(0) == expected,
        s"ratioRound($n/$d, $dg) = ${row.getDouble(0)} != $expected")
    }
  }

  test("null and zero-denominator guards") {
    val df = Seq(
      (Some(BigDecimal("1.000000")), Some(BigDecimal(0))),
      (None: Option[BigDecimal], Some(BigDecimal(3))),
      (Some(BigDecimal("1.000000")), None: Option[BigDecimal])
    ).toDF("num", "den")
      .select(ExactRound.ratioRound(col("num"), 6, col("den"), 0, 6).as("r"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("ratioRound6PosLong equals the decimal path on integer ratios") {
    // The hot-path twin must be bit-identical to the general form for every
    // non-negative integer ratio (incl. exact ties like 1/128).
    val cases = Seq((1L, 128L), (0L, 7L), (7L, 2L), (1L, 3L), (2L, 3L),
      (999999L, 1000000L), (63L, 128L), (5L, 1L), (123456789L, 997L))
    for ((n, d) <- cases) {
      val row = Seq((n, d)).toDF("n", "d")
        .select(
          ExactRound.ratioRound6(col("n"), 0, col("d")).as("dec"),
          ExactRound.ratioRound6PosLong(col("n"), col("d")).as("lng"))
        .head()
      assert(row.getDouble(0) == row.getDouble(1), s"$n/$d")
    }
    val nulls = Seq((Some(1L), Some(0L)), (None: Option[Long], Some(3L)),
      (Some(1L), None: Option[Long]))
      .toDF("n", "d")
      .select(ExactRound.ratioRound6PosLong(col("n"), col("d")).as("r"))
    assert(nulls.collect().forall(_.isNullAt(0)))
  }

  test("round6GeLong matches round-then-compare and rejects off-grid thresholds") {
    val pairs = Seq((1L, 128L), (333333L, 1000000L), (1L, 2L), (499999L, 1000000L),
      (999999L, 2000000L), (63L, 126L), (0L, 5L))
    for (theta <- Seq(0.5, 0.007813, 0.000001); (n, d) <- pairs) {
      val row = Seq((n, d)).toDF("n", "d")
        .select(ExactRound.round6GeLong(col("n"), col("d"), theta).as("fast"),
          (ExactRound.ratioRound6PosLong(col("n"), col("d")) >= theta).as("slow"))
        .head()
      assert(row.getBoolean(0) == row.getBoolean(1), s"$n/$d vs $theta")
    }
    // Off the 1e-6 grid (1/3) or below it: silently-divergent thresholds
    // are rejected at construction, not at row time.
    intercept[IllegalArgumentException] {
      ExactRound.round6GeLong(col("n"), col("d"), 1.0 / 3)
    }
    intercept[IllegalArgumentException] {
      ExactRound.round6GeLong(col("n"), col("d"), 1e-7)
    }
  }

  test("eScaled floor-prescale recovers the grid integer and is sign-uniform") {
    // floor(x·10^d + 0.5) must recover N for any double x that is the
    // nearest-double of N/10^d (the on-grid case every pinned per-row value
    // is in), and apply the same half-up-toward-+inf rule off-grid.
    val cases = Seq(
      (17.0, 6, 17000000L), (0.04, 6, 40000L), (-0.04, 6, -40000L),
      (0.0078125, 6, 7813L),           // true tie at digit 7 → up
      (-0.0078125, 6, -7812L),         // floor(+0.5) is toward +inf for negatives
      (0.1234565, 6, 123457L), (123456.78, 4, 1234567800L),
      (-15.12345678, 8, -1512345678L), (0.0, 6, 0L))
    for ((x, d, want) <- cases) {
      val got = Seq(x).toDF("x")
        .select(ExactRound.eScaled(col("x"), d).as("r")).head().getLong(0)
      assert(got == want, s"eScaled($x, $d) = $got != $want")
    }
  }

  test("ratioRound6Int on prescaled sums equals ratioRound6 on decimal sums") {
    // The version-proof numerator (sum of per-row floor-prescaled longs) must
    // give the same pin as the decimal-cast numerator for on-grid rows.
    val rows = Seq(0.25, 0.1, 0.007813, 0.999999, 0.0, 1.0, 0.333333)
    val df = rows.toDF("x")
    val r = df.agg(
      ExactRound.ratioRound6(sum(col("x").cast("decimal(18,6)")), 6,
        count(lit(1))).as("dec"),
      ExactRound.ratioRound6Int(
        sum(ExactRound.e6(col("x")).cast("decimal(38,0)")), 6,
        count(lit(1))).as("int")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("roundDiv: integer rounded division, ties away, signs, guards") {
    val cases = Seq(
      (7L, 2L, 4L), (-7L, 2L, -4L), (1L, 3L, 0L), (2L, 3L, 1L),
      (5L, 10L, 1L), (-5L, 10L, -1L), (0L, 7L, 0L),
      (1000001L, 2L, 500001L), (999999999999L, 1000000L, 1000000L))
    for ((n, d, want) <- cases) {
      val got = Seq((n, d)).toDF("n", "d")
        .select(ExactRound.roundDiv(col("n"), col("d")).as("r")).head().getLong(0)
      assert(got == want, s"roundDiv($n, $d) = $got != $want")
    }
    val nulls = Seq((Some(1L), Some(0L)), (None: Option[Long], Some(3L)),
      (Some(1L), None: Option[Long])).toDF("n", "d")
      .select(ExactRound.roundDiv(col("n"), col("d")).as("r"))
    assert(nulls.collect().forall(_.isNullAt(0)))
  }

  test("agreement with legacy round away from ties (the common case)") {
    // On non-tie quotients the pin must equal what round(double, 6) produced,
    // so green queries keep their hashes when swapped over.
    val vals = Seq("12.34567849", "0.99999999", "1077.00000001", "-3.14159265")
    for (v <- vals; den <- Seq(1L, 7L, 997L)) {
      val r = Seq((BigDecimal(v), den)).toDF("num", "den")
        .select(ExactRound.ratioRound(col("num").cast("decimal(38,8)"), 8,
          col("den"), 0, 6).as("r")).head().getDouble(0)
      assert(r == ref(BigDecimal(v), BigDecimal(den), 6), s"$v/$den")
    }
  }
}
