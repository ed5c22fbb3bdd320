package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-proof `round(num / den, d)` for oracle-pinned quotients.
  *
  * `round(<double quotient>, 6)` is NOT portable across engines: Spark's
  * `round` applies HALF_UP to the double's shortest decimal representation
  * (BigDecimal), while DuckDB rounds the scaled binary double itself —
  * near-tie quotients (e.g. an exact mean ending in …5 at digit 7) come out
  * one ulp-of-decimal apart (`profile_lineitem_numeric` /
  * `report_source_quality`, CORRECTNESS_r05). Casting the quotient to
  * DECIMAL is no better: DuckDB's decimal→decimal cast resolves ties to
  * even while Spark's resolves HALF_UP, and DuckDB evaluates decimal
  * division in DOUBLE to begin with.
  *
  * The portable form computes the rounding in EXACT integer space on both
  * engines and only then produces a double:
  *
  *   m = sign(num) · ⌊(2·|num|·10^(a+b+d) / 10^a  +  |den|·10^(a+b) / 10^b)
  *                    / (2·|den|·10^(a+b) / 10^b)⌋        (all integers)
  *   result = m / 10^d                                    (one IEEE-754 op)
  *
  * i.e. scale numerator and denominator to integers (decimal(38,0) on
  * Spark, HUGEINT on DuckDB), apply the classic half-away-from-zero trick
  * `(2x + y) div (2y)`, and divide the resulting small integer by the exact
  * power of ten in binary — both engines perform the identical
  * correctly-rounded IEEE division, so the hashed doubles are bit-equal.
  *
  * Preconditions (hold by construction for every pinned query):
  * `den ≥ 0`; |num|·10^(numScale+denScale+digits) < 10^37 (fits HUGEINT and
  * decimal(38,·)); |num/den|·10^digits < 2^53 (the rounded integer is
  * double-exact).
  */
object ExactRound {

  private def pow10(e: Int): Column = lit(BigDecimal(10).pow(e))

  /** round(num/den, digits) with ties away from zero, identical on Spark and
    * DuckDB. `numScale`/`denScale` are the decimal scales of the inputs
    * (0 for integer columns); inputs must be exact at those scales. */
  def ratioRound(num: Column, numScale: Int, den: Column, denScale: Int,
      digits: Int): Column = {
    val x = (abs(num.cast(s"decimal(38,$numScale)")) *
      pow10(numScale + denScale + digits)).cast("decimal(38,0)")
    val y = (abs(den.cast(s"decimal(38,$denScale)")) *
      pow10(numScale + denScale)).cast("decimal(38,0)")
    val x2 = (x * lit(2) + y).cast("decimal(38,0)")
    val y2 = (y * lit(2)).cast("decimal(38,0)")
    // x2 - pmod(x2, y2) is divisible by y2, so the decimal division is an
    // exact integer — no engine rounding can touch it.
    val m = ((x2 - pmod(x2, y2)) / y2).cast("decimal(38,0)")
    val signed = when(num < 0, -m).otherwise(m)
    when(num.isNull || den.isNull || den === 0, lit(null).cast("double"))
      .otherwise(signed.cast("double") / lit(math.pow(10, digits)))
  }

  /** Common case: mean-style pin — decimal-exact numerator over an integer
    * count, rounded at 6. */
  def ratioRound6(num: Column, numScale: Int, den: Column): Column =
    ratioRound(num, numScale, den, 0, 6)

  /** Hot-path twin of `ratioRound6(num, 0, den)` for NON-NEGATIVE integer
    * ratios: identical output, but pure long/double arithmetic that stays
    * inside whole-stage codegen — the general path's decimal(38) ops cost
    * ~1 µs/row in BigDecimal, which turned the per-candidate Jaccard
    * verification scan 7× slower at sf0.1. Exactness: x = 2·num·10⁶ + den
    * and the quotient both stay far below 2^53 under the stated
    * precondition, so the long subtraction, the double division, and the
    * final /10⁶ are all exact — bit-identical to the decimal path and to
    * the DuckDB HUGEINT twin.
    * Preconditions: 0 ≤ num, den ≥ 0, num·2·10⁶ + den < 2^53. */
  def ratioRound6PosLong(num: Column, den: Column): Column = {
    val x = num.cast("long") * lit(2000000L) + den.cast("long")
    val y = den.cast("long") * lit(2L)
    val m = ((x - pmod(x, y)) / y).cast("long")
    when(num.isNull || den.isNull || den === 0, lit(null).cast("double"))
      .otherwise(m.cast("double") / lit(1000000.0d))
  }

  /** Round a decimal-exact value (no division) portably at `digits`. */
  def decRound(v: Column, scale: Int, digits: Int): Column =
    ratioRound(v, scale, lit(1L), 0, digits)

  /** Predicate form of `ratioRound6PosLong(num, den) >= theta` that never
    * computes the ratio: by monotonicity of half-up rounding,
    * round6(n/d) ≥ θ  ⇔  2·10⁶·n ≥ (2·10⁶·θ − 1)·d — a pure long compare
    * that stays cheap wherever Catalyst inlines it (e.g. into a join
    * condition, where an inlined rounding expression re-evaluated its
    * operands 7× per candidate). Owns the 10⁻⁶-grid precondition: a θ off
    * the grid (1/3) or below it (1e-7) would silently admit pairs the
    * rounded-compare contract excludes, so it is rejected loudly. Same
    * non-negativity/magnitude preconditions as [[ratioRound6PosLong]]. */
  def round6GeLong(num: Column, den: Column, theta: Double): Column = {
    val t = math.round(theta * 1e6)
    require(t > 0 && math.abs(theta * 1e6 - t) < 1e-9,
      s"threshold $theta is not a positive multiple of 1e-6 — the integer-form " +
        "compare would diverge from round6(num/den) >= theta")
    num.cast("long") * lit(2000000L) >= den.cast("long") * lit(2L * t - 1L)
  }

  // ---- DuckDB oracle twins --------------------------------------------------

  private def pow10Sql(e: Int): String =
    if (e == 0) "CAST(1 AS HUGEINT)"
    else s"CAST('1${"0" * e}' AS HUGEINT)"

  /** DuckDB SQL for [[ratioRound]] — same integer-space computation in
    * HUGEINT. `num`/`den` are SQL expressions exact at the given scales. */
  def ratioRoundSql(num: String, numScale: Int, den: String, denScale: Int,
      digits: Int): String = {
    // |num| as an integer: tighten precision so the 10^scale multiply stays
    // inside DuckDB's 38-digit cap (oracle runs at sf0.01 — 20 integral
    // digits is ample there; the Spark side carries the full 38).
    val a = s"(CAST(abs(CAST(($num) AS DECIMAL(${20 + numScale},$numScale))) " +
      s"* ${pow10Sql(numScale).replace("HUGEINT", "BIGINT")} AS HUGEINT) " +
      s"* ${pow10Sql(denScale + digits)})"
    val b = s"(CAST(abs(CAST(($den) AS DECIMAL(${20 + denScale},$denScale))) " +
      s"* ${pow10Sql(denScale).replace("HUGEINT", "BIGINT")} AS HUGEINT) " +
      s"* ${pow10Sql(numScale)})"
    s"""(CASE WHEN ($num) IS NULL OR ($den) IS NULL OR ($den) = 0 THEN NULL
       | ELSE (CASE WHEN ($num) < 0 THEN -1.0 ELSE 1.0 END) *
       |  CAST((2 * $a + $b) // (2 * $b) AS DOUBLE) / ${math.pow(10, digits)}
       | END)""".stripMargin.linesIterator.mkString(" ")
  }

  def ratioRound6Sql(num: String, numScale: Int, den: String): String =
    ratioRoundSql(num, numScale, den, 0, 6)

  def decRoundSql(v: String, scale: Int, digits: Int): String =
    ratioRoundSql(v, scale, "1", 0, digits)
}
