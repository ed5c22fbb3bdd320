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
  *
  * ORACLE-SIDE VERSION-PROOFING (round 7). The first DuckDB twins built the
  * scaled integers with `DECIMAL(p,s) * BIGINT` products. DuckDB's decimal
  * multiplication result type is p1+p2 digits, which for a 20+-digit sum
  * times a 19-digit BIGINT exceeds the 38-digit cap — and what happens THEN
  * is a per-version typing rule (saturate to DECIMAL(38,s) on some
  * releases, promote to DOUBLE — silently lossy — on others). The only
  * arithmetic whose result is identical under every DuckDB release is
  * (a) pure integer math (BIGINT/HUGEINT: exact, no typing freedom) and
  * (b) pure IEEE-754 double math (multiply/add/floor: correctly rounded,
  * no engine choice). So the twins below never touch DECIMAL at all:
  * fractional per-row values are pre-scaled to integers with
  * `floor(x · 10^s + 0.5)` — one IEEE multiply, one exact floor, identical
  * on any engine reading the same input double, even OFF the decimal grid —
  * summed as BIGINT (HUGEINT accumulator), and the rounded ratio is the
  * same `(2x+y) div (2y)` trick in HUGEINT. The Spark side mirrors the
  * identical per-row floor (its integer sums ride decimal(38,0), which is
  * engine-internal and exact).
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

  // ---- Integer-prescaled forms (version-proof twins) ------------------------

  /** Per-row micro-scaling `floor(x·10^digits + 0.5)` as LONG — one IEEE
    * multiply plus an exact floor, so ANY engine reading the same input
    * double produces the same integer, grid or no grid. This replaces
    * double→DECIMAL casts in pinned numerators: those recover the same
    * integer only for on-grid values and per-engine cast semantics decide
    * the rest. Precondition: finite x, |x|·10^digits + 0.5 < 2^63. */
  def eScaled(x: Column, digits: Int): Column =
    floor(x.cast("double") * lit(math.pow(10, digits)) + lit(0.5d))

  /** The common 6-digit case. */
  def e6(x: Column): Column = eScaled(x, 6)

  /** [[ratioRound]] for numerators/denominators that are ALREADY integers
    * carrying a logical scale (e.g. a sum of [[eScaled]] rows): value(num) =
    * num / 10^numScale. Output double = round(value ratio, digits), ties
    * away from zero — numerically identical to
    * `ratioRound(num/10^numScale, numScale, den/10^denScale, denScale, d)`
    * and to the HUGEINT SQL twin [[ratioRoundIntSql]]. */
  def ratioRoundInt(num: Column, numScale: Int, den: Column, denScale: Int,
      digits: Int): Column = {
    val x = (abs(num.cast("decimal(38,0)")) * pow10(denScale + digits))
      .cast("decimal(38,0)")
    val y = (abs(den.cast("decimal(38,0)")) * pow10(numScale))
      .cast("decimal(38,0)")
    val x2 = (x * lit(2) + y).cast("decimal(38,0)")
    val y2 = (y * lit(2)).cast("decimal(38,0)")
    val m = ((x2 - pmod(x2, y2)) / y2).cast("decimal(38,0)")
    val signed = when((num < 0) =!= (den < 0), -m).otherwise(m)
    when(num.isNull || den.isNull || den === 0, lit(null).cast("double"))
      .otherwise(signed.cast("double") / lit(math.pow(10, digits)))
  }

  /** Mean-style pin over pre-scaled integer rows: round6(num/10^s / den). */
  def ratioRound6Int(num: Column, numScale: Int, den: Column): Column =
    ratioRoundInt(num, numScale, den, 0, 6)

  /** Integer-result rounded division round(num/den) (ties away from zero)
    * as LONG — for pins that stay integers end to end (mean_e6 columns):
    * no double ever enters the hashed output. Inputs are exact integers
    * (long or decimal(38,0) columns). */
  def roundDiv(num: Column, den: Column): Column = {
    val x = abs(num.cast("decimal(38,0)"))
    val y = abs(den.cast("decimal(38,0)"))
    val x2 = (x * lit(2) + y).cast("decimal(38,0)")
    val y2 = (y * lit(2)).cast("decimal(38,0)")
    val m = ((x2 - pmod(x2, y2)) / y2).cast("decimal(38,0)")
    val signed = when((num < 0) =!= (den < 0), -m).otherwise(m)
    when(num.isNull || den.isNull || den === 0, lit(null).cast("long"))
      .otherwise(signed.cast("long"))
  }

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
  //
  // NO DECIMAL ARITHMETIC: every emitter below stays in BIGINT/HUGEINT (+
  // pure IEEE double for the per-row floor prescale and the one final
  // divide). DuckDB's decimal product/division result-typing is a
  // per-release rule (overflow past 38 digits saturates on some versions,
  // promotes to lossy DOUBLE on others) — integer and IEEE double ops are
  // the only version-invariant arithmetic.

  private def pow10Sql(e: Int): String =
    if (e == 0) "CAST(1 AS HUGEINT)"
    else s"CAST('1${"0" * e}' AS HUGEINT)"

  /** DuckDB twin of [[eScaled]]: `floor(x·10^digits + 0.5)` as BIGINT.
    * (DuckDB's floor returns DOUBLE, hence the explicit cast; the integer
    * fits 2^53 by the caller's precondition so the cast is exact.) */
  def eScaledSql(x: String, digits: Int): String =
    s"CAST(floor(CAST(($x) AS DOUBLE) * 1e$digits + 0.5) AS BIGINT)"

  def e6Sql(x: String): String = eScaledSql(x, 6)

  private def hug(x: String): String = s"CAST(($x) AS HUGEINT)"

  /** DuckDB twin of [[ratioRoundInt]] — `num`/`den` are integer-typed SQL
    * expressions (BIGINT/HUGEINT, e.g. sums of [[eScaledSql]] rows) with
    * logical scales. Pure HUGEINT arithmetic + one IEEE divide. */
  def ratioRoundIntSql(num: String, numScale: Int, den: String,
      denScale: Int, digits: Int): String = {
    val a = s"(${hug(s"abs($num)")} * ${pow10Sql(denScale + digits)})"
    val b = s"(${hug(s"abs($den)")} * ${pow10Sql(numScale)})"
    s"""(CASE WHEN ($num) IS NULL OR ($den) IS NULL OR ($den) = 0 THEN NULL
       | ELSE (CASE WHEN (($num) < 0) != (($den) < 0) THEN -1.0 ELSE 1.0 END) *
       |  CAST((2 * $a + $b) // (2 * $b) AS DOUBLE) / ${math.pow(10, digits)}
       | END)""".stripMargin.linesIterator.mkString(" ")
  }

  def ratioRound6IntSql(num: String, numScale: Int, den: String): String =
    ratioRoundIntSql(num, numScale, den, 0, 6)

  /** DuckDB twin of [[roundDiv]] — integer rounded division, BIGINT out. */
  def roundDivSql(num: String, den: String): String = {
    val m = s"((2 * ${hug(s"abs($num)")} + ${hug(s"abs($den)")}) " +
      s"// (2 * ${hug(s"abs($den)")}))"
    s"""(CASE WHEN ($num) IS NULL OR ($den) IS NULL OR ($den) = 0 THEN NULL
       | ELSE CAST((CASE WHEN (($num) < 0) != (($den) < 0) THEN -$m ELSE $m END) AS BIGINT)
       | END)""".stripMargin.linesIterator.mkString(" ")
  }
}
