package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import graft.functions.TextFunctions
import graft.functions.expr.VectorDistance

/** SQL surface for the engine's functions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    registers `vector_distance` (the custom Catalyst expression);
  *  - [[Graft.register]] on an existing session registers `vector_distance`
  *    AND the SQL-defined text functions below (temporary SQL UDFs are
  *    session state, so they can only be created against a live session).
  *
  * Registered functions:
  *  - `vector_distance(a, b, 'cosine'|'cossim'|'l2'|'negdot')` — fused
  *    single-pass distance ([[graft.functions.expr.VectorDistance]],
  *    codegen'd).
  *  - `graft_token_hash(s)` — the portable md5-derived 32-bit hash every
  *    dedup/sampling operator keys on.
  *  - `graft_fingerprint(t)` — order-sensitive rolling document fingerprint.
  *  - `graft_simhash(t)` — 32-bit SimHash.
  *  - `graft_quality(t)` — composite quality score in [0,1].
  *  - `graft_hash_bucket(key, n)` — deterministic sampling bucket in [0,n).
  *
  * The text functions are SQL scalar functions (`CREATE FUNCTION … RETURN
  * expr`): their bodies INLINE into the calling plan, so they codegen and
  * optimize exactly like the Column forms they mirror —
  * `GraftExtensionsSpec` asserts bit-equality against
  * [[TextFunctions]]/[[graft.operators.Dedup.simhashOf]] so the two
  * surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.vectorDistanceFn)
}

object GraftExtensions {
  private def kindOf(e: Expression): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"vector_distance: third argument must be a string literal kind, got $other")
  }

  val vectorDistanceFn: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_distance"),
    new ExpressionInfo(classOf[VectorDistance].getName, "vector_distance"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        s"vector_distance(a, b, kind) takes 3 arguments, got ${args.length}")
      VectorDistance(args(0), args(1), kindOf(args(2)))
    })

  // ---- SQL text-function bodies (mirrors of the Column forms) -------------

  private def th(x: String): String =
    s"CAST(conv(substring(md5(CAST($x AS BINARY)), 1, 8), 16, 10) AS BIGINT)"

  private val Toks = "filter(split(lower(t), '\\\\s+'), x -> length(x) > 0)"

  private val enIn = TextFunctions.langWords.head._2
    .map(w => s"'$w'").mkString("(", ", ", ")")

  /** The session-scoped SQL function definitions [[Graft.register]] runs. */
  val sqlFunctions: Seq[String] = Seq(
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_token_hash(x STRING)
       |RETURNS BIGINT RETURN ${th("x")}""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_hash_bucket(key STRING, n INT)
       |RETURNS BIGINT RETURN pmod(${th("key")}, CAST(n AS BIGINT))""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_fingerprint(t STRING)
       |RETURNS BIGINT RETURN aggregate(
       |  transform($Toks, x -> ${th("x")}),
       |  0L, (acc, h) -> (acc * 31 + h) % 1000000007)""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_simhash(t STRING)
       |RETURNS BIGINT RETURN aggregate(
       |  zip_with(
       |    aggregate(
       |      transform($Toks, x -> ${th("x")}),
       |      transform(sequence(0, 31), i -> 0L),
       |      (acc, h) -> zip_with(acc,
       |        transform(sequence(0, 31),
       |          i -> CASE WHEN (shiftright(h, i) & 1L) = 1 THEN 1L ELSE -1L END),
       |        (a, b) -> a + b)),
       |    sequence(0, 31),
       |    (v, i) -> CASE WHEN v > 0 THEN shiftleft(1L, i) ELSE 0L END),
       |  0L, (a, b) -> a + b)""".stripMargin,
    s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_quality(t STRING)
       |RETURNS DOUBLE RETURN
       |  0.4D * least(1.0D, size($Toks) / 100.0D) +
       |  0.3D * (1.0D - CASE WHEN length(t) = 0 THEN 0.0D
       |    ELSE CAST(length(regexp_replace(lower(t), '[a-z0-9\\\\s]', '')) AS DOUBLE) / length(t) END) +
       |  0.3D * least(1.0D, 4.0D * CASE WHEN size($Toks) = 0 THEN 0.0D
       |    ELSE CAST(size(filter($Toks, x -> x IN $enIn)) AS DOUBLE) / size($Toks) END)""".stripMargin)
}

/** Session-level helpers. */
object Graft {
  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = GraftExtensions.vectorDistanceFn
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    GraftExtensions.sqlFunctions.foreach(spark.sql(_))
  }
}
