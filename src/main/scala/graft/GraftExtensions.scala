package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import graft.functions.expr.VectorDistance

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths, same functions:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions route), or
  *  - [[Graft.register]] on an existing session.
  *
  * Registered functions:
  *  - `vector_distance(a, b, 'cosine'|'cossim'|'l2'|'negdot')` — the fused
  *    single-pass distance expression (codegen'd; see
  *    [[graft.functions.expr.VectorDistance]]).
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
}

/** Session-level helpers. */
object Graft {
  /** Register the engine's SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = GraftExtensions.vectorDistanceFn
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
