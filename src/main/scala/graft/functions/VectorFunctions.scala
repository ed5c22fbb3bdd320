package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Dense-vector scalar functions (SURVEY.md §2.8 F1-F5, F9).
  *
  * Rebuilds the reference's `cos_sim` (`skills_for_jobs.py:175-176`), pgvector
  * cosine distance `<=>` (`skills_for_jobs.py:150`), and the Milvus L2 metric
  * (`load_skill_vectors_milvus.py:56`) as codegen'd Catalyst higher-order
  * functions — no UDF serialization, stays inside whole-stage codegen.
  *
  * All arithmetic is in `DoubleType` and folds the arrays left-to-right in
  * element order, matching DuckDB's `list_cosine_similarity`/`list_distance`
  * evaluation order so the oracle compare is bit-stable.
  */
object VectorFunctions {

  /** F9 — float32 → float64 widen (`tolist()` at `load_skill_vectors_pinecone.py:34`). */
  def asDouble(v: Column): Column = v.cast(ArrayType(DoubleType))

  /** Element-wise dot product: fold of zip_with, sequential in array order. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2NormSq(a: Column): Column = dotProduct(a, a)

  def l2Norm(a: Column): Column = sqrt(l2NormSq(a))

  /** F1 — cosine similarity, `dot(a,b)/(norm(a)*norm(b))`
    * (`skills_for_jobs.py:175-176`). Zero-norm input yields NaN, as in the
    * reference (numpy emits a divide warning and returns nan) — guarded
    * explicitly because ANSI mode (Spark 4 default) throws on divide-by-zero
    * instead of producing NaN. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0d, lit(Double.NaN)).otherwise(dotProduct(a, b) / denom)
  }

  /** F2 — cosine distance (pgvector `<=>`, `skills_for_jobs.py:150,363`). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0d) - cosineSimilarity(a, b)

  /** F3 — Euclidean distance (Milvus metric L2, `load_skill_vectors_milvus.py:56`). */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v))

  /** Negative inner product ranking metric (higher dot = nearer). */
  def negDotProduct(a: Column, b: Column): Column = -dotProduct(a, b)

  /** F4 — vector → `'[f,f,…]'` text literal (`load_skill_vectors_pg.py:38`).
    * Null elements serialize as the JSON literal `null` (array_join would
    * otherwise silently drop them, shrinking the vector on round-trip);
    * [[textToVec]]/[[textToVecFloat]] parse it back to a null element. */
  def vecToText(v: Column): Column =
    concat(lit("["), array_join(v, ",", "null"), lit("]"))

  /** F5 — text literal → vector (`ast.literal_eval` at `skills_for_jobs.py:385`).
    * Parse to the element type that produced the text: a float's shortest
    * string repr re-parses exactly as float, but NOT as double. */
  def textToVec(s: Column): Column = from_json(s, ArrayType(DoubleType))

  def textToVecFloat(s: Column): Column =
    from_json(s, ArrayType(org.apache.spark.sql.types.FloatType))

  /** L2-normalize a vector to unit length (zero vector maps to NaN elements).
    * The norm is evaluated once via array_repeat — embedding `l2Norm(v)`
    * inside the transform lambda would re-run the O(d) dot-product aggregate
    * per element, i.e. O(d²) per row. */
  def l2Normalize(v: Column): Column =
    zip_with(v, array_repeat(l2Norm(v), size(v)), (x, n) => x / n)

  /** Wrap the fused codegen distance expression (bit-identical to the HOF
    * formulations above — see [[graft.functions.expr.VectorDistance]]). */
  def fusedDistance(kind: String)(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.VectorDistance(
        org.apache.spark.sql.GraftExpressionBridge.expression(a),
        org.apache.spark.sql.GraftExpressionBridge.expression(b),
        kind))

  /** Distance metrics the engine supports, selected per SURVEY §2.3 X3.
    * `dist` is the fused single-pass codegen expression (the k-NN hot path);
    * the HOF equivalents above remain as the readable reference forms. */
  sealed trait Metric {
    /** Distance column (smaller = nearer) for ranking. */
    def dist(a: Column, b: Column): Column
  }
  case object Cosine extends Metric {
    def dist(a: Column, b: Column): Column = fusedDistance("cosine")(a, b)
  }
  case object L2 extends Metric {
    def dist(a: Column, b: Column): Column = fusedDistance("l2")(a, b)
  }
  case object InnerProduct extends Metric {
    def dist(a: Column, b: Column): Column = fusedDistance("negdot")(a, b)
  }
  object Metric {
    def apply(name: String): Metric = name.toLowerCase match {
      case "cosine" => Cosine
      case "l2" | "euclidean" => L2
      case "ip" | "dot" | "innerproduct" => InnerProduct
      case other => throw new IllegalArgumentException(s"unknown metric: $other")
    }
  }
}
