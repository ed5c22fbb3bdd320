package graft.functions.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over an integral key — the
  * expression half of [[graft.operators.BloomPrune]].
  *
  * Spark's own runtime row-level filtering (InjectRuntimeFilter) plants the
  * same probe automatically, but only under shuffle-join heuristics it
  * controls; this expression makes the pattern available to the engine's own
  * operators (pre-filtering a fact scan before a shuffle join, pruning a
  * delta against a corpus key set) wherever WE know the semi-join is worth
  * it. The serialized filter travels with the plan once; each executor
  * deserializes it lazily and the probe itself is branch-free primitive code
  * inside whole-stage codegen — no UDF, no boxing.
  *
  * A bloom probe can return false positives (callers must re-verify with an
  * exact join — same precision discipline as the dedup candidate
  * generators), never false negatives: rows it drops are guaranteed
  * non-members, so a verify-after-prune pipeline loses nothing.
  *
  * `filterBytes` is an ArraySeq, not a raw Array: case-class equality over
  * an Array is reference-based, which would break Catalyst canonicalization
  * (two probes of the SAME sketch reused across scans would never compare
  * equal, defeating subexpression/exchange reuse).
  */
case class BloomMightContain(child: Expression,
    filterBytes: scala.collection.immutable.ArraySeq[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.simpleString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.unsafeArray
      .asInstanceOf[Array[Byte]]))

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainLong((long) $v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
