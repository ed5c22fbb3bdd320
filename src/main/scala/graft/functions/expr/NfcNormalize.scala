package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * step of corpus text cleaning (UAX#15: compose `e` + U+0301 into `é`, so
  * byte-different but canonically-equal spellings hash, shingle, and dedup
  * identically). Spark ships no normalization function; a Scala UDF would
  * break whole-stage codegen around it, while this expression's generated
  * code is ONE static call per row (the same class of codegen as Spark's
  * own string expressions — the stage stays fused).
  *
  * Already-normalized strings (the overwhelming common case — ASCII is NFC
  * by definition) return the INPUT UTF8String untouched: `isNormalized` is
  * a cheap scan and skips the String round-trip entirely.
  *
  * Oracle twin: DuckDB's `nfc_normalize` (utf8proc) — both implement
  * UAX#15 NFC, so results are byte-identical on any valid UTF-8. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
