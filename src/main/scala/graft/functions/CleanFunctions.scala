package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-cleaning scalar functions for the training-data pipeline: PII
  * detection/redaction and intra-document repetition scoring (the C4/Gopher
  * family of corpus filters). Everything is a codegen'd column expression,
  * and every regex is written RE2-safe (no lookarounds, no backrefs,
  * alternation only inside character classes) with explicit character
  * classes, so Java regex (Spark) and RE2 (the DuckDB oracle) match the
  * same spans.
  */
object CleanFunctions {

  /** PII patterns. Leftmost-greedy without alternation ⇒ identical matches
    * under NFA (Java) and leftmost-longest (RE2) semantics. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")
  def urlCount(text: Column): Column =
    regexp_count(text, lit(UrlPattern)).cast("long")
  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("long")

  /** Replace every email, then URL, then phone with a typed placeholder.
    * Email runs before URL so `user@host` inside a userinfo URL is already
    * gone when the URL pattern sweeps; phones last (digit runs never match
    * the other two). */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noUrl = regexp_replace(noEmail, UrlPattern, "<URL>")
    regexp_replace(noUrl, PhonePattern, "<PHONE>")
  }

  /** Gopher-style duplicate-gram fraction from an n-gram hash array built by
    * [[graft.operators.Dedup.shingleHashes]]-compatible folds: callers pass
    * total grams (with repeats) and distinct grams; rows with no grams score
    * 0 (ANSI-safe). */
  /** Canonical text normalization — NFC compose ([[graft.functions.expr
    * .NfcNormalize]], native codegen), control chars → space, whitespace
    * runs collapsed, ends trimmed. Run FIRST in a cleaning pipeline so
    * byte-different canonically-equal spellings hash/shingle/dedup
    * identically downstream. (The `\\s+` collapse runs AFTER the control
    * strip on both engines — Java's `\\s` includes U+000B where RE2's does
    * not, but the control strip has already removed it.) */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      org.apache.spark.sql.GraftExpressionBridge.column(
        graft.functions.expr.NfcNormalize(
          org.apache.spark.sql.GraftExpressionBridge.expression(text))),
      "[\\p{Cntrl}]", " "), "\\s+", " "))

  def repetitionRatio(total: Column, distinct: Column): Column =
    when(total === 0, lit(0.0d))
      .otherwise(ExactRound.ratioRound6PosLong(total - distinct, total))
}
