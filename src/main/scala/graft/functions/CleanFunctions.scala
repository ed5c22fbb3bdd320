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

  /** Full-page HTML→text ([[graft.functions.expr.HtmlExtractText]] — the
    * crawl pipeline's first stage; state-machine strip, entity decode,
    * whitespace collapse). */
  def htmlExtract(html: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.HtmlExtractText(
        org.apache.spark.sql.GraftExpressionBridge.expression(html)))

  /** Main-content HTML→text ([[graft.functions.expr.HtmlMainContent]] —
    * text-density block selection; nav/footer chrome scores itself out). */
  def htmlMainContent(html: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.HtmlMainContent(
        org.apache.spark.sql.GraftExpressionBridge.expression(html)))

  /** Distinct normalized `<a href>` outlinks resolved against a base URL
    * ([[graft.functions.expr.HtmlLinks]] — the crawl-graph/frontier
    * construction stage next to [[htmlExtract]]'s text stage). */
  def htmlOutlinks(html: Column, base: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.HtmlOutlinks(
        org.apache.spark.sql.GraftExpressionBridge.expression(html),
        org.apache.spark.sql.GraftExpressionBridge.expression(base)))

  /** Detected charset label of a binary payload
    * ([[graft.functions.expr.CharsetSniff]] — BOM → meta declaration →
    * UTF-8 validity → windows-1252 fallback). */
  def sniffCharset(bytes: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.SniffCharset(
        org.apache.spark.sql.GraftExpressionBridge.expression(bytes)))

  /** Decode a binary payload with a charset label (malformed → U+FFFD,
    * leading BOM stripped). */
  def decodeCharset(bytes: Column, charset: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.DecodeCharset(
        org.apache.spark.sql.GraftExpressionBridge.expression(bytes),
        org.apache.spark.sql.GraftExpressionBridge.expression(charset)))

  /** Robots-style URL allow/deny over canonical frontier URLs — the
    * crawler-side twin of the domain cap: `rules` are (LIKE pattern,
    * allow?) pairs, the MOST SPECIFIC matching rule (longest pattern,
    * robots.txt's longest-match semantics) decides, ties and no-match
    * default to ALLOW (the robots default). Pure composition of codegen'd
    * LIKE/greatest — no UDF, and the DuckDB oracle replays the identical
    * CASE/greatest shape ([[urlFilterSql]]). */
  def urlAllowed(url: Column, rules: Seq[(String, Boolean)]): Column = {
    def longest(ps: Seq[String]): Column =
      if (ps.isEmpty) lit(-1)
      else greatest(ps.map(p =>
        when(url.like(p), lit(p.length)).otherwise(lit(-1))): _*)
    // greatest() needs >= 2 args; pad with the no-match sentinel
    def g(ps: Seq[String]) = longest(if (ps.size == 1) ps :+ "" else ps)
    g(rules.filter(_._2).map(_._1)) >= g(rules.filterNot(_._2).map(_._1))
  }

  /** The oracle mirror of [[urlAllowed]] as a SQL boolean over `urlExpr`. */
  def urlFilterSql(urlExpr: String, rules: Seq[(String, Boolean)]): String = {
    def side(ps: Seq[String]): String =
      if (ps.isEmpty) "-1"
      else ps.map(p =>
        s"CASE WHEN $urlExpr LIKE '$p' THEN ${p.length} ELSE -1 END")
        .mkString("greatest(", ", ", ", -1)")
    s"(${side(rules.filter(_._2).map(_._1))} >= " +
      s"${side(rules.filterNot(_._2).map(_._1))})"
  }

  /** Decoded HTTP message body BYTES of a binary payload
    * ([[graft.functions.expr.HttpBodyBytes]] — header strip, RFC 9112
    * de-chunking, Content-Encoding gunzip; the envelope stage between a
    * binary WARC read and [[sniffCharset]]). */
  def httpBodyBytes(payload: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.HttpBodyBytes(
        org.apache.spark.sql.GraftExpressionBridge.expression(payload)))

  /** Deterministic single-member gzip of a binary column
    * ([[graft.functions.expr.GzipBytes]]). */
  def gzipBytes(bytes: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.expr.GzipBytes(
        org.apache.spark.sql.GraftExpressionBridge.expression(bytes)))

  def repetitionRatio(total: Column, distinct: Column): Column =
    when(total === 0, lit(0.0d))
      .otherwise(ExactRound.ratioRound6PosLong(total - distinct, total))

  /** Gopher document-quality counters + rules (Rae et al. 2021 §A1.1) —
    * the ONE source for the standalone `clean_gopher_rules` query and the
    * crawl-ingest pipeline's gate (they duplicated the thresholds before;
    * a tweak to one silently desynchronized the other). Every rule is a
    * pure INTEGER comparison. */
  object Gopher {
    val MinToks = 50L
    val MaxToks = 100000L
    /** (n_tokens, n_token_chars, n_alpha, n_stop) over a token array. */
    def counts(toks: Column): (Column, Column, Column, Column) = (
      size(toks).cast("long"),
      coalesce(aggregate(toks, lit(0L),
        (a, t) => a + length(t).cast("long")), lit(0L)),
      size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("long"),
      TextFunctions.stopwordHits(toks, TextFunctions.langWords.head._2)
        .cast("long"))
    def rLen(nt: Column): Column = nt >= MinToks && nt <= MaxToks
    def rWordLen(nt: Column, chars: Column): Column =
      chars >= nt * 3 && chars <= nt * 10 // mean word length in [3, 10]
    def rAlpha(nt: Column, alpha: Column): Column =
      alpha * 5 >= nt * 4 // ≥ 80% alphabetic tokens
    def rStop(stop: Column): Column = stop >= 2
    def keep(nt: Column, chars: Column, alpha: Column, stop: Column): Column =
      rLen(nt) && rWordLen(nt, chars) && rAlpha(nt, alpha) && rStop(stop)
  }
}
