package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Byte-level HTTP/1.1 message-body extraction for raw crawl payloads —
  * the envelope-strip stage between [[graft.io.WarcGz]]'s record read and
  * [[CharsetSniff]] (a WARC `response` record's payload is the full HTTP
  * message; the trainable bytes are the body AFTER transfer/content
  * decoding). The text-path twin ([[graft.io.Warc.httpBody]]) only splits
  * at the blank line — enough for the engine's own text exports, but a
  * real crawl's responses are chunked and gzip-compressed, and both
  * decodes must run on BYTES, before any charset decision:
  *
  *  1. split status line + headers from the body at the first CRLF CRLF
  *     (headers read as Latin-1, the HTTP/1.1 bootstrap rule);
  *  2. `Transfer-Encoding: chunked` → de-chunk (RFC 9112 §7.1: hex sizes,
  *     chunk extensions ignored, trailer section dropped) — transfer
  *     framing first;
  *  3. `Content-Encoding: gzip` (or `x-gzip`) → gunzip via the same
  *     clean-room RFC 1952 member codec the container uses
  *     ([[graft.io.WarcGz.memberIterator]], CRC + ISIZE verified) —
  *     representation second.
  *
  * Torn chunked framing raises (a silently half-dechunked body would
  * poison everything downstream); an unsupported Content-Encoding raises
  * naming the header. One static call from generated code — no UDF, the
  * stage stays fused with the sniff/decode/extract projection.
  */
object HttpMessage {

  /** Index of the first CRLF CRLF in `b` at or after `from`, or -1. */
  private def blankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private val ChunkedRe = java.util.regex.Pattern.compile(
    "(?im)^Transfer-Encoding:\\s*chunked\\s*$")
  private val CEncRe = java.util.regex.Pattern.compile(
    "(?im)^Content-Encoding:\\s*([A-Za-z0-9_-]+)\\s*$")

  /** RFC 9112 §7.1 de-chunking: hex size [;extensions] CRLF data CRLF,
    * repeated; a 0-size chunk ends the body (trailers dropped). */
  private[graft] def dechunk(b: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length - from)
    var i = from
    var done = false
    while (!done) {
      // size line
      var j = i
      while (j + 1 < b.length && !(b(j) == '\r' && b(j + 1) == '\n')) j += 1
      require(j + 1 < b.length, "torn chunked body: EOF in a chunk-size line")
      var line = new String(b, i, j - i, "ISO-8859-1")
      val semi = line.indexOf(';') // chunk extensions are ignored
      if (semi >= 0) line = line.substring(0, semi)
      val size = java.lang.Integer.parseInt(line.trim, 16)
      i = j + 2
      if (size == 0) done = true // trailer section + final CRLF dropped
      else {
        require(i + size + 2 <= b.length,
          s"torn chunked body: chunk of $size bytes overruns the payload")
        out.write(b, i, size)
        require(b(i + size) == '\r' && b(i + size + 1) == '\n',
          "torn chunked body: missing CRLF after a chunk")
        i += size + 2
      }
    }
    out.toByteArray
  }

  /** Concatenate every gzip member of `b` (RFC 1952 allows several;
    * real servers emit one). */
  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val it = graft.io.WarcGz.memberIterator(
      new java.io.ByteArrayInputStream(b), "<http body>")
    val out = new java.io.ByteArrayOutputStream(b.length * 2 + 64)
    while (it.hasNext) out.write(it.next())
    out.toByteArray
  }

  /** The decoded message body of HTTP message `payload` (see object doc).
    * Called from generated code. */
  def body(payload: Array[Byte]): Array[Byte] = {
    val split = blankLine(payload, 0)
    if (split < 0) return Array.emptyByteArray // headers only, no body
    val hdr = new String(payload, 0, split, "ISO-8859-1")
    var b = java.util.Arrays.copyOfRange(payload, split + 4, payload.length)
    if (ChunkedRe.matcher(hdr).find()) b = dechunk(payload, split + 4)
    val ce = CEncRe.matcher(hdr)
    if (ce.find()) {
      val enc = ce.group(1).toLowerCase(java.util.Locale.ROOT)
      enc match {
        case "identity" | "none" => ()
        case "gzip" | "x-gzip" => b = gunzip(b)
        case other => throw new IllegalArgumentException(
          s"unsupported Content-Encoding: $other — expected identity/gzip")
      }
    }
    b
  }

  /** Deterministic single-member gzip of `bytes` — the write-side twin of
    * the decode above ([[graft.io.WarcGz.gzipMember]]): an engine
    * exporting compressed columns or synthesizing Content-Encoding: gzip
    * fixtures needs the compressor in-plan. Called from generated code. */
  def gzip(bytes: Array[Byte]): Array[Byte] = graft.io.WarcGz.gzipMember(bytes)
}

/** Decoded HTTP message body of a binary payload (see [[HttpMessage]]). */
case class HttpBodyBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_http_body"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpMessage.body(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.HttpMessage.body($c)")

  override protected def withNewChildInternal(newChild: Expression): HttpBodyBytes =
    copy(child = newChild)
}

/** Deterministic gzip of a binary column (see [[HttpMessage.gzip]]). */
case class GzipBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_gzip"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpMessage.gzip(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.HttpMessage.gzip($c)")

  override protected def withNewChildInternal(newChild: Expression): GzipBytes =
    copy(child = newChild)
}
