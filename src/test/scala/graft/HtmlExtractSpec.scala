package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.CleanFunctions
import graft.functions.expr.HtmlExtract

/** The HTML→text state machine: tag/script/style/comment/CDATA handling,
  * entity decode, whitespace collapse, quote-aware tag scanning, and the
  * text-density main-content selection — plus the codegen path through a
  * DataFrame projection. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def ex(s: String): String =
    HtmlExtract.extract(UTF8String.fromString(s)).toString
  private def main(s: String): String =
    HtmlExtract.mainContent(UTF8String.fromString(s)).toString

  test("tags strip to soft separators; whitespace collapses; ends trim") {
    assert(ex("<p>hello</p><p>world</p>") == "hello world")
    assert(ex("  <div>\n  a\t\tb  </div>  ") == "a b")
    assert(ex("<b>a</b>b") == "a b", "every tag boundary separates")
  }

  test("script and style subtrees vanish whole, even with tags-in-code and case-mixed close") {
    assert(ex("""<script>var x = "<div>" + (a > b);</script>text""") == "text")
    assert(ex("<style>p { color: red; }</style>body text") == "body text")
    assert(ex("<SCRIPT>x</ScRiPt>after") == "after")
    assert(ex("<script>never closed") == "", "unclosed script eats to EOF")
  }

  test("a quoted attribute containing '>' does not truncate the tag") {
    assert(ex("""<div data-note="a > b">inner</div>""") == "inner")
    assert(ex("""<div data-note='x > y'>inner</div>""") == "inner")
  }

  test("comments vanish; CDATA surfaces literally") {
    assert(ex("a<!-- hidden <b>still hidden</b> -->b") == "a b")
    assert(ex("a<!-- never closed") == "a")
    assert(ex("<div><![CDATA[raw <b>not-a-tag</b>]]></div>") ==
      "raw <b>not-a-tag</b>")
  }

  test("entities: named, decimal, hex; unknown and bare '&' stay literal; nbsp is a plain space") {
    assert(ex("&amp; &lt;tag&gt; &quot;q&quot; &apos;a&apos;") ==
      """& <tag> "q" 'a'""")
    assert(ex("a&#8212;b") == "a—b")
    assert(ex("a&#x41;b") == "aAb")
    assert(ex("a&bogus;b") == "a&bogus;b")
    assert(ex("AT&T rocks & rolls") == "AT&T rocks & rolls")
    assert(ex("a&nbsp;&nbsp;b") == "a b", "nbsp collapses like ASCII space")
  }

  test("stray '<' that opens no tag stays literal") {
    assert(ex("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
  }

  test("main content: link-density scoring keeps the article, drops nav and footer") {
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About us</a> " +
      "<a href=\"/m\">More links here</a></nav>" +
      "<div><p>This is the actual article body with enough prose to win.</p></div>" +
      "<footer>Copyright notice <a href=\"/c\">Contact</a></footer>" +
      "</body></html>"
    assert(main(html) ==
      "This is the actual article body with enough prose to win.")
  }

  test("main content: '</body' inside a script string cannot truncate the scope") {
    // review finding: a raw substring search for the body close tag was
    // fooled by document.write-style literals — the scope finder now runs
    // the same tokenizer as the walks
    val html = "<body><script>document.write(\"</body>\");</script>" +
      "<div>the article body that must survive the fake close tag</div></body>"
    assert(main(html) == "the article body that must survive the fake close tag")
    val headFake = "<html><head><script>var s = '<body>';</script></head>" +
      "<body><div>real content here wins</div></body></html>"
    assert(main(headFake) == "real content here wins")
  }

  test("surrogate numeric entities stay literal (unpaired UTF-16 would break byte determinism)") {
    assert(ex("a&#xD800;b") == "a&#xD800;b")
    assert(ex("a&#55296;b") == "a&#55296;b")
    assert(ex("a&#x1F600;b") == "a😀b", "supplementary planes still decode")
  }

  test("main content: bare text runs at top level are candidate blocks; no-body documents fall back") {
    assert(main("<body><nav><a>x</a><a>y</a></nav>loose prose standing alone here</body>")
      == "loose prose standing alone here")
    assert(main("plain text, no markup at all") == "plain text, no markup at all")
    // an unclosed top-level block still competes
    assert(main("<body><div>unclosed article body prose</body>") ==
      "unclosed article body prose")
  }

  private def links(html: String, base: String): Seq[String] =
    graft.functions.expr.HtmlLinks.outlinks(
      UTF8String.fromString(html), UTF8String.fromString(base))
      .array.map(_.toString).toSeq

  test("outlinks: quoting styles, case-insensitive attr names, entity decode, document order") {
    val html = """<a href="/x">1</a><a HREF='/y'>2</a><a href=/z>3</a>""" +
      """<a href="/q?a=1&amp;b=2">4</a>"""
    assert(links(html, "http://ex.org/") == Seq(
      "http://ex.org/x", "http://ex.org/y", "http://ex.org/z",
      "http://ex.org/q?a=1&b=2"))
  }

  test("outlinks: canonicalization — scheme/host case, default ports, fragments, dot segments, empty path") {
    assert(links("""<a href="HTTP://EX.ORG:80/p#f">x</a>""", "http://b.org/") ==
      Seq("http://ex.org/p"))
    assert(links("""<a href="https://a.org:443/s">x</a>""", "http://b.org/") ==
      Seq("https://a.org/s"))
    assert(links("""<a href="http://a.org:8080/s">x</a>""", "http://b.org/") ==
      Seq("http://a.org:8080/s"), "non-default ports survive")
    assert(links("""<a href="../doc/3">x</a>""", "http://EX.org/dir/page.html") ==
      Seq("http://ex.org/doc/3"), "relative resolution + base-host lowering")
    assert(links("""<a href="http://a.org">x</a>""", "http://b.org/") ==
      Seq("http://a.org/"), "empty path canonicalizes to /")
    assert(links("""<a href="//c.org/p">x</a>""", "https://b.org/") ==
      Seq("https://c.org/p"), "protocol-relative inherits the base scheme")
  }

  test("outlinks: non-http(s) schemes, valueless/absent href, script content, duplicates") {
    val html = """<a href="mailto:x@y.z">m</a><a href="javascript:void(0)">j</a>""" +
      """<a name="anchor">no href</a><a href>empty</a>""" +
      """<script>var s = '<a href="/fake">not a link</a>';</script>""" +
      """<a href="/real">r</a><a href="/real">dup</a>"""
    assert(links(html, "http://ex.org/") == Seq("http://ex.org/real"))
  }

  test("DataFrame projection exercises the codegen path; null in, null out") {
    val df = Seq(
      (1L, Some("<p>a&amp;b</p>")),
      (2L, None: Option[String]))
      .toDF("id", "html")
      .select($"id", CleanFunctions.htmlExtract($"html").as("t"),
        CleanFunctions.htmlMainContent($"html").as("m"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "a&b" && rows(0).getString(2) == "a&b")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    // the projection stays inside whole-stage codegen (no UDF, no
    // fallback) — over a file scan, where the stage actually exists (a
    // local relation constant-folds to LocalTableScan)
    val scan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(CleanFunctions.htmlExtract(concat(lit("<p>"), $"text", lit("</p>")))
        .as("t"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen stage marker in the compact rendering
    assert(plan.contains("*(1) Project") &&
      plan.contains("graft_html_extract_text"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"), plan)
  }
}
