package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.Dedup
import graft.functions.{CleanFunctions, TextFunctions}
import CleanFunctions.{EmailPattern, PhonePattern, UrlPattern}
import DocSql.toksCte

/** Corpus-cleaning queries (BASELINE.json north star: the filters every
  * LLM training-data pipeline runs before training): PII detection and
  * redaction, Gopher-style intra-document repetition scoring, and benchmark
  * decontamination by n-gram collision. Each replays exactly in the DuckDB
  * oracle — the regexes are RE2-safe and the gram hashes are the same
  * rolling md5 folds the dedup family uses.
  */
object CleanQueries extends graft.QueryModule {

  private val RepN = 3        // repetition gram width
  private[queries] val ContamN = 8     // decontamination gram width (long spans only)
  private[queries] val BenchMaxId = 100L // stand-in held-out benchmark: doc_id ≤ 100
  private val SpanW = 8       // boilerplate span width (tokens per block)
  private val SpanMinDocs = 2L // blocks in ≥ this many docs are boilerplate
  private val GopherMinToks = CleanFunctions.Gopher.MinToks
  private val GopherMaxToks = CleanFunctions.Gopher.MaxToks
  private val MaxLinesPerDoc = 1L << 20 // line-dedup argmin key stride

  /** The deterministic multi-line scaffold the two C4 line queries share
    * (the corpus is single-line): lines engineered to exercise every rule,
    * one varying per doc_id. */
  private def c4Scaffold: org.apache.spark.sql.Column =
    concat(col("text"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit(".")).otherwise(lit("")),
      lit("\n- bullet item\nshort\nDocument "), col("doc_id").cast("string"),
      lit(" summary sentence goes here.\nbad brace { line here now.\nlorem ipsum dolor sit amet today."))

  /** DuckDB twin of [[c4Scaffold]], split into a `lines` list. (No line
    * here may START with `|` or `||` — interpolation into an outer
    * `.stripMargin` oracle would re-strip it.) */
  private val c4ScaffoldSql: String =
    """string_split(
      |    text || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END ||
      |      chr(10) || '- bullet item' || chr(10) || 'short' ||
      |      chr(10) || 'Document ' || CAST(doc_id AS VARCHAR) || ' summary sentence goes here.' ||
      |      chr(10) || 'bad brace { line here now.' ||
      |      chr(10) || 'lorem ipsum dolor sit amet today.', chr(10))""".stripMargin

  /** The corpus text carries no PII, so the query plants one deterministic
    * email/URL/phone per row (derived from doc_id) — the redaction output
    * then depends on BOTH the planted spans and the surrounding text, which
    * the md5 over the redacted string pins cross-engine. */
  private def withPii(idCol: String, textCol: String) =
    concat(col(textCol),
      lit(" contact user"), col(idCol).cast("string"),
      lit("@example.com via https://ex.org/p/"), col(idCol).cast("string"),
      lit(" or 555-123-4567"))

  /** The adversarial HTML fixture the two html queries share: each doc's
    * text (entity-escaped — the decode must invert it) wrapped in a
    * variant by doc_id % 4. v0: script/style subtrees whose CODE contains
    * `<`/`>`; v1: a comment plus planted named/numeric entities; v2:
    * nested tags plus a CDATA section (literal-text semantics); v3: a
    * quoted attribute containing `>`, unclosed block tags, void elements.
    * The EXPECTED extraction is a pure function of the source text, so the
    * oracle pins that the state machine inverts the synthesis exactly —
    * the clean_normalize discipline. */
  private def htmlFixture: org.apache.spark.sql.Column = {
    val esc = escapeHtml(col("text"))
    val v = pmod(col("doc_id"), lit(4))
    when(v === 0, concat(
      lit("<html><head><script>var x = \"<div>\" + 1; if (a > b) {}</script>" +
        "<style>p { color: red; }</style></head><body><p>"),
      esc, lit("</p></body></html>")))
    .when(v === 1, concat(
      lit("<html><body><!-- boilerplate --><div><p>"), esc,
      lit("</p><p>&amp; &lt;tag&gt; &#8212; &quot;q&quot;</p></div></body></html>")))
    .when(v === 2, concat(
      lit("<html><body><div><div><span>"), esc,
      lit("</span></div><![CDATA[raw <b>not-a-tag</b>]]></div></body></html>")))
    .otherwise(concat(
      lit("<html><body><div class=\"x\" data-note=\"a > b\"><p>"), esc,
      lit("<br><img src=\"x.png\">trailer</p></body></html>")))
  }

  /** Chrome-wrapped twin for main-content selection: link-only nav, the
    * doc text in a div, a link-heavy footer — the density scorer must keep
    * exactly the div. */
  private def htmlMainFixture: org.apache.spark.sql.Column = {
    val esc = escapeHtml(col("text"))
    concat(
      lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About us</a> " +
        "<a href=\"/m\">More links here</a></nav><div><p>"),
      esc,
      lit("</p></div><footer>Copyright notice <a href=\"/c\">Contact</a>" +
        "</footer></body></html>"))
  }

  /** Crawl-graph PageRank iterations (exact e9 fixed point, like the kNN
    * walk's PrIters). Shared with the raw-crawl pipeline card's
    * rank-weighted selection leg. */
  private[queries] val CrawlPrIters = 5

  /** Politeness schedule knobs: per-host URL cap (the crawl-budget rule —
    * sized so the cap BITES at every tested SF: ~71 docs/host at sf0.01,
    * ~714 at sf0.1) and the per-slot host delay. */
  private val CrawlCap = 40
  private val CrawlSlotMs = 250L

  /** The planted-link fixture the two crawl-graph queries share: three
    * anchors per doc (quote styles, case, entities, relative resolution,
    * default port, fragment — every canonicalization rule exercised), a
    * mailto:, a javascript:, and a duplicate; targets are
    * (doc_id·{3,7,11}) mod N, so the expected frontier is a pure function
    * of doc_id and the oracle replays it. Returns (html, base, row with
    * broadcast N). */
  /** HTML-escape a text column (&, <, > — & first). FOUR fixtures' oracles
    * depend on this exact escaping being the inverse of the extractor's
    * entity decode — one copy, like [[plantedAnchors]]. */
  private[queries] def escapeHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** The planted anchor block (shared verbatim with the raw-crawl
    * pipeline card — the oracle replays of BOTH depend on this exact
    * sequence): visible anchor texts are the single tokens
    * `a b c m dup j`. */
  private[queries] def plantedAnchors(l1: org.apache.spark.sql.Column,
      l2: org.apache.spark.sql.Column,
      l3: org.apache.spark.sql.Column): org.apache.spark.sql.Column = concat(
    lit("<a href=\"/doc/"), l1, lit("\">a</a>"),
    lit("<a HREF='HTTP://EX.ORG:80/doc/"), l2, lit("?q=a&amp;b#frag'>b</a>"),
    lit("<a href=../doc/"), l3, lit(" class=z>c</a>"),
    lit("<a href=\"mailto:x@y.z\">m</a>"),
    lit("<a href=\"/doc/"), l1, lit("\">dup</a>"),
    lit("<a href=\"javascript:void(0)\">j</a>"))

  /** Planted link targets (doc_id·{3,7,11} mod N) as string columns; `d`
    * carries the broadcast corpus count. */
  private[queries] def plantedTargets(s: SparkSession, dir: String):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, DataFrame) = {
    val docs = Tables.documents(s, dir)
    val d = docs.crossJoin(broadcast(docs.agg(count(lit(1)).as("__n"))))
    (pmod(col("doc_id") * 3, col("__n")).cast("string"),
      pmod(col("doc_id") * 7, col("__n")).cast("string"),
      pmod(col("doc_id") * 11, col("__n")).cast("string"), d)
  }

  /** The page base URL of the planted fixtures (mixed-case host — the
    * canonicalizer must lowercase it on base-resolved links). */
  private[queries] def plantedBase: org.apache.spark.sql.Column =
    concat(lit("http://EX.org/dir/page"), col("doc_id").cast("string"),
      lit(".html"))

  private def linksFixture(s: SparkSession, dir: String):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column, DataFrame) = {
    val (l1, l2, l3, d) = plantedTargets(s, dir)
    val html = concat(lit("<html><body><p>intro</p>"),
      plantedAnchors(l1, l2, l3), lit("</body></html>"))
    (html, plantedBase, d)
  }

  /** The frontier allow/deny rule set (robots.txt's longest-match
    * semantics — [[CleanFunctions.urlAllowed]]): base allow, a deny for
    * the `1…`-prefixed targets, and a longer allow that re-admits exactly
    * the `1?q=a&b` query form — every doc's links land on both sides of
    * the fence across scales. Shared verbatim with the oracle emitter. */
  private val UrlRules = Seq(
    ("http://ex.org/doc/%", true),
    ("http://ex.org/doc/1%", false),
    ("http://ex.org/doc/1?q=a&b", true))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sitemap/robots-style frontier filtering (r14 verdict "next round"
    // #8): pattern-based allow/deny over the CANONICAL outlink URLs, the
    // crawler-side twin of clean_domain_cap — longest matching rule
    // decides, ties/no-match allow. Pure codegen'd LIKE/greatest
    // composition over the planted-link fixture; the oracle replays the
    // frontier AND the rule arbitration, so a wrong specificity order or
    // a rule applied pre-canonicalization reddens rows.
    "clean_url_filter" -> ((s, dir) => {
      val (html, base, d) = linksFixture(s, dir)
      d.select(col("doc_id"),
          explode(CleanFunctions.htmlOutlinks(html, base)).as("__u"))
        .select(col("doc_id"), col("__u"),
          CleanFunctions.urlAllowed(col("__u"), UrlRules).as("__ok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_links"),
          sum(when(col("__ok"), 1L).otherwise(0L)).as("n_allowed"),
          md5(array_join(sort_array(collect_list(when(col("__ok"),
            col("__u")))), "|")).as("allowed_hash"))
    }),
    // robots.txt END TO END (operators/Robots): per-host robots documents
    // are PARSED (comments, unknown directives like Crawl-delay/Sitemap,
    // empty Disallow:, group assignment off consecutive User-agent
    // lines), the crawler's group is SELECTED (graftbot groups exist only
    // on even hosts — those hosts must ignore the `*` group entirely),
    // patterns LIKE-translate (`*` wildcard, trailing `$` anchor), and
    // the longest match decides per URL. The oracle replays the expected
    // OUTCOME as a pure function of doc_id — any parse slip, a group
    // leak, a wildcard mistranslation, or a specificity inversion
    // reddens rows.
    "clean_robots_filter" -> ((s, dir) => {
      val hS = (col("doc_id") % 7).cast("string")
      val host = concat(lit("h"), hS, lit(".ex.org"))
      val hosts = Tables.documents(s, dir)
        .select((col("doc_id") % 7).as("__h")).distinct()
        .select(concat(lit("h"), col("__h").cast("string"), lit(".ex.org"))
          .as("host"),
          concat(
            lit("# robots fixture\n"),
            when(col("__h") % 2 === 0, concat(
              lit("User-agent: GraftBot\nDisallow: /doc/*"),
              col("__h").cast("string"),
              lit("$\nAllow: /doc/1*"), col("__h").cast("string"),
              lit("$\n"))).otherwise(lit("")),
            lit("User-agent: *\nDisallow: /doc/2*\nDisallow:\n" +
              "Crawl-delay: 1\nSitemap: http://ex.org/sitemap.xml\n"))
            .as("robots_txt"))
      val frontier = Tables.documents(s, dir).select(col("doc_id"),
        host.as("host"),
        concat(lit("http://"), host, lit("/doc/"),
          col("doc_id").cast("string")).as("url"))
      graft.operators.Robots.filterFrontier(frontier, "host", "url",
          graft.operators.Robots.parseRules(hosts, "host", "robots_txt"),
          "graftbot")
        .select(col("doc_id"), col("host"), col("allowed"))
    }),
    // Outlink extraction + URL canonicalization — the frontier half of
    // the crawl stage (the text half is clean_html_extract): every <a
    // href> in any quoting style, attribute names case-insensitive,
    // entities decoded in the value, resolved RFC-3986 against the page's
    // base URL, scheme/host lowercased, default ports and fragments
    // stripped, non-http(s) schemes dropped, first-occurrence dedup. The
    // oracle replays the expected frontier as a pure function of doc_id
    // (the planted-target fixture is invertible), so any missed
    // canonicalization rule or quoting case reddens rows.
    "clean_html_links" -> ((s, dir) => {
      val (html, base, d) = linksFixture(s, dir)
      d.select(col("doc_id"),
          CleanFunctions.htmlOutlinks(html, base).as("__l"))
        .select(col("doc_id"), size(col("__l")).cast("long").as("n_links"),
          md5(array_join(col("__l"), "|")).as("links_hash"))
    }),
    // The crawl graph end to end: extracted+normalized outlinks become a
    // directed edge list (target ids parsed back off the URLs, distinct)
    // and exact-integer PageRank ranks every page — the authority prior a
    // selection pipeline mixes in when a REAL hyperlink graph exists
    // (rank_knn_pagerank's kNN graph is the fallback when it doesn't).
    // The oracle rebuilds the planted edges relationally and replays all
    // five power iterations in the same e9 fixed point.
    "rank_crawl_pagerank" -> ((s, dir) => {
      val (html, base, d) = linksFixture(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          explode(CleanFunctions.htmlOutlinks(html, base)).as("__u"))
        .select(col("src"),
          regexp_extract(col("__u"), "doc/([0-9]+)", 1).cast("long").as("dst"))
        .distinct()
      graft.operators.PageRank.pagerank(edges, CrawlPrIters)
        .select(col("id").as("doc_id"), col("pr_e9"))
    }),
    // Politeness-aware fetch scheduling (operators/Crawl.schedule) — the
    // control-plane step between the ranked frontier and the fetcher
    // fleet: within each host, URLs rank by (priority desc, url) into
    // consecutive slots; a per-host cap drops the tail (the crawl-budget
    // rule); fetch_after_ms stamps each URL's earliest offset under the
    // host delay. The schedule at scale is the PAIR (slot, host) — wave s
    // fetches every host's s-th URL concurrently — ONE keyed window on
    // the host, never a global sort (PlanSpec-pinned). Row-level
    // hash-gated: the oracle replays the same per-host window.
    "rank_crawl_schedule" -> ((s, dir) => {
      val host = concat(lit("h"), (col("doc_id") % 7).cast("string"),
        lit(".ex.org"))
      val frontier = Tables.documents(s, dir).select(col("doc_id"),
        host.as("host"),
        concat(lit("http://"), host, lit("/doc/"),
          col("doc_id").cast("string")).as("url"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
          .as("pri"))
      graft.operators.Crawl.schedule(frontier, "host", "url", "pri",
        CrawlCap, CrawlSlotMs)
        .select(col("doc_id"), col("host"), col("slot"),
          col("fetch_after_ms"))
    }),
    // HTML→text — the crawl pipeline's FIRST stage (raw HTML in, trainable
    // text out), which the engine lacked entirely (r13 verdict missing #1).
    // State-machine extraction (functions/expr/HtmlExtract.scala) over the
    // adversarial fixture; the oracle replays the EXPECTED text (the
    // fixture is invertible by construction), so a mis-skipped script, a
    // tag truncated at an attribute '>', an undecoded entity, or a
    // whitespace drift all redden rows. One narrow codegen'd projection —
    // no shuffle, no UDF — the 100 TB shape of the stage.
    "clean_html_extract" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), CleanFunctions.htmlExtract(htmlFixture).as("__t"))
        .select(col("doc_id"), length(col("__t")).cast("long").as("n_chars"),
          md5(col("__t")).as("text_hash"))
    }),
    // Main-content selection (the trafilatura/jusText role, batch form):
    // the body's top-level blocks score text-mass − 2·link-mass and the
    // winner's text survives — link-only nav and a link-heavy footer must
    // score themselves out on EVERY doc, leaving exactly the article div.
    "clean_html_main" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          CleanFunctions.htmlMainContent(htmlMainFixture).as("__t"))
        .select(col("doc_id"), length(col("__t")).cast("long").as("n_chars"),
          md5(col("__t")).as("text_hash"))
    }),
    // Canonical normalization over a deterministically-messied corpus (the
    // stand-in for crawl text: decomposed accents, control chars, ragged
    // whitespace): NFC compose via the native codegen expression, control
    // strip, whitespace collapse, trim. The oracle replays it through
    // DuckDB's nfc_normalize (utf8proc) — hash-matching the OUTPUT TEXT
    // pins that two independent UAX#15 implementations agree byte-for-byte
    // through the whole cleanup.
    "clean_normalize" -> ((s, dir) => {
      // "e" + U+0301 combining acute — DECOMPOSED on purpose, so the gate
      // exercises real composition, not an ASCII identity pass.
      val messy = concat(col("text"), lit("  x\t"), lit("é"), lit("  "))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          CleanFunctions.normalizeText(messy).as("norm_text"))
    }),
    "clean_pii_redact" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), withPii("doc_id", "text").as("__t"))
        .select(col("doc_id"),
          CleanFunctions.emailCount(col("__t")).as("n_emails"),
          CleanFunctions.urlCount(col("__t")).as("n_urls"),
          CleanFunctions.phoneCount(col("__t")).as("n_phones"),
          md5(CleanFunctions.redactPii(col("__t"))).as("redacted_hash"))
    }),
    "clean_repetition" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val totals = docs
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"),
          when(size(col("__toks")) >= RepN, size(col("__toks")) - (RepN - 1))
            .otherwise(0).cast("long").as("n_grams"))
      val distincts = Dedup.shingleHashes(docs, "doc_id", "text", RepN)
        .groupBy("doc_id").agg(count(lit(1)).as("n_distinct"))
      totals.join(distincts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          CleanFunctions.repetitionRatio(col("n_grams"),
            coalesce(col("n_distinct"), lit(0L))).as("rep_ratio"))
    }),
    // Corpus-wide boilerplate removal (C4-style repeated-span filter):
    // non-overlapping 8-token blocks seen in ≥2 distinct docs are cut, the
    // remainder reassembled in order. The oracle recomputes the repeated
    // set AND the md5 of every reassembled document, so both the removal
    // decisions and the reconstruction replay exactly.
    "clean_boilerplate" -> ((s, dir) =>
      graft.operators.Boilerplate.removeRepeatedSpans(
        Tables.documents(s, dir), "doc_id", "text", SpanW, SpanMinDocs)),
    // Benchmark decontamination: flag corpus docs sharing any ContamN-gram
    // with the held-out set; n_shared_grams = how many of the doc's distinct
    // long grams are contaminated. The join keys on the 64-bit gram hash —
    // at 100 TB the benchmark side is a broadcast set, the corpus side a
    // map-side semi-join, no corpus self-join anywhere.
    "clean_contamination" -> ((s, dir) => {
      val sh = Dedup.shingleHashes(Tables.documents(s, dir), "doc_id", "text", ContamN)
      val bench = sh.filter(col("doc_id") <= BenchMaxId)
        .select(col("__gh")).distinct()
      sh.filter(col("doc_id") > BenchMaxId)
        .join(bench, "__gh")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
    }),
    // Gopher-style document quality rules (Rae et al. 2021, §A1.1): word
    // count bounds, mean-word-length bounds, alphabetic-token share,
    // function-word floor. Every rule is an INTEGER comparison (3·nt ≤
    // chars ≤ 10·nt instead of a mean in doubles), so the booleans are
    // closed under any engine arithmetic — and at 100 TB the whole filter
    // is one narrow projection over the corpus scan, no shuffle at all.
    "clean_gopher_rules" -> ((s, dir) => {
      val g = CleanFunctions.Gopher
      val (nt, ch, al, st) = g.counts(col("__toks"))
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), nt.as("n_tokens"), ch.as("n_token_chars"),
          al.as("n_alpha"), st.as("n_stop"))
        .select(col("doc_id"), col("n_tokens"), col("n_token_chars"),
          col("n_alpha"), col("n_stop"),
          g.rLen(col("n_tokens")).as("r_len"),
          g.rWordLen(col("n_tokens"), col("n_token_chars")).as("r_wordlen"),
          g.rAlpha(col("n_tokens"), col("n_alpha")).as("r_alpha"),
          g.rStop(col("n_stop")).as("r_stop"))
        .withColumn("keep",
          col("r_len") && col("r_wordlen") && col("r_alpha") && col("r_stop"))
    }),
    // C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep lines
    // that end in terminal punctuation, have ≥5 words, and carry no "lorem
    // ipsum" or '{'. The corpus is single-line, so the query plants a
    // deterministic multi-line scaffold per doc (lines engineered to
    // exercise every rule, one varying per doc_id); the md5 over the
    // reassembled kept lines pins both the per-line decisions and the
    // reconstruction. Stateless per-row — the 100 TB plan is scan+project.
    "clean_c4_lines" -> ((s, dir) => {
      val keepLine = (l: org.apache.spark.sql.Column) =>
        l.rlike("[.!?]$") &&
          size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 5 &&
          !l.contains("lorem ipsum") && !l.contains("{")
      Tables.documents(s, dir)
        .select(col("doc_id"), split(c4Scaffold, "\n").as("__lines"))
        .select(col("doc_id"),
          size(col("__lines")).cast("long").as("n_lines"),
          filter(col("__lines"), keepLine).as("__kept"))
        .select(col("doc_id"), col("n_lines"),
          size(col("__kept")).cast("long").as("n_kept"),
          md5(concat_ws("\n", col("__kept"))).as("kept_hash"))
    }),
    // C4's OTHER line rule: corpus-global line dedup — every line keeps
    // only its FIRST occurrence (by (doc, position)); later copies drop,
    // including within-document repeats. One keyed agg on the line (the
    // skew-safe argmin form — a hot line partial-aggregates, never
    // windows) + one keyed join back. The md5 over each reassembled doc
    // pins every drop decision corpus-wide.
    "clean_c4_line_dedup" -> ((s, dir) => {
      val lines = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(split(c4Scaffold, "\n")).as(Seq("idx", "line")))
        // encoded (doc, position) argmin key — MaxLinesPerDoc bounds idx so
        // keys can't collide across documents (a 2^20-line ≈ 100 MB doc is
        // past any plausible input; both engines interpolate the SAME bound)
        .withColumn("__k", col("doc_id") * MaxLinesPerDoc + col("idx"))
      val winners = lines.groupBy("line").agg(min(col("__k")).as("__w"))
      val kept = lines.join(winners, "line").filter(col("__k") === col("__w"))
      val totals = lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      val keptAgg = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("__nk"),
          md5(concat_ws("\n",
            transform(array_sort(collect_list(struct(col("idx"), col("line")))),
              s => s.getField("line")))).as("__kh"))
      totals.join(keptAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_lines"),
          coalesce(col("__nk"), lit(0L)).as("n_kept"),
          coalesce(col("__kh"), md5(lit(""))).as("kept_hash"))
    }),
    // k-anonymity audit with one generalization level (Sweeney 2002 — the
    // release gate a pipeline runs before user-derived records leave it):
    // a row whose full quasi-identifier group (segment × nation) has ≥ k
    // members publishes as-is; otherwise it falls back to the segment-only
    // generalization if THAT group has ≥ k; otherwise it must be
    // suppressed. Two keyed group-count aggregates joined back — the QI
    // dimensions are bounded, so both count frames broadcast at any corpus
    // scale; no window over the full table. The per-segment outcome census
    // is exact integers, hash-pinned.
    "clean_k_anonymity" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_nationkey"))
      val pair = cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("__np"))
      val seg = cust.groupBy("c_mktsegment").agg(count(lit(1)).as("__ns"))
      cust.join(broadcast(pair), Seq("c_mktsegment", "c_nationkey"))
        .join(broadcast(seg), Seq("c_mktsegment"))
        .select(col("c_mktsegment"),
          when(col("__np") >= AnonK, lit(0L))
            .when(col("__ns") >= AnonK, lit(1L))
            .otherwise(lit(2L)).as("__lvl"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__lvl") === 0L, 1L).otherwise(0L)).as("n_full"),
          sum(when(col("__lvl") === 1L, 1L).otherwise(0L)).as("n_generalized"),
          sum(when(col("__lvl") === 2L, 1L).otherwise(0L)).as("n_suppressed"))
        .withColumn("k", lit(AnonK))
    }),
    // Warner randomized response (JASA 1965) — the local-DP collection
    // mechanism: each respondent reports the truth with p=1/2, else an
    // independent fair coin, so no individual report reveals the
    // sensitive bit, yet the population share debiases EXACTLY:
    // E[reported] = p/2 + 1/4 ⇒ p̂ = (4·reported − n) / (2n). Both coins
    // are md5-derived (the corpus randomness discipline — deterministic,
    // so mechanism AND debias replay bit-for-bit in the oracle). Per
    // nation: true share vs the estimate recovered from the noised
    // reports, all exact e6 rationals.
    "clean_randomized_response" -> ((s, dir) => {
      val sensitive = col("c_mktsegment") === "BUILDING"
      val coin1 = graft.operators.Sampling.hashBucket(
        concat(lit("rr1:"), col("c_custkey").cast("string")), 2)
      val coin2 = graft.operators.Sampling.hashBucket(
        concat(lit("rr2:"), col("c_custkey").cast("string")), 2)
      val reported = when(coin1 === 0L, sensitive).otherwise(coin2 === 0L)
      Tables.customer(s, dir)
        .select(col("c_nationkey"),
          sensitive.cast("long").as("__t"), reported.cast("long").as("__r"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"),
          sum(col("__t")).as("true_cnt"),
          sum(col("__r")).as("reported_cnt"))
        .select(col("c_nationkey"), col("n"), col("true_cnt"),
          col("reported_cnt"),
          graft.functions.ExactRound.roundDiv(
            col("true_cnt") * lit(1000000L), col("n")).as("true_share_e6"),
          graft.functions.ExactRound.roundDiv(
            (col("reported_cnt") * 4L - col("n")) * lit(1000000L),
            col("n") * 2L).as("est_share_e6"))
    }))

  private val AnonK = 10L // k-anonymity threshold (clean_k_anonymity)

  val oracles: Map[String, String] = Map(
    // The expected frontier replayed as a pure function of doc_id: l2
    // carries a query string so it can never collide with l1/l3; l1 vs l3
    // collide exactly when 8·doc_id ≡ 0 (mod N) — the dedup CASE handles
    // it generically.
    "clean_html_links" ->
      """WITH nn0 AS (SELECT count(*) AS n FROM documents),
        |d AS (SELECT doc_id,
        |    'http://ex.org/doc/' || CAST((doc_id*3)%n AS VARCHAR) AS l1,
        |    'http://ex.org/doc/' || CAST((doc_id*7)%n AS VARCHAR) || '?q=a&b' AS l2,
        |    'http://ex.org/doc/' || CAST((doc_id*11)%n AS VARCHAR) AS l3
        |  FROM documents, nn0)
        |SELECT doc_id,
        |  CAST(2 + CASE WHEN l3 <> l1 THEN 1 ELSE 0 END AS BIGINT) AS n_links,
        |  md5(l1 || '|' || l2 ||
        |    CASE WHEN l3 <> l1 THEN '|' || l3 ELSE '' END) AS links_hash
        |FROM d""".stripMargin,
    // The expected robots OUTCOME replayed as a pure function of doc_id:
    // even hosts use the graftbot group — Disallow '/doc/*h$' (spec 9)
    // loses only to Allow '/doc/1*h$' (spec 11), and the `*` group's
    // '/doc/2*' must NOT leak in; odd hosts use the `*` group alone.
    "clean_robots_filter" ->
      """WITH f AS (SELECT doc_id, CAST(doc_id % 7 AS INT) AS h,
        |    CAST(doc_id AS VARCHAR) AS ids
        |  FROM documents)
        |SELECT doc_id,
        |  'h' || CAST(h AS VARCHAR) || '.ex.org' AS host,
        |  CASE WHEN h % 2 = 0 THEN
        |      (ids LIKE '1%' || CAST(h AS VARCHAR))
        |        OR NOT (ids LIKE '%' || CAST(h AS VARCHAR))
        |    ELSE NOT (ids LIKE '2%') END AS allowed
        |FROM f""".stripMargin,
    // The same planted frontier, then the same longest-match arbitration
    // replayed as CASE/greatest over the rule literals.
    "clean_url_filter" ->
      s"""WITH nn0 AS (SELECT count(*) AS n FROM documents),
         |d AS (SELECT doc_id,
         |    'http://ex.org/doc/' || CAST((doc_id*3)%n AS VARCHAR) AS l1,
         |    'http://ex.org/doc/' || CAST((doc_id*7)%n AS VARCHAR) || '?q=a&b' AS l2,
         |    'http://ex.org/doc/' || CAST((doc_id*11)%n AS VARCHAR) AS l3
         |  FROM documents, nn0),
         |li AS (SELECT doc_id, u FROM (
         |    SELECT doc_id, l1 AS u FROM d
         |    UNION ALL SELECT doc_id, l2 FROM d
         |    UNION ALL SELECT doc_id, CASE WHEN l3 <> l1 THEN l3 END FROM d) z
         |  WHERE u IS NOT NULL),
         |f AS (SELECT doc_id, u,
         |    ${graft.functions.CleanFunctions.urlFilterSql("u", UrlRules)} AS ok
         |  FROM li)
         |SELECT doc_id, count(*) AS n_links,
         |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
         |  md5(coalesce(string_agg(CASE WHEN ok THEN u END, '|' ORDER BY u), ''))
         |    AS allowed_hash
         |FROM f GROUP BY doc_id""".stripMargin,
    // The same per-host window replayed: slots off (pri desc, url), the
    // cap as a rank filter, the delay as integer arithmetic.
    "rank_crawl_schedule" ->
      s"""WITH $toksCte,
         |f AS (SELECT d.doc_id,
         |    'h' || CAST(d.doc_id % 7 AS VARCHAR) || '.ex.org' AS host,
         |    'http://h' || CAST(d.doc_id % 7 AS VARCHAR) || '.ex.org/doc/'
         |      || CAST(d.doc_id AS VARCHAR) AS url,
         |    CAST(len(t.toks) AS BIGINT) AS pri
         |  FROM documents d JOIN tokd t USING (doc_id)),
         |r AS (SELECT doc_id, host,
         |    CAST(row_number() OVER (PARTITION BY host
         |      ORDER BY pri DESC, url) - 1 AS BIGINT) AS slot
         |  FROM f)
         |SELECT doc_id, host, slot,
         |  CAST(slot * $CrawlSlotMs AS BIGINT) AS fetch_after_ms
         |FROM r WHERE slot < $CrawlCap""".stripMargin,
    "rank_crawl_pagerank" ->
      s"""WITH nn0 AS (SELECT count(*) AS n FROM documents),
         |e AS (SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id AS src, (doc_id*3)%n AS dst FROM documents, nn0
         |    UNION ALL SELECT doc_id, (doc_id*7)%n FROM documents, nn0
         |    UNION ALL SELECT doc_id, (doc_id*11)%n FROM documents, nn0) u),
         |${graft.operators.PageRank.pagerankRoundsSql(CrawlPrIters, 85, "doc_id")}""".stripMargin,
    // The fixture is INVERTIBLE: the expected extraction is the doc text
    // (whitespace-collapsed) plus each variant's known visible additions —
    // the oracle replays the answer, pinning the state machine end to end
    // (escape→decode must round-trip, script/style/comment must vanish,
    // CDATA must surface literally, the attribute '>' must not truncate).
    "clean_html_extract" ->
      """WITH exp AS (SELECT doc_id,
        |    trim(regexp_replace(text, '\s+', ' ', 'g')) ||
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN ''
        |      WHEN 1 THEN ' & <tag> ' || chr(8212) || ' "q"'
        |      WHEN 2 THEN ' raw <b>not-a-tag</b>'
        |      ELSE ' trailer' END AS t
        |  FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  md5(t) AS text_hash
        |FROM exp""".stripMargin,
    // Main-content: the chrome must vanish entirely — expected is the doc
    // text alone.
    "clean_html_main" ->
      """WITH exp AS (SELECT doc_id,
        |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
        |  FROM documents)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  md5(t) AS text_hash
        |FROM exp""".stripMargin,
    // Same messying (chr(9) = tab, chr(769) = U+0301 combining acute), then
    // DuckDB's own utf8proc NFC — byte-equality of the output text pins the
    // two independent UAX#15 implementations against each other.
    "clean_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    nfc_normalize(text || '  x' || chr(9) || 'e' || chr(769) || '  '),
        |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,
    "clean_pii_redact" ->
      s"""WITH t AS (SELECT doc_id,
         |    text || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com via https://ex.org/p/' || CAST(doc_id AS VARCHAR)
         |      || ' or 555-123-4567' AS tt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(tt, '$EmailPattern')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(tt, '$UrlPattern')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(tt, '$PhonePattern')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(tt,
         |    '$EmailPattern', '<EMAIL>', 'g'),
         |    '$UrlPattern', '<URL>', 'g'),
         |    '$PhonePattern', '<PHONE>', 'g')) AS redacted_hash
         |FROM t""".stripMargin,
    "clean_repetition" ->
      s"""WITH $toksCte,
         |${DocSql.shingleHashCte(RepN)},
         |tot AS (SELECT doc_id,
         |    CAST(CASE WHEN len(toks) >= $RepN THEN len(toks) - ${RepN - 1}
         |      ELSE 0 END AS BIGINT) AS n_grams
         |  FROM tokd),
         |dis AS (SELECT doc_id, count(*) AS n_distinct FROM shd GROUP BY 1)
         |SELECT t.doc_id, t.n_grams,
         |  CAST(coalesce(d.n_distinct, 0) AS BIGINT) AS n_distinct,
         |  CASE WHEN t.n_grams = 0 THEN 0.0
         |    ELSE ${graft.functions.ExactRound.ratioRound6IntSql(
                  "t.n_grams - coalesce(d.n_distinct, 0)", 0, "t.n_grams")}
         |  END AS rep_ratio
         |FROM tot t LEFT JOIN dis d USING (doc_id)""".stripMargin,
    "clean_boilerplate" ->
      s"""WITH $toksCte,
         |b AS (SELECT doc_id, toks, CAST(len(toks) // $SpanW AS INT) AS nw FROM tokd),
         |wx AS (SELECT doc_id, toks, nw, unnest(generate_series(1, nw)) AS w FROM b),
         |win AS (SELECT doc_id, w,
         |    list_aggregate(toks[(w-1)*$SpanW+1 : w*$SpanW], 'string_agg', ' ') AS span
         |  FROM wx),
         |wh AS (SELECT doc_id, w, span,
         |    ${DocSql.tokenHashSql("span")} AS sh FROM win),
         |rep AS (SELECT sh FROM wh GROUP BY sh
         |  HAVING count(DISTINCT doc_id) >= $SpanMinDocs),
         |kept AS (SELECT doc_id, string_agg(span, ' ' ORDER BY w) AS spans
         |  FROM wh WHERE sh NOT IN (SELECT sh FROM rep) GROUP BY 1),
         |rem AS (SELECT doc_id, count(*) AS nrem
         |  FROM wh WHERE sh IN (SELECT sh FROM rep) GROUP BY 1)
         |SELECT b.doc_id, CAST(b.nw AS BIGINT) AS n_spans,
         |  CAST(coalesce(rem.nrem, 0) AS BIGINT) AS n_removed,
         |  md5(concat_ws(' ', k.spans,
         |    CASE WHEN len(b.toks) > b.nw * $SpanW
         |      THEN list_aggregate(b.toks[b.nw*$SpanW+1 : len(b.toks)], 'string_agg', ' ')
         |    END)) AS cleaned_hash
         |FROM b LEFT JOIN kept k USING (doc_id) LEFT JOIN rem USING (doc_id)""".stripMargin,
    "clean_contamination" ->
      s"""WITH $toksCte,
         |${DocSql.shingleHashCte(ContamN)},
         |bench AS (SELECT DISTINCT ghv FROM shd WHERE doc_id <= $BenchMaxId)
         |SELECT doc_id, count(*) AS n_shared_grams
         |FROM shd JOIN bench USING (ghv)
         |WHERE doc_id > $BenchMaxId
         |GROUP BY 1""".stripMargin,
    "clean_gopher_rules" ->
      s"""WITH $toksCte,
         |c AS (SELECT doc_id,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS n_token_chars,
         |    CAST(len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT) AS n_alpha,
         |    CAST(len(list_filter(toks, t -> t IN ${TextFunctions.langWords.head._2.map(w => s"'$w'").mkString("(", ", ", ")")})) AS BIGINT) AS n_stop
         |  FROM tokd)
         |SELECT doc_id, n_tokens, n_token_chars, n_alpha, n_stop,
         |  (n_tokens >= $GopherMinToks AND n_tokens <= $GopherMaxToks) AS r_len,
         |  (n_token_chars >= n_tokens * 3 AND n_token_chars <= n_tokens * 10) AS r_wordlen,
         |  (n_alpha * 5 >= n_tokens * 4) AS r_alpha,
         |  (n_stop >= 2) AS r_stop,
         |  ((n_tokens >= $GopherMinToks AND n_tokens <= $GopherMaxToks)
         |    AND (n_token_chars >= n_tokens * 3 AND n_token_chars <= n_tokens * 10)
         |    AND (n_alpha * 5 >= n_tokens * 4) AND (n_stop >= 2)) AS keep
         |FROM c""".stripMargin,
    "clean_c4_lines" ->
      s"""WITH l AS (SELECT doc_id, $c4ScaffoldSql AS lines
         |  FROM documents),
         |k AS (SELECT doc_id, lines, list_filter(lines, x ->
         |    regexp_matches(x, '[.!?]$$')
         |    AND len(list_filter(string_split_regex(x, '\\s+'), w -> w <> '')) >= 5
         |    AND position('lorem ipsum' IN x) = 0
         |    AND position('{' IN x) = 0) AS kept
         |  FROM l)
         |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  md5(array_to_string(kept, chr(10))) AS kept_hash
         |FROM k""".stripMargin,
    "clean_c4_line_dedup" ->
      s"""WITH l AS (SELECT doc_id, $c4ScaffoldSql AS lines
         |  FROM documents),
         |x AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(lines)),
         |    i -> {'i': CAST(i - 1 AS BIGINT), 'l': lines[i]})) AS s
         |  FROM l),
         |k AS (SELECT doc_id, s.i AS idx, s.l AS line,
         |    doc_id * $MaxLinesPerDoc + s.i AS kk FROM x),
         |w AS (SELECT line, min(kk) AS wk FROM k GROUP BY 1),
         |kept AS (SELECT k.doc_id, k.idx, k.line FROM k
         |  JOIN w ON k.line = w.line AND k.kk = w.wk),
         |t AS (SELECT doc_id, count(*) AS n_lines FROM k GROUP BY 1),
         |ka AS (SELECT doc_id, count(*) AS nk,
         |    md5(string_agg(line, chr(10) ORDER BY idx)) AS kh
         |  FROM kept GROUP BY 1)
         |SELECT t.doc_id, t.n_lines,
         |  CAST(coalesce(ka.nk, 0) AS BIGINT) AS n_kept,
         |  coalesce(ka.kh, md5('')) AS kept_hash
         |FROM t LEFT JOIN ka USING (doc_id)""".stripMargin,
    "clean_k_anonymity" ->
      s"""WITH qi AS (SELECT c_mktsegment, c_nationkey FROM customer),
         |pair AS (SELECT c_mktsegment, c_nationkey, count(*) AS np
         |  FROM qi GROUP BY 1, 2),
         |seg AS (SELECT c_mktsegment, count(*) AS ns FROM qi GROUP BY 1),
         |lvl AS (SELECT qi.c_mktsegment,
         |    CASE WHEN pair.np >= $AnonK THEN 0
         |      WHEN seg.ns >= $AnonK THEN 1 ELSE 2 END AS l
         |  FROM qi
         |  JOIN pair ON pair.c_mktsegment = qi.c_mktsegment
         |    AND pair.c_nationkey = qi.c_nationkey
         |  JOIN seg ON seg.c_mktsegment = qi.c_mktsegment)
         |SELECT c_mktsegment, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN l = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
         |  CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_generalized,
         |  CAST(sum(CASE WHEN l = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
         |  CAST($AnonK AS BIGINT) AS k
         |FROM lvl GROUP BY 1""".stripMargin,
    "clean_randomized_response" -> {
      val rd = graft.functions.ExactRound.roundDivSql _
      s"""WITH rr AS (SELECT c_nationkey,
         |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
         |    CASE WHEN ('0x' || substr(md5('rr1:' || c_custkey), 1, 8))::BIGINT % 2 = 0
         |      THEN CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
         |      ELSE CASE WHEN ('0x' || substr(md5('rr2:' || c_custkey), 1, 8))::BIGINT % 2 = 0
         |        THEN 1 ELSE 0 END
         |    END AS r
         |  FROM customer),
         |g AS (SELECT c_nationkey, count(*) AS n,
         |    CAST(sum(t) AS BIGINT) AS true_cnt,
         |    CAST(sum(r) AS BIGINT) AS reported_cnt
         |  FROM rr GROUP BY 1)
         |SELECT c_nationkey, n, true_cnt, reported_cnt,
         |  ${rd("true_cnt * 1000000", "n")} AS true_share_e6,
         |  ${rd("(reported_cnt * 4 - n) * 1000000", "n * 2")} AS est_share_e6
         |FROM g""".stripMargin
    })
}
