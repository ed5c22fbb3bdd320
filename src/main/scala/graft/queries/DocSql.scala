package graft.queries

/** Shared DuckDB CTE snippets over `documents` — single source of truth for
  * the oracle-side mirrors of [[graft.functions.TextFunctions.tokens]],
  * [[graft.operators.Dedup.shingles]] and
  * [[graft.operators.Embedder.hashTfEmbed]], so text/dedup/embed oracles
  * can't drift apart. */
private[queries] object DocSql {

  /** Mirror of TextFunctions.tokens over documents: (doc_id, text, toks). */
  val toksCte: String =
    """tokd AS (SELECT doc_id, text,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS toks
      |  FROM documents)""".stripMargin

  /** Mirror of TextFunctions.tokenHash. */
  def tokenHashSql(x: String): String = s"('0x' || substr(md5($x), 1, 8))::BIGINT"

  /** Mirror of TextFunctions.qualityScoreFromTokens over SQL expressions
    * for the token list and the raw text — the ONE copy of the composite
    * quality formula every quality-consuming oracle interpolates (it
    * appeared four times before; a formula tweak missing one copy made a
    * pinned oracle diverge for reasons unrelated to the query under
    * test). */
  def qualitySql(toks: String, text: String): String = {
    val enIn = graft.functions.TextFunctions.langWords.head._2
      .map(w => s"'$w'").mkString("(", ",", ")")
    s"""0.4 * least(1.0, len($toks) / 100.0) +
       |  0.3 * (1.0 - CASE WHEN len($text) = 0 THEN 0.0
       |    ELSE CAST(len(regexp_replace(lower($text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE) / len($text) END) +
       |  0.3 * least(1.0, 4.0 * CASE WHEN len($toks) = 0 THEN 0.0
       |    ELSE CAST(len(list_filter($toks, gq -> gq IN $enIn)) AS DOUBLE) / len($toks) END)""".stripMargin
      .linesIterator.mkString(" ")
  }

  /** Mirror of Dedup.shingles: (doc_id, gram), distinct token n-grams.
    * Requires [[toksCte]]. */
  def shinglesCte(n: Int): String = {
    val parts = (1 to n).map(o => if (o == 1) "toks[i]" else s"toks[i+${o - 1}]")
      .mkString("||' '||")
    s"""shd AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(generate_series(1, len(toks) - ${n - 1}), i -> $parts))) AS gram
       |  FROM tokd WHERE len(toks) >= $n)""".stripMargin
  }

  /** Mirror of Dedup.shingleHashes: (doc_id, ghv), distinct rolling n-gram
    * hashes — the fold of acc·31 + tokenHash mod Dedup.ShingleP, unrolled
    * with the very same constants the Spark operator uses. Requires
    * [[toksCte]]. */
  def shingleHashCte(n: Int): String = {
    val p = graft.operators.Dedup.ShingleP
    val fold = (0 until n).foldLeft("CAST(0 AS BIGINT)") { (acc, o) =>
      val tok = if (o == 0) "toks[i]" else s"toks[i+$o]"
      s"(($acc) * 31 + ${tokenHashSql(tok)}) % $p"
    }
    s"""shd AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(generate_series(1, len(toks) - ${n - 1}), i -> $fold))) AS ghv
       |  FROM tokd WHERE len(toks) >= $n)""".stripMargin
  }

  /** Mirror of SpanDedup.gramPositions: ends in posg(doc_id, pos, ghv) —
    * every k-gram window's 1-based start position with its rolling hash,
    * NON-distinct (repeated windows are the signal). Same fold constants as
    * [[shingleHashCte]]. Requires [[toksCte]]. */
  def gramPosCte(k: Int): String = {
    val p = graft.operators.Dedup.ShingleP
    val fold = (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, o) =>
      val tok = if (o == 0) "toks[i]" else s"toks[i+$o]"
      s"(($acc) * 31 + ${tokenHashSql(tok)}) % $p"
    }
    s"""pgr AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> {'p': CAST(i AS BIGINT), 'g': $fold})) AS s
       |  FROM tokd WHERE len(toks) >= $k),
       |posg AS (SELECT doc_id, s.p AS pos, s.g AS ghv FROM pgr)""".stripMargin
  }

  /** Mirror of SpanDedup.duplicateSpans: duplicated window starts (hash
    * count ≥ 2 within `dupSrc`, which defaults to `src`) → merged maximal
    * spans (break when start gap > k). `src`/`dupSrc` must expose
    * (doc_id, pos, ghv) — [[gramPosCte]]'s `posg`, or filtered views of it
    * (subset-scoped span dedup marks and counts within the subset; the
    * incremental path counts over the FULL corpus but marks only delta
    * positions). Ends in sp(doc_id, island, s, e). */
  def spanCtes(k: Int, src: String = "posg", dupSrc: String = ""): String = {
    val d = if (dupSrc.isEmpty) src else dupSrc
    s"""dupg AS (SELECT ghv FROM $d GROUP BY 1 HAVING count(*) >= 2),
       |dpo AS (SELECT $src.doc_id, $src.pos FROM $src JOIN dupg USING (ghv)),
       |lagd AS (SELECT doc_id, pos,
       |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM dpo),
       |isl AS (SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagd),
       |sp AS (SELECT doc_id, island, min(pos) AS s, max(pos) + ${k - 1} AS e
       |  FROM isl GROUP BY 1, 2)""".stripMargin
  }

  /** Mirror of [[graft.operators.Winnow.fingerprints]]: winnowing
    * over [[gramPosCte]]'s windows — the (min-hash, rightmost-pos) argmin
    * per w-window packed into `ghv·2³² + (2³²−1−pos)` so one `min()`
    * window aggregate replays the Spark side's tie-break exactly. Ends in
    * wfp(doc_id, fp_pos, fp_hash); includes [[gramPosCte]] (requires
    * [[toksCte]]). */
  def winnowCte(k: Int, w: Int): String =
    s"""${gramPosCte(k)},
       |wwk AS (SELECT doc_id, pos,
       |    ghv * 4294967296 + (4294967295 - pos) AS wkey,
       |    count(*) OVER (PARTITION BY doc_id) AS n
       |  FROM posg),
       |wmw AS (SELECT doc_id, pos, n,
       |    min(wkey) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS mk
       |  FROM wwk),
       |wfp AS (SELECT DISTINCT doc_id,
       |    4294967295 - (mk % 4294967296) AS fp_pos,
       |    mk // 4294967296 AS fp_hash
       |  FROM wmw WHERE pos <= greatest(1, n - ${w - 1}))""".stripMargin

  /** Mirror of Dedup.simhashOf: ends in sh(doc_id, simhash). Requires
    * [[toksCte]]. */
  val simhashCte: String =
    s"""bs AS (SELECT doc_id, list_transform(generate_series(0, 31), i ->
       |    coalesce(list_sum(list_transform(toks, t ->
       |      CASE WHEN ((${tokenHashSql("t")} >> i) & 1) = 1
       |        THEN 1 ELSE -1 END)), 0)) AS sums
       |  FROM tokd),
       |sh AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(generate_series(0, 31),
       |    i -> CASE WHEN sums[i+1] > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)), 0) AS BIGINT) AS simhash
       |  FROM bs)""".stripMargin

  /** Mirror of Embedder.tfidfEmbed at the given dim: ends in
    * nv(doc_id, vec) with unit-norm doubles. Requires [[toksCte]]. */
  def tfidfCte(dim: Int): String =
    s"""tok AS (SELECT doc_id, unnest(toks) AS t FROM tokd),
       |bk AS (SELECT doc_id,
       |    CAST(${tokenHashSql("t")} % $dim AS INT) AS bkt,
       |    CAST(count(*) AS DOUBLE) AS cnt
       |  FROM tok GROUP BY 1, 2),
       |dfb AS (SELECT bkt, count(*) AS dfb FROM bk GROUP BY 1),
       |nn AS (SELECT count(DISTINCT doc_id) AS n FROM bk),
       |idf AS (SELECT bkt, round(ln(CAST(nn.n + 1 AS DOUBLE) / (dfb.dfb + 1)) + 1.0, 8) AS idf
       |  FROM dfb CROSS JOIN nn),
       |wt AS (SELECT doc_id, bk.bkt AS bkt, bk.cnt * idf.idf AS w
       |  FROM bk JOIN idf USING (bkt)),
       |m AS (SELECT doc_id, map(list(bkt), list(w)) AS mm FROM wt GROUP BY 1),
       |v AS (SELECT doc_id, list_transform(generate_series(0, ${dim - 1}),
       |    i -> coalesce(map_extract(mm, CAST(i AS INT))[1], 0.0)) AS vec FROM m),
       |nv AS (SELECT doc_id,
       |    list_transform(vec, x -> x / sqrt(list_dot_product(vec, vec))) AS vec
       |  FROM v)""".stripMargin

  /** Per-language stopword-hit columns (`en_hits`, …) over a `toks` list —
    * mirror of TextFunctions.stopwordHits per langWords entry; the ONE
    * copy text_lang_id, text_lang_confusion and the dataset card share. */
  def langHitColsSql: String =
    graft.functions.TextFunctions.langWords.map { case (lang, ws) =>
      s"CAST(len(list_filter(toks, t -> t IN ${ws.map(w => s"'$w'").mkString("(", ",", ")")})) AS BIGINT) AS ${lang}_hits"
    }.mkString(",\n  ")

  /** The langIdFromTokens decision CASE over [[langHitColsSql]]'s columns:
    * argmax hits in langWords order, zero hits everywhere → 'und'. */
  def langPredSql: String = {
    val langs = graft.functions.TextFunctions.langWords.map(_._1)
    val great = langs.map(l => s"${l}_hits").mkString("greatest(", ", ", ")")
    val whens = langs.map(l =>
      s"WHEN ${l}_hits > 0 AND ${l}_hits = $great THEN '$l'").mkString("\n    ")
    s"""CASE
       |    $whens
       |    ELSE 'und' END""".stripMargin
  }

  /** Mirror of Embedder.hashTfEmbed at the given dim: ends in
    * nv(doc_id, vec) with unit-norm doubles. Requires [[toksCte]]. */
  def embedCte(dim: Int): String =
    s"""tok AS (SELECT doc_id, unnest(toks) AS t FROM tokd),
       |b AS (SELECT doc_id,
       |    CAST(${tokenHashSql("t")} % $dim AS INT) AS bkt,
       |    CAST(count(*) AS DOUBLE) AS cnt
       |  FROM tok GROUP BY 1, 2),
       |m AS (SELECT doc_id, map(list(bkt), list(cnt)) AS mm FROM b GROUP BY 1),
       |v AS (SELECT doc_id, list_transform(generate_series(0, ${dim - 1}),
       |    i -> coalesce(map_extract(mm, CAST(i AS INT))[1], 0.0)) AS vec FROM m),
       |nv AS (SELECT doc_id,
       |    list_transform(vec, x -> x / sqrt(list_dot_product(vec, vec))) AS vec
       |  FROM v)""".stripMargin
}
