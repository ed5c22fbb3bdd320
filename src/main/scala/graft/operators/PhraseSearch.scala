package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact phrase search over positional postings — the inverted-index
  * primitive behind quoted-query retrieval (Manning, Raghavan & Schütze,
  * IIR §2.4: positional postings + adjacency intersection). The corpus is
  * exploded ONCE into (term, doc, pos) postings; a phrase of length k
  * matches at anchor a in a doc iff every offset o ∈ [0, k) has a posting
  * (term_o, doc, a + o). Instead of a k-way self-join, all phrases are
  * matched in ONE keyed join: postings ⋈ phrase-terms on the term, each
  * hit voting for its (phrase, doc, pos − offset) anchor, then a keyed
  * aggregate keeps anchors where the count of DISTINCT matched offsets
  * equals the phrase length (distinct, so a term repeated inside a phrase
  * can't double-vote one anchor).
  *
  * Scale shape: the join is keyed on the term — at 100 TB the phrase
  * vocabulary is tiny, so the phrase-terms side broadcasts and the
  * postings side never shuffles; the anchor aggregate is keyed by
  * (phrase, doc, anchor), all bounded-cardinality. Nothing positional
  * ever leaves its document's partition.
  */
object PhraseSearch {

  /** Per-phrase match census over `docs(idCol, textCol)` for literal
    * `phrases` (id, text): (phrase_id, phrase, n_docs, n_occurrences,
    * docid_sum), phrases with no hits kept at zero counts. Tokenization
    * is [[graft.functions.TextFunctions.tokens]] — the corpus-wide
    * convention every text operator here shares. */
  def matchCensus(s: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, phrases: Seq[(Long, String)]): DataFrame = {
    import s.implicits._
    require(phrases.nonEmpty)
    val postings = docs.select(col(idCol).as("__doc"),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("__pos", "__term")))
    val terms = phrases.flatMap { case (pid, p) =>
      val ts = p.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ts.zipWithIndex.map { case (t, o) => (pid, t, o.toLong, ts.length.toLong) }
    }.toDF("phrase_id", "__term", "__off", "__len")
    val dim = phrases.toDF("phrase_id", "phrase")
    val anchors = postings.join(broadcast(terms), "__term")
      .groupBy(col("phrase_id"), col("__doc"),
        (col("__pos") - col("__off")).as("__anchor"), col("__len"))
      .agg(count_distinct(col("__off")).as("__hit"))
      .filter(col("__hit") === col("__len"))
    val perPhrase = anchors.groupBy("phrase_id")
      .agg(count_distinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        sum_distinct(col("__doc")).as("docid_sum"))
    broadcast(dim).join(perPhrase, Seq("phrase_id"), "left")
      .select(col("phrase_id"), col("phrase"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_occurrences"), lit(0L)).as("n_occurrences"),
        coalesce(col("docid_sum"), lit(0L)).as("docid_sum"))
  }

  /** DuckDB twin: CTE block over [[graft.queries.DocSql.toksCte]]'s
    * `tokd(doc_id, toks)`, ending in `phout` with [[matchCensus]]'s five
    * columns. `sum(DISTINCT doc_id)` mirrors `sum_distinct`: an anchor
    * multiplicity must not inflate the checksum. */
  def matchCensusCtesSql(phrases: Seq[(Long, String)]): String = {
    require(phrases.nonEmpty)
    val termRows = phrases.flatMap { case (pid, p) =>
      val ts = p.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ts.zipWithIndex.map { case (t, o) => s"($pid, '$t', $o, ${ts.length})" }
    }.mkString(", ")
    val dimRows = phrases
      .map { case (pid, p) => s"($pid, '$p')" }.mkString(", ")
    s"""phpost AS (SELECT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks)),
       |      i -> {'p': CAST(i - 1 AS BIGINT), 't': toks[i]})) AS s
       |  FROM tokd),
       |phterms(phrase_id, term, off, len) AS (SELECT * FROM (VALUES $termRows)),
       |phdim(phrase_id, phrase) AS (SELECT * FROM (VALUES $dimRows)),
       |phanch AS (SELECT t.phrase_id, p.doc_id, p.s.p - t.off AS anchor, t.len,
       |    count(DISTINCT t.off) AS hit
       |  FROM phpost p JOIN phterms t ON t.term = p.s.t
       |  GROUP BY 1, 2, 3, 4),
       |phhits AS (SELECT phrase_id, doc_id FROM phanch WHERE hit = len),
       |phagg AS (SELECT phrase_id, count(DISTINCT doc_id) AS n_docs,
       |    count(*) AS n_occurrences, sum(DISTINCT doc_id) AS docid_sum
       |  FROM phhits GROUP BY 1),
       |phout AS (SELECT d.phrase_id, d.phrase,
       |    CAST(coalesce(a.n_docs, 0) AS BIGINT) AS n_docs,
       |    CAST(coalesce(a.n_occurrences, 0) AS BIGINT) AS n_occurrences,
       |    CAST(coalesce(a.docid_sum, 0) AS BIGINT) AS docid_sum
       |  FROM phdim d LEFT JOIN phagg a USING (phrase_id))""".stripMargin
  }
}
