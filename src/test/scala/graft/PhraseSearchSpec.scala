package graft

import graft.operators.PhraseSearch

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def census(docs: Seq[(Long, String)], phrases: Seq[(Long, String)]) =
    PhraseSearch.matchCensus(spark, docs.toDF("doc_id", "text"),
      "doc_id", "text", phrases)
      .collect()
      .map(r => r.getAs[Long]("phrase_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("docid_sum"))))
      .toMap

  test("adjacency is required: scattered terms do not match") {
    val docs = Seq(1L -> "big data fast query", 2L -> "fast big query data")
    val c = census(docs, Seq(10L -> "data fast"))
    // doc 1 has "data fast" adjacent; doc 2 has both words, never adjacent
    assert(c(10L) === ((1L, 1L, 1L)))
  }

  test("repeated term inside a phrase cannot double-vote one anchor") {
    // "a b" must not match "a a" even though two 'a' postings exist
    val docs = Seq(1L -> "a a", 2L -> "a b a b")
    val c = census(docs, Seq(1L -> "a b", 2L -> "a a"))
    assert(c(1L) === ((1L, 2L, 2L))) // two occurrences in doc 2 only
    assert(c(2L) === ((1L, 1L, 1L))) // doc 1 only
  }

  test("overlapping occurrences each count; docid_sum is distinct-doc") {
    val docs = Seq(3L -> "x x x") // "x x" occurs at anchors 0 and 1
    val c = census(docs, Seq(1L -> "x x"))
    assert(c(1L) === ((1L, 2L, 3L)))
  }

  test("case folding matches the corpus tokenizer; zero-hit phrase stays") {
    val docs = Seq(1L -> "Hello World")
    val c = census(docs, Seq(1L -> "hello world", 2L -> "absent phrase"))
    assert(c(1L) === ((1L, 1L, 1L)))
    assert(c(2L) === ((0L, 0L, 0L)))
  }
}
