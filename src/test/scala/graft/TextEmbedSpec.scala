package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Embedder

class TextEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "The cat sat on the mat"),
    (2L, "el que la y por los"),
    (3L, "zzz qqq xxx"),
    (4L, ""),
    (5L, "The cat sat on the mat")).toDF("doc_id", "text")

  test("tokens lowercase, split on whitespace, drop empties") {
    val t = docs.filter($"doc_id" === 1)
      .select(tokens(col("text"))).head().getSeq[String](0)
    assert(t == Seq("the", "cat", "sat", "on", "the", "mat"))
    val e = docs.filter($"doc_id" === 4)
      .select(tokens(col("text"))).head().getSeq[String](0)
    assert(e.isEmpty)
  }

  test("langId picks argmax language, und when no hits") {
    val r = docs.select($"doc_id", langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en")
    assert(r(2L) == "es")
    assert(r(3L) == "und")
    assert(r(4L) == "und")
  }

  test("fingerprint: identical texts collide, different texts differ, empty = 0") {
    val fp = docs.select($"doc_id", fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(5L))
    assert(fp(1L) != fp(2L))
    assert(fp(4L) == 0L)
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("quality score stays in [0,1]") {
    val q = docs.select(qualityScore(col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("hashTfEmbed: requested dim, unit norm, deterministic, dup texts equal") {
    for (dim <- Seq(64, 768)) {
      val emb = Embedder.hashTfEmbed(docs, "doc_id", "text", dim)
      val rows = emb.select($"doc_id", $"embedding").as[(Long, Seq[Double])]
        .collect().toMap
      assert(rows.keySet == Set(1L, 2L, 3L, 5L)) // doc 4 has no tokens
      rows.values.foreach { v =>
        assert(v.size == dim)
        assertNear(math.sqrt(v.map(x => x * x).sum), 1.0, 1e-9)
      }
      assert(rows(1L) == rows(5L)) // identical text → identical vector
      assert(rows(1L) != rows(2L))
      // run twice → identical (no RNG anywhere)
      val again = Embedder.hashTfEmbed(docs, "doc_id", "text", dim)
        .select($"doc_id", $"embedding").as[(Long, Seq[Double])].collect().toMap
      assert(again == rows)
    }
  }

  test("hashTfEmbed rejects non-positive dim") {
    intercept[IllegalArgumentException](Embedder.hashTfEmbed(docs, "doc_id", "text", 0))
  }

  test("tfidfEmbed: unit norm, and rare tokens outweigh ubiquitous ones") {
    // "alpha" appears in every doc (idf = ln(4/4)+1 = 1); each second token
    // in exactly one (idf = ln(4/2)+1 ≈ 1.69) — so in hashTf both of a
    // doc's buckets tie at 1/√2, while tfidf must tip toward the rare one.
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val tfidf = Embedder.tfidfEmbed(corpus, "doc_id", "text", 64)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])].collect().toMap
    tfidf.values.foreach { v =>
      assertNear(math.sqrt(v.map(x => x * x).sum), 1.0, 1e-9)
      val mx = v.max
      assert(mx > 0.75 && mx < 0.95, // 1.69/√(1+1.69²) ≈ 0.86; 1/√2 if idf were flat
        s"rare-token weight should dominate after idf, got max $mx")
    }
    val tf = Embedder.hashTfEmbed(corpus, "doc_id", "text", 64)
      .select($"doc_id", $"embedding").as[(Long, Seq[Double])].collect().toMap
    assertNear(tf(1L).max, 1.0 / math.sqrt(2.0), 1e-9) // flat weights tie
  }
}
