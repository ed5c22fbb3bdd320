package graft

import org.apache.spark.sql.functions._
import graft.functions.CleanFunctions
import graft.operators.Dedup

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, urls, and phones; counts match") {
    val df = Seq(
      (1L, "mail a.user+tag@sub.example.org then see https://ex.org/a?q=1 or call 555-123-4567."),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.co and http://plain.example")).toDF("id", "t")
    val r = df.select($"id",
        CleanFunctions.emailCount($"t").as("e"),
        CleanFunctions.urlCount($"t").as("u"),
        CleanFunctions.phoneCount($"t").as("p"),
        CleanFunctions.redactPii($"t").as("red"))
      .as[(Long, Long, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    assert((r(1L)._2, r(1L)._3, r(1L)._4) == ((1L, 1L, 1L)))
    assert(r(1L)._5 == "mail <EMAIL> then see <URL> or call <PHONE>.")
    assert((r(2L)._2, r(2L)._3, r(2L)._4) == ((0L, 0L, 0L)))
    assert(r(2L)._5 == "no pii here at all")
    assert((r(3L)._2, r(3L)._3) == ((2L, 1L)))
    assert(r(3L)._5 == "two mails <EMAIL> <EMAIL> and <URL>")
  }

  test("repetitionRatio: 0 for distinct grams, high for a looped doc") {
    val df = Seq(
      (1L, "a b c d e f g h"),                   // all 3-grams distinct
      (2L, "spam ham eggs spam ham eggs spam ham eggs spam ham eggs"), // loop
      (3L, "xy")).toDF("doc_id", "text")         // < n tokens
    val totals = df.select($"doc_id",
      when(size(graft.functions.TextFunctions.tokens($"text")) >= 3,
        size(graft.functions.TextFunctions.tokens($"text")) - 2)
        .otherwise(0).cast("long").as("n_grams"))
    val distincts = Dedup.shingleHashes(df, "doc_id", "text", 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n_distinct"))
    val r = totals.join(distincts, Seq("doc_id"), "left")
      .select($"doc_id", $"n_grams", coalesce($"n_distinct", lit(0L)),
        CleanFunctions.repetitionRatio($"n_grams", coalesce($"n_distinct", lit(0L))))
      .as[(Long, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(r(1L)._4 == 0.0)
    // 12 tokens → 10 grams, only 3 distinct rotations → ratio 0.7
    assert(r(2L)._2 == 10L && r(2L)._3 == 3L)
    assertNear(r(2L)._4, 0.7)
    assert(r(3L)._2 == 0L && r(3L)._4 == 0.0)
  }

  test("contamination flags only docs sharing a long gram with the benchmark") {
    val bench = "the quick brown fox jumps over the lazy dog every single day"
    val df = Seq(
      (1L, bench),                                   // benchmark member
      (200L, s"prefix words $bench suffix words"),   // contains the span
      (300L, "completely unrelated text with no overlap at all whatsoever now")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleHashes(df, "doc_id", "text", 8)
    val b = sh.filter($"doc_id" <= 100L).select($"__gh").distinct()
    val hits = sh.filter($"doc_id" > 100L).join(b, "__gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(200L) && hits(200L) >= 1L)
    assert(!hits.contains(300L))
  }

  test("removeRepeatedSpans cuts the shared block, keeps unique text and tails") {
    val shared = "one two three four" // window = 4 tokens
    val df = Seq(
      (1L, s"$shared alpha beta gamma delta tail1 tail2"),
      (2L, s"$shared aaa bbb ccc ddd"),
      (3L, "totally different words here entirely distinct content"),
      (4L, "tiny doc")) // shorter than one window
      .toDF("doc_id", "text")
    val out = graft.operators.Boilerplate
      .removeRepeatedSpans(df, "doc_id", "text", window = 4, minDocs = 2)
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> t).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // Docs 1 and 2 share the first block → removed from both.
    assert(out(1L)._3 == 1L && out(1L)._2 == 2L)
    assert(out(1L)._4 == h("alpha beta gamma delta tail1 tail2"))
    assert(out(2L)._3 == 1L)
    assert(out(2L)._4 == h("aaa bbb ccc ddd"))
    // Unique doc untouched; sub-window doc passes through whole.
    assert(out(3L)._3 == 0L && out(3L)._4 == h("totally different words here entirely distinct content"))
    assert(out(4L)._2 == 0L && out(4L)._4 == h("tiny doc"))
  }
}
