package graft

import org.apache.spark.sql.functions._
import graft.operators.Crawl

/** The crawl control plane's operator semantics: politeness slots under
  * a per-host cap, and the SURT key transform. */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  test("schedule: per-host slots by (priority desc, url), cap drops tails, delay stamps slots") {
    val frontier = Seq(
      ("a.org", "http://a.org/1", 5L), ("a.org", "http://a.org/2", 9L),
      ("a.org", "http://a.org/3", 9L), ("a.org", "http://a.org/4", 1L),
      ("b.org", "http://b.org/1", 7L))
      .toDF("host", "url", "pri")
    val out = Crawl.schedule(frontier, "host", "url", "pri", cap = 3,
        slotMillis = 100L)
      .select("url", "slot", "fetch_after_ms")
      .as[(String, Long, Long)].collect()
      .map { case (u, s, f) => u -> (s, f) }.toMap
    // ties (9,9) break by url; the cap drops a.org's 4th URL entirely
    assert(out("http://a.org/2") == (0L, 0L))
    assert(out("http://a.org/3") == (1L, 100L))
    assert(out("http://a.org/1") == (2L, 200L))
    assert(!out.contains("http://a.org/4"), "the per-host cap must bite")
    assert(out("http://b.org/1") == (0L, 0L), "hosts schedule independently")
  }

  test("surtKey: labels reverse, path survives verbatim, bare hosts read as /") {
    val keys = Seq(
      "http://ex.org/doc/1", "https://a.b.example.co.uk/x/y?q=1",
      "http://single/", "http://ex.org")
      .toDF("url")
      .select(Crawl.surtKey(col("url")).as("k")).as[String].collect()
    assert(keys(0) == "org,ex)/doc/1")
    assert(keys(1) == "uk,co,example,b,a)/x/y?q=1")
    assert(keys(2) == "single)/")
    assert(keys(3) == "ex.org".split("\\.").reverse.mkString(",") + ")/",
      "a bare host gets the / path")
  }
}
