package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30)).toDF("id", "v", "n")

  test("upsert: delta replaces, inserts append, untouched rows pass through") {
    val delta = Seq((2L, "TWO", 99), (9L, "nine", 90)).toDF("id", "v", "n")
    val out = Merge.upsert(base, delta, "id", "id")
      .select($"id", $"v", $"__src").as[(Long, String, String)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out.size == 4)
    assert(out(2L) == (("TWO", "delta")))
    assert(out(9L) == (("nine", "delta")))
    assert(out(1L) == (("one", "base")) && out(3L) == (("three", "base")))
  }

  test("upsert: duplicate delta keys resolve deterministically by the tie column") {
    val delta = Seq((2L, "first", 1), (2L, "second", 2)).toDF("id", "v", "n")
    val out = Merge.upsert(base, delta, "id", "n")
      .filter($"id" === 2L).select($"v").as[String].collect()
    assert(out.toSeq == Seq("first"))
  }

  test("delete drops exactly the listed keys, duplicates in the key set are harmless") {
    val keys = Seq(2L, 2L, 9L).toDF("id") // 9 absent from base: no-op
    val left = Merge.delete(base, keys, "id").select($"id").as[Long].collect().toSet
    assert(left == Set(1L, 3L))
  }

  test("upsert rejects mismatched schemas") {
    intercept[IllegalArgumentException] {
      Merge.upsert(base, base.drop("n"), "id", "id")
    }
  }

  test("upsert rejects bases that carry its reserved internal columns") {
    // A base with __src/__pri/__rn would be silently overwritten by the
    // internal withColumns and dropped from the output — fail loudly.
    val tainted = base.withColumn("__src", lit("x"))
    intercept[IllegalArgumentException] {
      Merge.upsert(tainted, tainted, "id", "id")
    }
  }
}
