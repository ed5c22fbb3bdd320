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

  private def versions(df: org.apache.spark.sql.DataFrame) =
    df.select($"id", $"v", $"valid_from", $"valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("scd2: changed keys close + insert, identical redelivery is a no-op, inserts open") {
    val h0 = Merge.scd2Init(base)
    // 2 changes, 3 is re-delivered byte-identical, 9 is new.
    val delta = Seq((2L, "TWO", 20), (3L, "three", 30), (9L, "nine", 90))
      .toDF("id", "v", "n")
    val h1 = Merge.scd2Apply(h0, delta, "id", 1L)
    assert(versions(h1) == Set(
      (1L, "one", 0L, None),
      (2L, "two", 0L, Some(1L)), (2L, "TWO", 1L, None),
      (3L, "three", 0L, None),            // no spurious version
      (9L, "nine", 1L, None)))
    // Chain a second batch: 2 changes again — its batch-1 version closes.
    val h2 = Merge.scd2Apply(h1, Seq((2L, "ZWEI", 20)).toDF("id", "v", "n"),
      "id", 2L)
    assert(versions(h2) == Set(
      (1L, "one", 0L, None),
      (2L, "two", 0L, Some(1L)), (2L, "TWO", 1L, Some(2L)),
      (2L, "ZWEI", 2L, None),
      (3L, "three", 0L, None),
      (9L, "nine", 1L, None)))
    // Null-safe change detection: null -> value and value -> null both count.
    val hn = Merge.scd2Apply(
      Merge.scd2Init(Seq((1L, null.asInstanceOf[String], 1)).toDF("id", "v", "n")),
      Seq((1L, "x", 1)).toDF("id", "v", "n"), "id", 5L)
    assert(versions(hn) == Set(
      (1L, null, 0L, Some(5L)), (1L, "x", 5L, None)))
  }

  test("scd2: duplicate keys WITHIN one batch cannot fan out versions") {
    val h0 = Merge.scd2Init(base)
    // Key 3: byte-identical duplicate (same-batch redelivery) — still a
    // no-op. Key 2: genuinely conflicting duplicates — the
    // lexicographic-least data wins deterministically, ONE version minted.
    val delta = Seq((3L, "three", 30), (3L, "three", 30),
      (2L, "B", 1), (2L, "A", 1)).toDF("id", "v", "n")
    val h1 = Merge.scd2Apply(h0, delta, "id", 1L)
    assert(versions(h1) == Set(
      (1L, "one", 0L, None),
      (2L, "two", 0L, Some(1L)), (2L, "A", 1L, None),
      (3L, "three", 0L, None)))
  }

  test("scd2 handles key-only histories (no data columns to order duplicates by)") {
    val kb = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val h = Merge.scd2Apply(Merge.scd2Init(kb),
      Seq(Tuple1(2L), Tuple1(2L), Tuple1(9L)).toDF("id"), "id", 1L)
    assert(h.select($"id", $"valid_from", $"valid_to")
      .as[(Long, Long, Option[Long])].collect().toSet ==
      Set((1L, 0L, None), (2L, 0L, None), (9L, 1L, None)))
  }

  test("scd2 rejects mismatched delta schemas and histories without meta columns") {
    intercept[IllegalArgumentException] {
      Merge.scd2Apply(Merge.scd2Init(base), base.drop("n"), "id", 1L)
    }
    intercept[IllegalArgumentException] {
      Merge.scd2Apply(base, base, "id", 1L) // no valid_from/valid_to
    }
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
