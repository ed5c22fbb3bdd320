package graft

import java.sql.Timestamp
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 09:00:00"), 200L)) // before any right row
    .toDF("key", "ts", "lid")
  private lazy val right = Seq(
    (1L, ts("2024-01-01 09:30:00"), 10L),
    (1L, ts("2024-01-01 10:00:00"), 11L), // equal ts → counts (≤)
    (1L, ts("2024-01-01 10:00:00"), 12L), // tie → greatest id wins
    (1L, ts("2024-01-01 11:00:00"), 13L),
    (2L, ts("2024-01-01 09:30:00"), 20L))
    .toDF("key", "ts", "rid")

  test("latest prior-or-equal right row per key; ties → greatest id; none → null") {
    val out = AsofJoin.latestPriorId(left, right, "key", "ts", "lid", "rid")
      .select($"lid", $"asof_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(100L).contains(12L)) // equal-ts rows count, max id among ties
    assert(out(101L).contains(13L)) // strictly prior
    assert(out(200L).isEmpty)       // nothing at or before
  }

  test("left rows all preserved (left-outer semantics)") {
    val out = AsofJoin.latestPriorId(left, right, "key", "ts", "lid", "rid")
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("key", "lid", "ts", "asof_id"))
  }
}
