package graft

import org.apache.spark.sql.functions._
import graft.operators.ZoneMap

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private val df = (0L until 20L).map(i => (i, i * 10L)).toDF("id", "v")

  test("sorted zones are contiguous runs of rowsPerZone") {
    val zoned = ZoneMap.assignSortedZones(df, 6L, col("v"), col("id"))
    val sizes = zoned.groupBy("zone").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes === Map(0L -> 6L, 1L -> 6L, 2L -> 6L, 3L -> 2L))
    // zone envelopes must not overlap under the sort key
    val st = ZoneMap.stats(zoned, "v").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    st.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"zones overlap: $a vs $b")
    }
  }

  test("survivors: half-open range, boundary zones kept/dropped correctly") {
    val zoned = ZoneMap.assignSortedZones(df, 5L, col("v"), col("id"))
    val st = ZoneMap.stats(zoned, "v")
    // zones: [0,40],[50,90],[100,140],[150,190]
    val surv = ZoneMap.survivors(st, lit(50L), lit(100L)).collect()
      .map(_.getLong(0)).toSet
    assert(surv === Set(1L)) // [100,140] excluded: zmin 100 >= hi
    val surv2 = ZoneMap.survivors(st, lit(45L), lit(101L)).collect()
      .map(_.getLong(0)).toSet
    assert(surv2 === Set(1L, 2L))
    // pruned-scan parity against a direct filter
    val direct = df.filter(col("v") >= 45L && col("v") < 101L).count()
    val pruned = zoned.join(ZoneMap.survivors(st, lit(45L), lit(101L))
        .select("zone"), Seq("zone"), "left_semi")
      .filter(col("v") >= 45L && col("v") < 101L).count()
    assert(pruned === direct)
  }
}
