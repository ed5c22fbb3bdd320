package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketed

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-located join + aggregation over bucketed tables plans with zero Exchange") {
    val left = (1 to 200).map(i => (i.toLong, s"p${i % 5}")).toDF("k", "attr")
    val right = (1 to 1000).map(i => (i % 200 + 1L, i * 1.5)).toDF("k", "v")
    val base = s"/tmp/graft_bucketed_spec_${System.getProperty("user.name")}"
    Bucketed.writeBucketed(left, "graft_spec_left", s"$base/left", "k", 4)
    Bucketed.writeBucketed(right, "graft_spec_right", s"$base/right", "k", 4)
    // disable broadcast so an exchange-free plan can only come from the layout
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketed.coLocatedJoin(spark, "graft_spec_left", "graft_spec_right", "k")
        .groupBy("k", "attr").agg(sum("v").as("sv"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg should reuse the stored partitioning:\n$plan")
      // result parity with the plain (exchange-full) join
      val want = left.join(right, "k").groupBy("k", "attr").agg(sum("v").as("sv"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet == want)
    }
    spark.sql("DROP TABLE IF EXISTS graft_spec_left")
    spark.sql("DROP TABLE IF EXISTS graft_spec_right")
  }
}
