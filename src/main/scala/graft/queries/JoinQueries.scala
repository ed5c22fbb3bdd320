package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.{AsofJoin, Bucketed}

/** Join-shape breadth beyond plain equi-joins (SURVEY.md §2.5 notes the
  * reference needs none of these — they are engine-completeness operators):
  * as-of join, key+range join, anti join, semi join, full outer join, and
  * exact interpolated percentiles. Every query has a DuckDB oracle.
  */
object JoinQueries extends graft.QueryModule {

  /** One-time orderkey-bucketed layout per (session, scale dir), memoized
    * via [[graft.Layouts]] so the DDL-ish write happens once per JVM —
    * `join_bucketed_build` runs it as a Bench "producer" so the measured
    * `join_bucketed_colocated` window times the co-located join, not the
    * layout build. */
  private object BucketedLayout {
    def ensure(s: SparkSession, dir: String): (String, String) =
      graft.Layouts.once(s, s"bucketed:$dir") {
        val tag = graft.Layouts.tag(dir)
        val base = s"/tmp/graft_bucketed/$tag"
        Bucketed.writeBucketed(Tables.orders(s, dir)
            .select("o_orderkey", "o_orderpriority"),
          s"graft_orders_b_$tag", s"$base/orders", "o_orderkey", 8)
        Bucketed.writeBucketed(Tables.lineitem(s, dir)
            .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice")),
          s"graft_lineitem_b_$tag", s"$base/lineitem", "o_orderkey", 8)
        (s"graft_orders_b_$tag", s"graft_lineitem_b_$tag")
      }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase matched to the user's latest prior click.
    "join_asof_purchase_click" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
      AsofJoin.latestPriorId(purchases, clicks, "user_id", "ts",
        "event_id", "event_id", "click_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
          col("click_id"))
    }),
    // Key + range join: same-customer orders within 30 days after an urgent order.
    "join_range_followup_orders" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as("urgent_key"),
          col("o_orderdate").as("udate"))
      val later = o.select(col("o_custkey").as("l_custkey"),
        col("o_orderkey").as("later_key"), col("o_orderdate").as("ldate"))
      urgent.join(later,
          col("custkey") === col("l_custkey") &&
          col("urgent_key") =!= col("later_key") &&
          col("ldate") >= col("udate") &&
          col("ldate") <= col("udate") + expr("INTERVAL 30 DAYS"))
        .groupBy("custkey", "urgent_key")
        .agg(count(lit(1)).as("n_followups"))
    }),
    // Anti join: parts not shipped during January 1995.
    "join_anti_unshipped_parts" -> ((s, dir) => {
      val liJan = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1995-02-01")))
        .select(col("l_partkey").as("p_partkey"))
      Tables.part(s, dir)
        .join(liJan, Seq("p_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    }),
    // Semi join: customers with at least one urgent order.
    "join_semi_urgent_customers" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      Tables.customer(s, dir)
        .join(urgent, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    }),
    // Bloom-pruned fact join: lineitem is semi-reduced by a ~KB bloom
    // sketch of the urgent orders' keys BEFORE the join shuffle — at scale
    // ~4/5 of the fact rows are proven non-matching from the sketch and
    // never enter the exchange. The exact join then removes the bloom's
    // false positives, so the oracle is simply the un-pruned join: a bloom
    // that dropped a real match (impossible) or a leak of FPs into the
    // output would both turn this row red.
    "join_bloom_pruned" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val pruned = graft.operators.BloomPrune.semiReduce(
        Tables.lineitem(s, dir), "l_orderkey", urgent, "o_orderkey")
      pruned.join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
            .as("revenue"))
    }),
    // Join-side skew mitigation, driver-gated: o_orderpriority has 5 values,
    // so a plain shuffle join lands the whole orders table on 5 reducers.
    // Salt.saltedJoin replicates the 5-row per-priority aggregate dim ×16
    // and joins on (priority, salt) — each hot key spreads over 16 buckets.
    // The salt is invisible to the answer (every left row still meets its
    // key's one dim row exactly once), so the oracle is the plain equi-join.
    // The above-mean predicate compares in exact decimal (price·n > total —
    // no division, no rounding), keeping the filter engine-exact.
    "join_skew_salted" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("decimal(18,4)").as("__price"))
      val dim = o.groupBy("o_orderpriority")
        .agg(sum(col("__price")).as("__ptot"), count(lit(1)).as("__pn"))
      graft.operators.Salt.saltedJoin(o, dim, "o_orderpriority",
          saltFrom = Seq(col("o_orderkey")), buckets = 16)
        .filter(col("__price") * col("__pn") > col("__ptot"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_above"),
          round(sum(col("__price")).cast("double"), 2).as("revenue_above"))
    }),
    // Full outer join: per-nation customer vs supplier counts, nulls → 0.
    "join_outer_nation_counts" -> ((s, dir) => {
      val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),
    // Layout build as its own gated query (the "CREATE CLUSTERED INDEX" of
    // the engine): writes the orderkey-bucketed tables once per JVM and
    // reports their row counts — which the oracle pins to the source tables,
    // so a build that drops or duplicates rows turns red here, before any
    // join reads the layout.
    "join_bucketed_build" -> ((s, dir) => {
      val (ot, lt) = BucketedLayout.ensure(s, dir)
      s.table(ot).select(lit("orders").as("tbl"))
        .groupBy("tbl").agg(count(lit(1)).as("n_rows"))
        .unionAll(s.table(lt).select(lit("lineitem").as("tbl"))
          .groupBy("tbl").agg(count(lit(1)).as("n_rows")))
    }),
    // Co-located join over bucketed tables: orders and lineitem are laid out
    // bucketBy(orderkey) at write time, so the join AND the per-order
    // aggregation both reuse the stored HashPartitioning — zero Exchange in
    // the plan (asserted in BucketedSpec). The write is the one-time cost a
    // 100 TB deployment amortizes over every downstream orderkey query
    // (memoized per JVM — see BucketedLayout); the oracle checks the RESULT
    // equals a plain join, which layout must never change.
    "join_bucketed_colocated" -> ((s, dir) => {
      val (ot, lt) = BucketedLayout.ensure(s, dir)
      Bucketed.coLocatedJoin(s, ot, lt, "o_orderkey")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double"), 2)
            .as("revenue"))
    }),
    // Quantile sketch gated against the exact rank median: the GK summary
    // (percentile_approx) is the one-pass bounded-memory quantile engine a
    // 100 TB scan runs; its worst-case rank-error guarantee (n/accuracy)
    // holds for ANY merge order, so the gate — the approx value's true
    // in-group rank within the guaranteed envelope of the target rank —
    // is deterministic even though the estimate itself may shift with
    // partitioning. Pinned surface: exact e4 lower-median + the gate.
    "agg_quantile_sketch" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_mktsegment"), col("c_custkey"),
          (col("c_acctbal").cast("decimal(18,4)") * 10000)
            .cast("long").as("__v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy(col("__v"), col("c_custkey"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment")
      val med = c.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(wn))
        .groupBy("c_mktsegment")
        .agg(max(col("__n")).as("n_rows"),
          min(when(col("__rn") === expr("(__n + 1) DIV 2"), col("__v")))
            .as("median_e4"),
          expr("percentile_approx(__v, 0.5D, 1000)").as("__apx"))
        .localCheckpoint() // med feeds two consumers: evaluate the scan +
                           // windows + sketch once, and pin ONE __apx
      // The returned element's RANK INTERVAL is [count(<)+1, count(<=)] —
      // with duplicated values the max-rank alone can exceed the envelope
      // on a healthy sketch (a tie run longer than the slack), so the gate
      // checks the INTERVAL intersects [target - eps, target + eps].
      val ranked = c
        .join(med.select(col("c_mktsegment"), col("__apx")), "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(sum(when(col("__v") < col("__apx"), lit(1L)).otherwise(lit(0L)))
            .as("__rlt"),
          sum(when(col("__v") <= col("__apx"), lit(1L)).otherwise(lit(0L)))
            .as("__rle"))
      med.join(ranked, "c_mktsegment")
        .select(col("c_mktsegment"), col("n_rows"), col("median_e4"),
          (col("__rlt") + 1 <= expr("(n_rows + 1) DIV 2") +
            expr("n_rows DIV 1000") + 2 &&
           col("__rle") >= expr("(n_rows + 1) DIV 2") -
            expr("n_rows DIV 1000") - 2).as("approx_ok"))
    }),
    // Exact interpolated percentiles per group (sort-based, deterministic).
    "agg_price_quantiles" -> ((s, dir) => {
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          round(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
          round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
          round(expr("percentile(c_acctbal, 0.75)"), 4).as("p75"))
    }))

  val oracles: Map[String, String] = Map(
    "join_asof_purchase_click" ->
      """SELECT p.user_id, p.event_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
        |  (SELECT c.event_id FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    "join_range_followup_orders" ->
      """SELECT u.o_custkey AS custkey, u.o_orderkey AS urgent_key,
        |  count(*) AS n_followups
        |FROM orders u JOIN orders l
        |  ON u.o_custkey = l.o_custkey
        | AND u.o_orderkey <> l.o_orderkey
        | AND l.o_orderdate >= u.o_orderdate
        | AND l.o_orderdate <= u.o_orderdate + INTERVAL 30 DAY
        |WHERE u.o_orderpriority = '1-URGENT'
        |GROUP BY 1, 2""".stripMargin,
    // The bloom prune is invisible to the answer (FPs are removed by the
    // exact join, FNs are impossible), so the oracle is the plain join.
    "join_bloom_pruned" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin,
    "join_anti_unshipped_parts" ->
      """SELECT p_partkey, p_name FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p.p_partkey
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-02-01')""".stripMargin,
    "join_semi_urgent_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,
    "join_skew_salted" ->
      """WITH d AS (SELECT o_orderpriority,
        |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS ptot, count(*) AS pn
        |  FROM orders GROUP BY 1)
        |SELECT o.o_orderpriority, count(*) AS n_above,
        |  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue_above
        |FROM orders o JOIN d USING (o_orderpriority)
        |WHERE CAST(o.o_totalprice AS DECIMAL(18,4)) * d.pn > d.ptot
        |GROUP BY 1""".stripMargin,
    "join_outer_nation_counts" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |      FROM supplier GROUP BY 1) s
        |USING (nationkey)""".stripMargin,
    "join_bucketed_build" ->
      """SELECT 'orders' AS tbl, count(*) AS n_rows FROM orders
        |UNION ALL
        |SELECT 'lineitem' AS tbl, count(*) AS n_rows FROM lineitem""".stripMargin,
    "join_bucketed_colocated" ->
      """SELECT o.o_orderkey, o.o_orderpriority, count(*) AS n_items,
        |  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2""".stripMargin,
    "agg_price_quantiles" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25), 4) AS p25,
        |  round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5), 4) AS p50,
        |  round(quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75), 4) AS p75
        |FROM customer GROUP BY 1""".stripMargin,
    // The sketch is asserted in-plan (true rank of the estimate within the
    // GK guarantee envelope); pinned surface = exact lower-median + gate.
    "agg_quantile_sketch" ->
      """WITH v AS (SELECT c_mktsegment, c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ve4
        |  FROM customer),
        |r AS (SELECT c_mktsegment, ve4,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY ve4, c_custkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM v)
        |SELECT c_mktsegment, CAST(max(n) AS BIGINT) AS n_rows,
        |  CAST(min(CASE WHEN rn = (n + 1) // 2 THEN ve4 END) AS BIGINT) AS median_e4,
        |  TRUE AS approx_ok
        |FROM r GROUP BY 1""".stripMargin)
}
