package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session defaults shared by every entry point (Bench,
  * Verify, tools) — r16/r17 optimization rounds, guide §2.2/§2.5.
  *
  * The engine leans on two kinds of materialized frames: `.cache()`d
  * operator state ([[Caches]]) and per-hop/per-round `localCheckpoint`s.
  * With AQE's default `canChangeCachedPlanOutputPartitioning=false`, a
  * cached plan is materialized WITHOUT partition coalescing, so a
  * kilobyte-sized shared frame (an edge list, a BM25 postings table, a
  * walk's visited set) is pinned at `spark.sql.shuffle.partitions`
  * partitions — and every downstream scan pays one task per partition
  * forever. Measured on the graph-walk family at sf0.1×32 cores: 611 →
  * 114 tasks and 350 → 13 task-seconds for eval_graph_recall, wall
  * 41 s → 19 s, purely from letting AQE size cached plans.
  *
  * The knob is size-driven (AQE reads the actual shuffle statistics at
  * runtime), so it is the opposite of a local[32] tune: at 100 TB large
  * cached frames keep `advisoryPartitionSizeInBytes` chunks and only the
  * genuinely tiny ones collapse.
  *
  * r17 note: r16 additionally shipped
  * `coalescePartitions.parallelismFirst=false`, which coalesces post-
  * shuffle partitions by BYTES alone. That serialized this engine's
  * compute-dense/tiny-byte stages (PQ ADC scans, OPQ rotation fits, MMR
  * per-round scoring) onto ONE partition — the r16 driver measured
  * pq_refine_topk/knn_mmr_lambda1/pq_opq_recall at ~32× their r15 times,
  * i.e. full serialization. The stock default (`parallelismFirst=true`,
  * never coalescing below defaultParallelism) is the correct posture for
  * CPU-dense stages at any scale, so the knob is REMOVED.
  *
  * r17 note 2: lowering `coalescePartitions.minPartitionSize` globally
  * (1m → 64k) was A/B-measured and REJECTED: it spreads the jaccard
  * family's MB-scale compute stages nicely (pairs 6.0 → 2.7 s) but
  * un-coalesces the per-hop/per-round KB-scale cached frames the first
  * knob exists to shrink — the graph family lost every r16 gain
  * (6-query board 31.9 → 52.2 s). Compute-dense small-byte stages get
  * explicit `repartition` at the operator instead (the PageRank edge-
  * build pattern), which states intent where the byte heuristic can't
  * see it.
  *
  * Overridable per-run via `SPARK_GRAFT_TUNE=off` (diagnostic escape
  * hatch: compare plans with stock defaults).
  */
object Tuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    if (sys.env.get("SPARK_GRAFT_TUNE").contains("off")) b
    else b
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "1m"))
}
