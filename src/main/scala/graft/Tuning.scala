package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session defaults shared by every entry point (Bench,
  * Verify, tools) — r16 optimization round, guide §2.2/§2.5.
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
  * Both knobs are size-driven (AQE reads the actual shuffle statistics at
  * runtime), so they are the opposite of a local[32] tune: at 100 TB the
  * same settings leave large shuffles at `advisoryPartitionSizeInBytes`
  * chunks and only collapse the genuinely tiny ones.
  *
  *  - `canChangeCachedPlanOutputPartitioning=true`: apply AQE (incl.
  *    partition coalescing) when materializing cached plans.
  *  - `coalescePartitions.parallelismFirst=false`: coalesce toward
  *    `advisoryPartitionSizeInBytes` (64 MB default) instead of refusing
  *    to go below `defaultParallelism` — the guide's §2.2 recommendation
  *    ("partitions in the 100 MB–1 GB range, let AQE coalesce").
  *
  * Overridable per-run via `SPARK_GRAFT_TUNE=off` (diagnostic escape
  * hatch: compare plans with stock defaults).
  */
object Tuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    if (sys.env.get("SPARK_GRAFT_TUNE").contains("off")) b
    else b
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
}
