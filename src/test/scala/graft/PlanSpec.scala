package graft

/** Plan-quality regression guards: the properties that make these queries
  * scale — predicate pushdown into the parquet scan, column pruning,
  * broadcast of small join sides, whole-stage codegen — asserted against
  * the physical plan so a refactor can't silently trade them away. Runs at
  * sf0.001 (plans don't depend on the scale factor).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(query: String): String = {
    // Execute first: AQE's pre-execution plan hides codegen markers and
    // runtime join selections; the final plan is the one that matters.
    val df = SparkEntry.queries(query)(spark, dir)
    df.collect() // count() would execute a DIFFERENT (re-optimized) plan
    df.queryExecution.executedPlan.toString
  }

  test("relational scans push filters and prune columns") {
    val plan = planOf("rel_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"shipdate filter should reach the lineitem scan:\n$plan")
    assert(!plan.contains("l_comment"),
      s"untouched columns must not be read (ReadSchema should prune l_comment):\n$plan")
  }

  test("k-NN join broadcasts the query side, never a shuffle of the corpus") {
    val plan = planOf("knn_cosine_topk")
    assert(plan.contains("Broadcast"), s"query side should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"flagship k-NN must not sort-merge the corpus:\n$plan")
  }

  test("text analysis is one narrow stage: no shuffle, no join") {
    // HOF expressions are interpreted (Spark doesn't codegen lambdas), so
    // the property that matters is the SHAPE: a single scan→project pass.
    val plan = planOf("text_stats")
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"per-doc text features must stay map-side:\n$plan")
  }

  test("aggregation pipeline runs inside whole-stage codegen") {
    // codegen'd operators print with the "*(n)" stage marker
    val plan = planOf("rel_pricing_summary")
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(1) Filter"),
      s"scan→filter→partial-agg should fuse into one codegen stage:\n$plan")
  }

  test("indexed incremental dedup probes the stored index; corpus never re-shingled") {
    val plan = planOf("dedup_jaccard_incremental_indexed")
    assert(plan.contains("graft_jidx_prefix_"),
      s"candidate join should probe the persisted prefix table:\n$plan")
    assert(plan.contains("graft_jidx_docsets_"),
      s"verification should read the persisted per-doc gram sets:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"index probes should use the bucketed layout:\n$plan")
    // O(delta) guarantee: every scan of the raw documents table is the DELTA
    // (doc_id % 10 = 0) — a corpus-side df recount or re-shingling would
    // show up as a documents scan without that filter.
    val unfiltered = plan.linesIterator
      .filter(_.contains("documents.parquet")).filterNot(_.contains("% 10"))
    assert(unfiltered.isEmpty,
      s"corpus-side documents scan leaked into the indexed plan:\n$plan")
  }

  test("chunking is one narrow stage; packing shuffles once, keyed on the group") {
    val chunk = planOf("text_chunk_windows")
    assert(!chunk.contains("Exchange") && !chunk.contains("Join"),
      s"chunk windows must stay map-side (scan→project→generate):\n$chunk")
    // AQE prints the pre-adaptive plan again under "== Initial Plan ==" —
    // count Exchanges in the final section only.
    val pack = planOf("text_pack_shards").split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(pack).size
    assert(exchanges == 1,
      s"shard packing should shuffle exactly once (on grp), found $exchanges:\n$pack")
    assert(!pack.contains("SinglePartition"),
      s"shard packing must never collapse to a global single-partition sort:\n$pack")
  }

  test("dimension joins broadcast the dimension side") {
    val plan = planOf("rel_region_revenue")
    assert(plan.contains("BroadcastHashJoin"),
      s"nation/region dims should broadcast:\n$plan")
  }
}
