package graft

import org.apache.spark.sql.functions._

/** Pins the COLD breach-rerun adjudication (r12 verdict "next round" #1/#2):
  * the measured pass brackets each query with registry watermarks, and a
  * breached query's isolated rerun first drops exactly the [[Caches]]/
  * [[Layouts]] entries its own measured pass created — so the rerun replays
  * the cache state the measurement saw (own builds cold, inherited builds
  * warm) instead of a universally-warm session that measured ~0 s for
  * producers and lazily-memoized consumers. */
class BenchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Caches invalidation: the memo builder re-runs after invalidate, other entries survive") {
    var builds = 0
    val key = s"bench-spec-memo-${System.nanoTime()}"
    def build = { builds += 1
      spark.range(0, 10).select((col("id") * 3).as("x")) }

    // an entry created BEFORE the bracket must survive the invalidation
    val inherited = Caches.memo(spark, s"$key-inherited")(
      spark.range(0, 5).select(col("id")))
    inherited.count()

    val m = Caches.mark()
    Caches.memo(spark, key)(build).count()
    assert(builds == 1)
    Caches.memo(spark, key)(build).count()
    assert(builds == 1, "memo hit must not rebuild")
    val created = Caches.createdSince(m)
    assert(!created.isEmpty, "the bracket must capture the new entry")
    assert(Caches.hasMemo(spark, key))

    Caches.invalidate(created)
    assert(!Caches.hasMemo(spark, key), "invalidate must drop the bracket's entry")
    assert(Caches.hasMemo(spark, s"$key-inherited"),
      "invalidate must NOT touch entries created before the bracket")
    Caches.memo(spark, key)(build).count()
    assert(builds == 2, "post-invalidate memo must re-run the builder (cold)")
  }

  test("Layouts invalidation: once() re-runs after invalidate, other entries survive") {
    var builds = 0
    val key = s"bench-spec-layout-${System.nanoTime()}"
    Layouts.once(spark, s"$key-inherited") { "kept" }
    val m = Layouts.mark()
    Layouts.once(spark, key) { builds += 1; "v1" }
    Layouts.once(spark, key) { builds += 1; "v1" }
    assert(builds == 1)
    val created = Layouts.createdSince(m)
    assert(created.exists { case (s, k) => (s eq spark) && k == key })
    assert(!created.exists(_._2 == s"$key-inherited"),
      "the bracket must not capture pre-mark entries")
    Layouts.invalidate(created)
    assert(!Layouts.has(spark, key))
    assert(Layouts.has(spark, s"$key-inherited"))
    Layouts.once(spark, key) { builds += 1; "v2" }
    assert(builds == 2, "post-invalidate once must re-run the builder")
  }

  test("Layouts.once: same-key racers build once; independent keys overlap") {
    import java.util.concurrent._
    val key = s"bench-spec-gate-${System.nanoTime()}"
    val builds = new atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(4)
    try {
      // four same-key racers: exactly one build, all see its value
      val racers = (1 to 4).map { _ =>
        pool.submit(new Callable[String] {
          def call(): String = Layouts.once(spark, key) {
            Thread.sleep(50); builds.incrementAndGet(); "v"
          }
        })
      }
      assert(racers.map(_.get(30, TimeUnit.SECONDS)).distinct == Seq("v"))
      assert(builds.get() == 1, "same-key racers must share one build")
      // a DIFFERENT key's build must complete while this key's build is
      // still blocked — the r17 per-key gates (one global lock held
      // across build would deadlock `fast.get` here)
      val hold = new CountDownLatch(1)
      val started = new CountDownLatch(1)
      val slow = pool.submit(new Callable[String] {
        def call(): String = Layouts.once(spark, s"$key-slow") {
          started.countDown(); hold.await(); "slow"
        }
      })
      started.await(30, TimeUnit.SECONDS)
      val fast = pool.submit(new Callable[String] {
        def call(): String = Layouts.once(spark, s"$key-fast") { "fast" }
      })
      assert(fast.get(30, TimeUnit.SECONDS) == "fast",
        "an independent key must not wait on another key's build")
      hold.countDown()
      assert(slow.get(30, TimeUnit.SECONDS) == "slow")
    } finally pool.shutdownNow()
  }

  test("cold rerun of a DDL producer re-pays the build and leaves consumers correct") {
    // The producer path: lsh_index_build's bracket captures the
    // Layouts.once DDL entry; invalidation + rerun must re-run the
    // bucketed-table build (DROP-IF-EXISTS/overwrite — safe to repeat),
    // and the family's delete-aware consumer must still answer over the
    // rebuilt layout (the tombstone fixture re-stamps itself after the
    // rebuild's clearForRebuild wiped the side store).
    Caches.clear()
    val lshKey = s"lshidx:$dir" // IndexQueries.LshLayout's once-key
    Layouts.invalidate(Seq((spark, lshKey))) // order-independence vs other suites
    val lm = Layouts.mark()
    val cm = Caches.mark()
    assert(SparkEntry.queries("lsh_index_build")(spark, dir).count() > 0)
    assert(Layouts.has(spark, lshKey),
      "the measured run must have created the DDL entry")
    val created = Layouts.createdSince(lm)
    assert(created.exists { case (s, k) => (s eq spark) && k == lshKey })
    Layouts.invalidate(created)
    Caches.invalidate(Caches.createdSince(cm))
    assert(!Layouts.has(spark, lshKey), "the rerun must see a cold DDL memo")
    assert(SparkEntry.queries("lsh_index_build")(spark, dir).count() > 0)
    assert(Layouts.has(spark, lshKey), "the cold rerun must have rebuilt the layout")
    // consumers of the rebuilt layout still serve: the delete-aware face
    // re-stamps its tombstone fixture and excludes every deleted id
    val served = SparkEntry.queries("knn_deleted_lsh")(spark, dir)
    assert(served.count() > 0)
    import org.apache.spark.sql.functions.col
    assert(served.filter(col("skill_id") % 9 === 4).count() == 0,
      "deleted ids must stay excluded after the rebuild + re-stamp")
  }

  test("cold rerun rebuilds the lazily-memoized hier walk (r12 verdict #2's concrete case)") {
    // eval_graph_hier_recall builds the hier walk lazily on first touch
    // (Caches.memo "graphwalk_hier:<dir>"); under the old warm rerun its
    // adjudication could never re-measure that build. Replay the Bench
    // protocol: bracket the measured run, invalidate what it created,
    // assert the memo is demonstrably gone, rerun, assert it rebuilt.
    Caches.clear() // order-independence: other suites may have warmed the key
    val hierKey = s"graphwalk_hier:$dir" // VectorQueries.hierWalkCache's key
    val m = Caches.mark()
    val lm = Layouts.mark()
    assert(SparkEntry.queries("eval_graph_hier_recall")(spark, dir).count() > 0)
    assert(Caches.hasMemo(spark, hierKey),
      "the measured run must have created the hier-walk memo")
    val created = Caches.createdSince(m)
    Caches.invalidate(created)
    Layouts.invalidate(Layouts.createdSince(lm))
    Caches.sweepCheckpoints(spark.sparkContext)
    assert(!Caches.hasMemo(spark, hierKey),
      "invalidation must drop the hier-walk memo — the rerun is cold")
    assert(SparkEntry.queries("eval_graph_hier_recall")(spark, dir).count() > 0)
    assert(Caches.hasMemo(spark, hierKey),
      "the cold rerun must have rebuilt the hier walk")
  }
}
