package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers the join
  * side at runtime; these cover the aggregation side and planned-ahead joins
  * where one key dominates (a hot `job_code`, a viral document, a null-heavy
  * foreign key) and a single reducer would absorb the whole key.
  *
  * Salting must stay deterministic to keep the engine's oracle discipline:
  * the salt is a hash of stable row attributes (pmod(xxhash64(...), buckets)),
  * never a random number — reruns produce identical partitioning, and
  * results are invariant because the second phase re-combines exactly the
  * rows the first phase split. */
object Salt {

  /** Two-phase skew-safe aggregation: groupBy (keys + salt) with partial
    * `sum`/`count` style aggs, then re-combine per key. Callers pass the
    * first-phase aggregate columns and the matching second-phase combiners,
    * both keyed by output column name.
    *
    * Example — skew-safe sum + count:
    * {{{
    * saltedAgg(df, Seq("k"), saltFrom = Seq(col("id")), buckets = 16,
    *   firstPhase = Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   secondPhase = Seq(sum("s").as("s"), sum("n").as("n")))
    * }}} */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFrom: Seq[Column],
      buckets: Int, firstPhase: Seq[Column], secondPhase: Seq[Column]): DataFrame = {
    require(buckets > 0, s"salt buckets must be positive, got $buckets")
    val salted = df.withColumn("__salt", pmod(xxhash64(saltFrom: _*), lit(buckets.toLong)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(firstPhase.head, firstPhase.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(secondPhase.head, secondPhase.tail: _*)
  }

  /** Skew-safe broadcast-free equi-join: replicate the (small) right side
    * once per salt bucket and join on (key, salt), spreading each hot key
    * over `buckets` reducers. Right side grows ×buckets — keep it small.
    *
    * The right side carries a SHUFFLE_HASH hint: this operator exists
    * precisely for dims too large to broadcast (else you'd broadcast and
    * skew would be moot), and without the hint a small test fixture gets
    * broadcast-planned, hiding the salted-shuffle shape the operator is
    * for — the join must hash-partition BOTH sides on (key, salt). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFrom: Seq[Column], buckets: Int): DataFrame = {
    require(buckets > 0, s"salt buckets must be positive, got $buckets")
    val l = left.withColumn("__salt", pmod(xxhash64(saltFrom: _*), lit(buckets.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    l.join(r.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  /** Fat-bucket guard for banded self-joins (LSH/SimHash/MinHash band joins):
    * drop every bucket holding more than `cap` rows before the bucket
    * equi-join. One skewed bucket — near-empty documents, a constant-ish
    * vector region, a viral key — otherwise turns the self-join quadratic on
    * a single reducer at scale (the reference's analogous guard is its
    * MAX_JOBS row cap, `skills_for_jobs.py:22,417-418`). Dropping a bucket
    * costs RECALL in that bucket only, never precision: every emitted pair is
    * still verified downstream. The window's partitioning is the same key the
    * join shuffles on, so the count piggybacks on the exchange the join needs
    * anyway. Callers mirror the cap in their SQL oracle with a QUALIFY over
    * the same keys wherever the oracle is structural. Audit what a cap would
    * drop with [[oversizedBuckets]]. */
  def capBuckets(buckets: DataFrame, keys: Seq[String], cap: Long): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val w = Window.partitionBy(keys.map(col): _*)
    buckets.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  /** The buckets [[capBuckets]] would drop at `cap`: (keys*, bucket_size),
    * for logging/auditing what recall a cap sacrifices. */
  def oversizedBuckets(buckets: DataFrame, keys: Seq[String], cap: Long): DataFrame =
    buckets.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > cap)
}
