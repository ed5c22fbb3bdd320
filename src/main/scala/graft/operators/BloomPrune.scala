package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftExpressionBridge.{column => toColumn, expression => toExpr}
import graft.functions.expr.BloomMightContain

/** Bloom-filter semi-join reduction: cut a huge fact side down to rows whose
  * key MIGHT appear in a (much smaller) key set, before the shuffle the
  * exact join needs.
  *
  * At 100 TB the exact join's shuffle is priced per fact row; when the
  * build side is selective (a filtered dimension, an ingest delta, a
  * benchmark key set) most fact rows can be proven non-matching from a
  * few-hundred-KB sketch and never enter the exchange. That is exactly what
  * Spark's InjectRuntimeFilter does for plain shuffle equi-joins it can see;
  * this operator is the engine's explicit handle for the same trick where
  * the optimizer can't apply it (custom operators, pre-aggregated inputs,
  * reuse of one sketch across several scans).
  *
  * Precision discipline: the bloom admits false positives at `fpp`, so
  * callers MUST still run the exact join on the survivors (all `join_bloom_*`
  * queries do) — results are then identical to the un-pruned plan, which is
  * what the DuckDB oracle pins. False negatives are impossible, so pruning
  * never loses a match.
  */
object BloomPrune {

  /** Serialized bloom filter over `keys.keyCol` (driver-side sketch built by
    * one distributed aggregate — the same build shape Spark's runtime
    * filters use, ~100 KB–1 MB for typical n/fpp). */
  def buildFilterBytes(keys: DataFrame, keyCol: String, fpp: Double): Array[Byte] = {
    // The probe side hashes with mightContainLong; a string keys column
    // would be inserted via putBinary — a DISJOINT hash space, silently
    // pruning every true match. Fail fast instead.
    keys.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"BloomPrune: keys column '$keyCol' must be integral to match the " +
          s"long-hash probe, got ${other.simpleString}")
    }
    // stat.bloomFilter sizes the bit array from expectedNumItems: overshoot
    // (distinct ≤ count) only lowers the realized fpp, never recall.
    val n = math.max(1000L, keys.count())
    val bf = keys.stat.bloomFilter(keyCol, n, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** The probe column for a pre-built filter: true ⟺ key might be a member. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    toColumn(BloomMightContain(toExpr(key),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(filterBytes)))

  /** `fact` reduced to rows whose `factKeyCol` might appear in
    * `keys.keyCol`. Null keys never match a bloom of non-null keys and are
    * dropped — the same rows an inner equi-join would drop anyway. */
  def semiReduce(fact: DataFrame, factKeyCol: String,
      keys: DataFrame, keyCol: String, fpp: Double = 0.03): DataFrame = {
    val bytes = buildFilterBytes(keys, keyCol, fpp)
    fact.filter(coalesce(mightContain(col(factKeyCol), bytes), lit(false)))
  }
}
