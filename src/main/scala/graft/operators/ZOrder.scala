package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout: bit-interleave two key columns so one sorted
  * write gives range locality on BOTH dimensions — the multi-column
  * data-skipping layout (Morton 1966; the technique behind Delta/Iceberg
  * Z-ORDER clustering). A table laid out on z(user, time) serves
  * "one user's history" and "everyone in one hour" from a small file subset
  * each, where a plain sort on either key serves only its own dimension;
  * parquet row-group min/max stats on the z-value do the skipping.
  *
  * Pure Catalyst expressions end to end: the interleave is integer shifts
  * inside whole-stage codegen, the layout write is repartitionByRange +
  * sortWithinPartitions — both scale-out shapes (one range shuffle, no
  * driver involvement beyond range-boundary sampling).
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Callers bound the inputs (e.g. `pmod`) to fit `bits`. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc
        + call_function("shiftleft", shiftright(a.cast("long"), i) % 2, i * 2)
        + call_function("shiftleft", shiftright(b.cast("long"), i) % 2, i * 2 + 1))
  }

  /** shiftright with a Column amount (functions.shiftright takes only a
    * literal Int). */
  private def shiftright(x: Column, i: Column): Column =
    call_function("shiftright", x, i)

  /** Lay `df` out z-ordered on (aCol, bCol): one range shuffle on the
    * z-value into `nFiles` write tasks, each sorted, so every output file
    * covers a disjoint z-range (ZOrderSpec asserts the disjointness).
    * Returns the z-valued frame for inspection. */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, bits: Int,
      path: String, nFiles: Int): DataFrame = {
    val z = df.withColumn("zval", zValue(col(aCol), col(bCol), bits))
    z.repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)
    z
  }
}
