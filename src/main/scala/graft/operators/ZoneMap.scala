package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Zone maps (min/max data skipping — the Netezza "zone map" / Parquet
  * row-group stats / Delta-Iceberg file-pruning mechanism): per storage
  * zone, keep min/max of the filter column; a range scan reads only the
  * zones whose [zmin, zmax] envelope intersects the predicate.
  *
  * Skipping only pays when the layout CLUSTERS the filter column —
  * [[assignSortedZones]] simulates exactly that write ("table written
  * sorted by the key, `rowsPerZone` rows per file"; the production write
  * is `repartitionByRange(...).sortWithinPartitions(...)` with stats
  * collected by the writer). [[stats]] is the one-pass census the writer
  * would persist as the table's skipping index; it is ALSO how a reader
  * retrofits a zone map onto files it didn't write.
  *
  * The pinned query closes the loop: the match count computed through
  * the PRUNED scan must equal the oracle's direct full-table count — a
  * zone map that prunes a matching row is corrupt, and that is the
  * failure mode this row guards (stale stats after an append are the
  * classic cause; the fingerprint discipline of the stored-index family
  * applies to skipping indexes too).
  */
object ZoneMap {

  /** Simulated date-clustered layout: zone id = ordinal position DIV
    * `rowsPerZone` under a total order on (`key`, tieCols…). The global
    * row_number is a simulation seam for the pin, not the scale path —
    * see the scaladoc. */
  def assignSortedZones(df: DataFrame, rowsPerZone: Long,
      key: Column, tieCols: Column*): DataFrame = {
    require(rowsPerZone >= 1)
    val w = Window.orderBy(key +: tieCols: _*)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("zone", expr(s"(__rn - 1) DIV $rowsPerZone"))
      .drop("__rn")
  }

  /** Per-zone skipping stats over `statCol`: (zone, n_rows, zmin, zmax). */
  def stats(zoned: DataFrame, statCol: String): DataFrame =
    zoned.groupBy("zone").agg(count(lit(1)).as("n_rows"),
      min(col(statCol)).as("zmin"), max(col(statCol)).as("zmax"))

  /** Zones whose envelope intersects the half-open range [lo, hi). */
  def survivors(stats: DataFrame, lo: Column, hi: Column): DataFrame =
    stats.filter(col("zmax") >= lo && col("zmin") < hi)
}
