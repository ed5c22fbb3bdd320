package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-side control-plane operators: the scheduling step between a
  * ranked frontier (outlink extraction → canonicalization → dedup →
  * allow/deny filtering → authority ranking, all existing stages) and
  * the fetcher fleet.
  *
  * Politeness is the binding constraint of a real crawler: a host serves
  * one request per delay window no matter how many of its URLs rank
  * highly, so the schedule is not a global priority order — it is a
  * per-host sequence plus a global WAVE structure (wave `s` fetches
  * every host's `s`-th URL concurrently). That shape is exactly one
  * keyed window per host; a global ordering (a single-partition
  * row_number over the frontier) is never materialized — at 100 TB the
  * frontier is billions of URLs and the (slot, host) pair IS the fetch
  * order, totally ordered lexicographically without ever sorting
  * globally. */
object Crawl {

  /** Assign politeness slots over `frontier`: within each host, URLs
    * rank by (`priCol` DESC, `urlCol` ASC — deterministic ties) into
    * consecutive slots 0..; rows at or past `cap` are dropped (the
    * per-host crawl-budget rule, the scheduler-side twin of
    * `clean_domain_cap`); `fetch_after_ms` = slot × `slotMillis` stamps
    * each URL's earliest fetch offset under the host's delay window.
    * One keyed shuffle on the host — no global sort, no driver state. */
  def schedule(frontier: DataFrame, hostCol: String, urlCol: String,
      priCol: String, cap: Int, slotMillis: Long): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(slotMillis >= 0, s"slotMillis must be non-negative, got $slotMillis")
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(priCol).desc, col(urlCol))
    frontier
      .withColumn("slot", (row_number().over(w) - 1).cast("long"))
      .filter(col("slot") < cap)
      .withColumn("fetch_after_ms", col("slot") * lit(slotMillis))
  }

  /** The registrable-host key of a canonical http(s) URL — the
    * politeness unit (scheme and port stripped, lowercase; canonical
    * URLs from the outlink stage are already lowercase-host). */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^https?://([^/:]+)", 1)

  /** The SURT (Sort-friendly URI Reordering Transform) key of a
    * canonical http(s) URL — `org,example)/path` — the key every
    * web-archive CDX index sorts and range-scans by: host labels
    * reversed and comma-joined so one host's (and one domain's) records
    * are CONTIGUOUS, which at archive scale turns per-host lookups into
    * range scans instead of full-index filters. Scheme dropped, path
    * kept verbatim (canonical URLs are already lowercase-host,
    * default-port- and fragment-stripped). */
  def surtKey(url: Column): Column = {
    val host = hostOf(url)
    val path = coalesce(
      nullif(regexp_extract(url, "^https?://[^/]+(/.*)$", 1), lit("")),
      lit("/"))
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), path)
  }
}
