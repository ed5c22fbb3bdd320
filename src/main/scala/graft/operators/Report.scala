package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked-result reporting (SURVEY.md §2.11 R1, §2.2 K2).
  *
  * Rebuilds the reference's per-job wide report — one row per job, one
  * (skill{i}, level{i}) column pair per retrieved rank
  * (`skills_for_jobs.py:188-213`) — as a single conditional aggregation.
  * The rank domain is fixed at k, so the column list is static: no dynamic
  * `pivot()` (which needs an extra pass to collect pivot values) and only
  * one shuffle.
  */
object Report {

  /** R1 — pivot a ranked result (one row per (query, rank)) to the wide
    * reference layout. `valueCols` maps source column → output prefix, e.g.
    * Seq("skill_id" -> "skill", "label" -> "level") yields columns
    * job, skill0, level0, …, skill{k-1}, level{k-1} (reference row-dict
    * insertion order, `skills_for_jobs.py:192-207`). Ranks are 1-based. */
  def pivotTopK(ranked: DataFrame, queryIdCol: String, rankCol: String,
      k: Int, valueCols: Seq[(String, String)]): DataFrame = {
    val aggs: Seq[Column] = for {
      i <- 0 until k
      (src, prefix) <- valueCols
    } yield max(when(col(rankCol) === (i + 1), col(src))).as(s"$prefix$i")
    ranked.groupBy(col(queryIdCol).as("job"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** K2 — CSV report sink (`skills_for_jobs.py:212-213`): single file with
    * header, matching the reference's one-CSV-per-backend output shape. */
  def writeCsvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
