package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CleanQueries, DedupQueries, EvalQueries, IndexQueries, IoQueries, JoinQueries, MediaQueries, PipelineQueries, RelationalQueries, SampleQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-domain modules under `graft.queries`;
  * every entry with a DuckDB-expressible equivalent also appears in
  * [[oracleSql]] under the same key with identical output column names.
  */
object SparkEntry {

  /** The contributing modules — package-visible so SparkEntrySpec's
    * cross-module duplicate-name guard iterates THIS list instead of its
    * own copy (a module added here but not there would silently escape
    * the guard). */
  private[graft] val modules: Seq[QueryModule] = Seq(
    VectorQueries, RelationalQueries, EvalQueries, TextQueries, DedupQueries,
    IndexQueries, MediaQueries, JoinQueries, SampleQueries, CleanQueries,
    IoQueries, PipelineQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.defs("knn_cosine_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** A bundle of named queries plus their DuckDB oracle SQL. */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
