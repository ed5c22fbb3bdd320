package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and enforcement (RFC 9309) — the missing first
  * half of the frontier's allow/deny stage: `clean_url_filter` applies a
  * LITERAL rule table, but a real crawler derives that table per host by
  * fetching and parsing `/robots.txt`. Everything here is relational —
  * line explosion, window-composed group assignment, a broadcastable
  * rule table, LIKE-translated longest-match arbitration — so the whole
  * path (parse → select group → match → arbitrate) replays in the
  * DuckDB oracle and scales as one keyed window plus one broadcast join.
  *
  * Semantics implemented (the RFC 9309 core):
  *  - lines are `Directive: value`, `#` comments stripped, unknown
  *    directives (Crawl-delay, Sitemap, …) ignored;
  *  - consecutive `User-agent` lines open ONE group sharing the rules
  *    that follow; a `User-agent` after rules starts a NEW group; rules
  *    before any group are ignored;
  *  - a crawler uses the groups naming ITS agent when any exist for the
  *    host, else the `*` groups;
  *  - patterns match the URL PATH from its start, `*` is a wildcard,
  *    a trailing `$` anchors the end; empty patterns match nothing;
  *  - the longest matching pattern decides (specificity = pattern
  *    octets); ties and no-match default to ALLOW.
  */
object Robots {

  /** Parse robots.txt documents — one row per (host, text) — into the
    * per-host rule table: (host, agent, pattern, allow, spec). One keyed
    * window per host; rule volume is tiny relative to any frontier. */
  def parseRules(df: DataFrame, hostCol: String, txtCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("__pos", "__raw")))
      .select(col("host"), col("__pos"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__l"))
      .filter(col("__l") =!= "")
      .select(col("host"), col("__pos"),
        lower(regexp_extract(col("__l"), "^([A-Za-z-]+)\\s*:", 1)).as("__d"),
        trim(regexp_extract(col("__l"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1))
          .as("__v"))
      .filter(col("__d").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("__pos"))
    val grouped = lines
      .withColumn("__ua", col("__d") === "user-agent")
      // a UA line NOT directly preceded by another UA line opens a group
      .withColumn("__new",
        (col("__ua") && !coalesce(lag(col("__ua"), 1).over(w), lit(false)))
          .cast("long"))
      .withColumn("__g", sum(col("__new")).over(w))
    val agents = grouped.filter(col("__ua"))
      .select(col("host"), col("__g"), lower(col("__v")).as("agent"))
    // empty patterns match nothing (RFC: a bare `Disallow:` is no
    // restriction) — dropped; rules before any UA group drop via the
    // inner join (their __g has no agents)
    val rules = grouped.filter(!col("__ua") && col("__v") =!= "")
      .select(col("host"), col("__g"), col("__d"), col("__v"))
    rules.join(agents, Seq("host", "__g"))
      .select(col("host"), col("agent"), col("__v").as("pattern"),
        (col("__d") === "allow").as("allow"),
        length(col("__v")).cast("long").as("spec"))
  }

  /** A robots pattern as an anchored SQL LIKE with escape `!`: `!`/`%`/
    * `_` escaped, `*` → `%`, a trailing `$` anchors (else a `%` tail).
    * `!` (not `\`) is the escape character ON PURPOSE: Spark SQL
    * processes backslash escapes inside string literals while DuckDB
    * does not, so any backslash-bearing SQL text would mean DIFFERENT
    * strings in the two engines — `!` reads identically in both, letting
    * this text be shared verbatim with the oracle emitter. */
  private[graft] def likePatternSql(p: String): String = {
    val esc = s"replace(replace(replace($p, '!', '!!'), '%', '!%'), " +
      "'_', '!_')"
    val body = s"replace($esc, '*', '%')"
    s"CASE WHEN right($p, 1) = '$$' THEN " +
      s"left($body, length($body) - 1) ELSE $body || '%' END"
  }

  /** URL path for robots matching (empty path reads as `/`). */
  private[graft] val pathSql: String =
    "coalesce(nullif(regexp_extract(__furl, '^[a-z]+://[^/]+(/.*)$', 1), ''), '/')"

  /** Apply parsed `rules` to `frontier` (keyed by (hostCol, urlCol)):
    * pick each host's group per the agent-selection rule, LIKE-match
    * patterns against the URL path, arbitrate by longest match
    * (ties/no-match allow). Returns the frontier's columns plus
    * `allowed`. The rule side broadcasts; the frontier is never
    * shuffled beyond the aggregation on its own key. */
  def filterFrontier(frontier: DataFrame, hostCol: String, urlCol: String,
      rules: DataFrame, agent: String): DataFrame = {
    val my = rules.filter(col("agent") === agent.toLowerCase(
      java.util.Locale.ROOT))
    val star = rules.filter(col("agent") === "*")
      .join(broadcast(my.select("host").distinct()), Seq("host"), "left_anti")
    val chosen = my.unionByName(star).drop("agent")
      .withColumnRenamed("host", "__rhost")
    val fcols = frontier.columns
    val joined = frontier
      .join(broadcast(chosen), col(hostCol) === col("__rhost"), "left")
      .withColumn("__furl", col(urlCol))
      .withColumn("__path", expr(pathSql))
      .withColumn("__likep", expr(likePatternSql("pattern")))
      .withColumn("__m",
        col("pattern").isNotNull && expr("__path LIKE __likep ESCAPE '!'"))
    joined.groupBy(fcols.map(col): _*)
      .agg((coalesce(max(when(col("__m") && col("allow"), col("spec"))),
        lit(-1L)) >=
        coalesce(max(when(col("__m") && !col("allow"), col("spec"))),
          lit(-1L))).as("allowed"))
  }
}
