package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted prefix index for O(delta) incremental n-gram Jaccard dedup —
  * the daily-ingest path of the dedup family (BASELINE.json north star;
  * reference analog: the stores upsert new vectors without reindexing the
  * collection, `load_skill_vectors_pinecone.py:36-49`).
  *
  * [[Dedup.jaccardJoinIncremental]] already joins only the DELTA's prefixes
  * — but it recomputes document frequencies and the df-ordered prefix index
  * over corpus ∪ delta on every call: O(corpus) per ingest batch, which at
  * 100 TB dwarfs the candidate join it feeds. This operator splits that into
  *
  *  1. '''[[build]]''' (once, amortized like any clustered-index build):
  *     persist the corpus's df counts, df-ordered per-doc gram arrays, and
  *     prefix entries as BUCKETED tables ([[Bucketed.writeBucketed]]) keyed
  *     on the columns the incremental join probes (`__gh` for the candidate
  *     join, the doc id for verification) — so every per-batch join against
  *     the index reuses the stored HashPartitioning and never reshuffles the
  *     corpus side.
  *  2. '''[[incrementalJoin]]''' (per batch): shingle only the delta, order
  *     its grams by the STORED corpus df (unseen grams get df 0 = rarest),
  *     join delta prefixes against the stored prefix table, length-filter,
  *     and verify survivors exactly against the stored per-doc gram arrays.
  *     Every stage is O(|delta| × collision rate) — the corpus appears only
  *     through index probes.
  *
  * Correctness: prefix filtering is lossless for ANY total order applied
  * consistently to both docs of a pair (Bayardo WWW'07 §3 — the order only
  * decides WHICH common gram provably lands in both prefixes). Corpus docs
  * were prefixed under (corpus df, gh) at build time; delta docs are
  * prefixed under the same stored order, so every qualifying (new, existing)
  * pair shares a prefix gram, and the exact intersect-verify keeps only true
  * near-dups. Slightly stale df counts after further ingests shift
  * selectivity, never the verified answer.
  */
object JaccardIndex {

  /** Names of the three persisted tables of one index. */
  final case class IndexTables(docsets: String, prefix: String, dfc: String)

  /** Build + persist the prefix index over `corpus` as three bucketed
    * tables under `basePath`, tagged `tag`:
    *  - `graft_jidx_df_<tag>`(__gh, __df)            bucketed by __gh
    *  - `graft_jidx_prefix_<tag>`(id, __m, __gh)     bucketed by __gh
    *  - `graft_jidx_docsets_<tag>`(id, __g, __m)     bucketed by id
    *
    * DESIGNEDLY rebuild-only (unlike the span/PQ/LSH indexes, which have
    * O(delta) write paths): prefix filtering's losslessness depends on one
    * CONSISTENT global df order across every stored prefix, and appended
    * deltas shift df — stored prefixes computed under the stale order
    * could then miss true pairs silently. The O(delta) INGEST story lives
    * on the probe side instead ([[incrementalJoin]] orders delta grams by
    * the STORED df, which is lossless for delta-vs-corpus pairs); rebuild
    * this index on the re-fit cadence, like a quantizer. */
  def build(corpus: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double, tag: String, basePath: String,
      numBuckets: Int): IndexTables = {
    require(minJaccard > 0 && minJaccard <= 1, s"minJaccard $minJaccard outside (0, 1]")
    val sh = Dedup.shingleHashes(corpus, idCol, textCol, n)
    val dfc = sh.groupBy(col("__gh")).agg(count(lit(1)).as("__df"))
    val ordered = sh.join(dfc, "__gh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__df"), col("__gh")))).as("__o"))
    val docSets = ordered.select(col(idCol),
      transform(col("__o"), s => s.getField("__gh")).as("__g"),
      size(col("__o")).as("__m"))
    val m = col("__m")
    val plen = (m - ceil(lit(minJaccard) * m) + 1).cast("int")
    val prefix = docSets.select(col(idCol), m,
      explode(slice(col("__g"), lit(1), plen)).as("__gh"))
    val t = IndexTables(s"graft_jidx_docsets_$tag", s"graft_jidx_prefix_$tag",
      s"graft_jidx_df_$tag")
    // a fresh build supersedes basePath's delete history — including a
    // stale sibling backup from a CRASHED earlier purge cycle
    Tombstones.clearForRebuild(corpus.sparkSession, basePath)
    Bucketed.writeBucketed(dfc, t.dfc, s"$basePath/df", "__gh", numBuckets)
    Bucketed.writeBucketed(prefix, t.prefix, s"$basePath/prefix", "__gh", numBuckets)
    Bucketed.writeBucketed(docSets, t.docsets, s"$basePath/docsets", idCol, numBuckets)
    t
  }

  /** Near-dups of `delta` against the indexed corpus: (a_id = delta doc,
    * b_id = indexed doc, shared, jaccard ≥ minJaccard). `n` and `minJaccard`
    * must match the values the index was built with.
    *
    * `excludeIds` is the delete face ([[Tombstones]] — a takedown's
    * shingle data persists in the index until [[purgeDeleted]], and until
    * then serving must not MATCH against it): tombstoned doc ids
    * anti-join the stored prefix table before the candidate join, so dead
    * docs generate no candidates and never reach verification. The
    * broadcast anti-join preserves the bucketed prefix scan's
    * HashPartitioning, so the candidate join still runs exchange-free on
    * the corpus side. Verified pairs equal an index built over the live
    * corpus exactly: prefix filtering is lossless under ANY consistent
    * order (the module contract), and stale df from dead docs shifts only
    * selectivity, never the verified answer. */
  def incrementalJoin(spark: SparkSession, tables: IndexTables,
      delta: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double, excludeIds: Option[DataFrame] = None): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, s"minJaccard $minJaccard outside (0, 1]")
    // Uncached: each ingest batch has a fresh plan, and the delta's shingle
    // stream is consumed once — a Caches entry per micro-batch would grow
    // the registry without bound in the streaming face.
    val shD = Dedup.shingleHashesUncached(delta, idCol, textCol, n)
    // Order the delta's grams by the STORED corpus df; grams the corpus has
    // never seen have df 0 — rarer than anything indexed, and consistently
    // so on every delta doc, which is all losslessness needs.
    val withDf = shD.join(spark.table(tables.dfc), Seq("__gh"), "left")
      .select(col(idCol), col("__gh"), coalesce(col("__df"), lit(0L)).as("__df"))
    val ordered = withDf.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("__df"), col("__gh")))).as("__o"))
    // localCheckpoint, not Caches: the delta's set frame feeds both the
    // prefix join and the verify join, but each ingest batch has a fresh
    // plan — a registry entry per micro-batch would grow without bound in
    // the streaming face, while checkpoint blocks free when the batch's
    // frames go out of scope.
    val docSetsD = ordered.select(col(idCol),
      transform(col("__o"), s => s.getField("__gh")).as("__g"),
      size(col("__o")).as("__m")).localCheckpoint()
    val m = col("__m")
    val plen = (m - ceil(lit(minJaccard) * m) + 1).cast("int")
    val prefixD = docSetsD.select(col(idCol), m,
      explode(slice(col("__g"), lit(1), plen)).as("__gh"))
    val stored0 = spark.table(tables.prefix)
    val storedId = stored0.columns.head // (id, __m, __gh)
    val stored = excludeIds.map(Tombstones.excludeIds(stored0, col(storedId), _))
      .getOrElse(stored0)
    val cands = prefixD
      .select(col(idCol).as("a_id"), col("__m").as("__ma"), col("__gh"))
      .join(stored.select(col(storedId).as("b_id"), col("__m").as("__mb"),
        col("__gh")), "__gh")
      .filter(least(col("__ma"), col("__mb")) >=
        ceil(lit(minJaccard) * greatest(col("__ma"), col("__mb"))))
      .select("a_id", "b_id") // dedup AFTER verify — see Dedup.verifyByIntersect
    Dedup.verifyByIntersect2(docSetsD, spark.table(tables.docsets), cands,
      minJaccard)
  }

  /** Physical purge of tombstoned docs ([[Tombstones]] stamped at the
    * index's `basePath`): rewrite the per-doc gram sets and prefix entries
    * minus the dead ids through their bucketed layouts and clear the
    * markers — the dedup index's [[IvfIndex.compact]]. The df table stays:
    * dead docs' gram counts go stale exactly like any post-build corpus
    * shift, which the module contract already allows (selectivity only,
    * never the verified answer); the rebuild cadence refreshes it. Until
    * this runs, serving passes the tombstones to [[incrementalJoin]]'s
    * `excludeIds` — markers now, purge at compaction. */
  def purgeDeleted(spark: SparkSession, tables: IndexTables,
      basePath: String, numBuckets: Int): Unit =
    // fence at basePath (where this index's takedowns are stamped): a
    // Tombstones.add racing the purge raises instead of being cleared
    // below while its doc's entries survive the rewrites. The inner
    // compactTable calls fence their own TABLE locations — different
    // sibling files, no nesting on one fence.
    Tombstones.fencedRewrite(spark, basePath) {
      Tombstones.read(spark, basePath).foreach { t0 =>
        val t = t0.localCheckpoint()
        def anti(df: DataFrame) =
          Tombstones.excludeIds(df, df(df.columns.head), t)
        Bucketed.compactTable(spark, tables.prefix, Seq("__gh"), numBuckets)(anti)
        val docsetsKey = spark.table(tables.docsets).columns.head
        Bucketed.compactTable(spark, tables.docsets, Seq(docsetsKey),
          numBuckets)(anti)
        Tombstones.clear(spark, basePath)
      }
    }

  /** Streaming face of [[incrementalJoin]] — the deployed shape of daily
    * ingest: each micro-batch of arriving documents probes the persisted
    * index through the identical batch transform (foreachBatch is the
    * standard bridge for stream stages that need batch-only operators like
    * bucketed-table joins), and `sink` receives that batch's verified
    * near-dup pairs. Per-batch work stays O(|batch| × collision rate);
    * nothing re-reads the corpus. Pairs are (new doc, indexed doc), so
    * batches are independent and the union of per-batch outputs equals the
    * one-shot batch join over the same documents (asserted in DedupSpec). */
  def incrementalJoinStream(spark: SparkSession, tables: IndexTables,
      deltaStream: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    deltaStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(incrementalJoin(spark, tables, batch, idCol, textCol, n, minJaccard),
          batchId)
      }
      .outputMode("append")
      .start()
}
