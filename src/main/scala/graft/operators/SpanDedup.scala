package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact duplicate-SPAN removal (ExactSubstr — Lee et al., ACL 2022,
  * arXiv:2107.06499, "Deduplicating Training Data Makes Language Models
  * Better"): instead of deciding keep/drop per document, find every token
  * span of length ≥ k that occurs more than once ANYWHERE in the corpus
  * (across documents or repeated within one) and cut the spans themselves.
  * Whole-document dedup ([[Dedup]]) misses boilerplate headers, license
  * blocks, and templated paragraphs embedded in otherwise-unique documents
  * — span dedup is the published fix, run by most large pretraining
  * pipelines after near-dup removal.
  *
  * The reference engine has no span-level operator; this is the
  * training-data extension (cited to the public paper, not the reference).
  *
  * Method: hash every k-token window (the same 31-base rolling hash over
  * md5 token hashes as [[Dedup.shingleHashes]], but WITH positions and
  * WITHOUT per-doc distinct); a window hash occurring ≥ 2 times marks all
  * its occurrences; per document, overlapping/adjacent marked windows merge
  * into maximal spans (start positions within k of each other chain into
  * one island).
  *
  * Scale shape: the suffix-array the paper builds is replaced by two keyed
  * shuffles — occurrence counting keyed on the window hash, and the
  * mark-join keyed on the same hash — followed by a per-document window
  * (partitioned by doc id, so the sort is bounded by document length, never
  * corpus-wide). Nothing is quadratic in corpus size: every stage is
  * O(total tokens) rows through hash-keyed exchanges, exactly how this
  * shape survives 100 TB. The duplicated-hash set is emitted as a
  * semi-join side small enough to broadcast when duplication is sparse.
  *
  * Determinism: counts, positions, and span bounds are exact integers;
  * cleaned text is the kept token stream (lowercased, single-spaced —
  * the operator works on the token stream, as the paper does) — every
  * output is hash-stable with no float anywhere. */
object SpanDedup {

  /** Every k-gram window with its 1-based start position: (idCol, __pos,
    * __gh). Non-distinct — repeated windows inside one document are the
    * point. Same rolling hash as [[Dedup.shingleHashes]] so the DuckDB
    * mirror shares [[graft.queries.DocSql]] constants. */
  def gramPositions(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    gramPositionsOf(Dedup.tokenHashes(df, idCol, textCol), idCol, k)

  /** [[gramPositions]] over a delta WITHOUT registering the token-hash
    * frame in [[graft.Caches]]: each ingest micro-batch is a distinct plan,
    * and a registry entry per batch would grow driver state and pinned
    * executor storage without bound over a long-running stream (see
    * [[Dedup.shingleHashesUncached]]). */
  def gramPositionsUncached(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    gramPositionsOf(Dedup.tokenHashesUncached(df, idCol, textCol), idCol, k)

  private def gramPositionsOf(withHt: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"SpanDedup: window width k=$k must be >= 2")
    val ht = col("__ht")
    val entries = when(size(ht) >= k,
      transform(sequence(lit(1), size(ht) - (k - 1)),
        i => struct(i.cast("long").as("p"),
          (0 until k).map(o => element_at(ht, i + o))
            .foldLeft(lit(0L): Column)((acc, h) => (acc * 31L + h) % Dedup.ShingleP)
            .as("g"))))
      .otherwise(array().cast("array<struct<p:long,g:long>>"))
    withHt.select(col(idCol), explode(entries).as("__e"))
      .select(col(idCol), col("__e.p").as("__pos"), col("__e.g").as("__gh"))
  }

  /** Maximal duplicated spans per document: (idCol, span_start, span_end),
    * token positions 1-based inclusive. A window is duplicated when its
    * hash occurs ≥ `minCount` times corpus-wide; marked start positions
    * within k of each other merge (their k-token windows overlap or touch),
    * so each output row is one maximal region of duplicated text. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
      minCount: Long = 2L): DataFrame = {
    val pos = gramPositions(df, idCol, textCol, k)
    val dup = pos.groupBy(col("__gh")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount).select("__gh")
    mergeIslands(pos.join(dup, Seq("__gh")).select(col(idCol), col("__pos")),
      idCol, k)
  }

  /** Islands-and-gaps merge of marked start positions into maximal spans.
    * The running sum of break flags is a per-doc window — sorts are
    * bounded by doc length, never corpus-wide. */
  private def mergeIslands(dpos: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    dpos
      .withColumn("__prev", lag(col("__pos"), 1).over(w))
      .withColumn("__brk",
        (col("__prev").isNull || col("__pos") - col("__prev") > k).cast("int"))
      .withColumn("__island", sum(col("__brk")).over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).as("span_start"),
        (max(col("__pos")) + lit(k - 1).cast("long")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  // ---- Persisted index + O(delta) ingest ----------------------------------

  /** Name of the one persisted table of a span index. */
  final case class IndexTable(counts: String)

  /** Build + persist the corpus window-hash counts as ONE bucketed table
    * `graft_spanidx_<tag>`(__gh, __c), bucketed on `__gh` — the column
    * every per-batch probe joins on, so ingest joins reuse the stored
    * HashPartitioning and never reshuffle the corpus side. The index is
    * counts only (no positions): marking a delta window needs just
    * "does the corpus contain this hash", |index| = distinct window
    * hashes, far below the positional stream it summarizes. */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String, k: Int,
      tag: String, basePath: String, numBuckets: Int): IndexTable = {
    val counts = gramPositions(corpus, idCol, textCol, k)
      .groupBy(col("__gh")).agg(count(lit(1)).as("__c"))
    val t = IndexTable(s"graft_spanidx_$tag")
    Bucketed.writeBucketed(counts, t.counts, s"$basePath/counts", "__gh",
      numBuckets)
    graft.Layouts.stampFingerprint(corpus.sparkSession, t.counts, s"span|$k")
    t
  }

  /** O(delta) ingest for the stored count index (the daily-crawl path,
    * completing the maintenance story [[buildIndex]] starts): hash ONLY
    * the delta's windows, count them per hash, and append the rows into
    * the bucketed counts table — the base corpus is never re-read. The
    * table then holds SPLIT counts (one row per (hash, ingest batch)),
    * which is semantics-preserving by construction: [[incrementalSpans]]
    * probes existence (`left_semi`, corpus count ≥ 1), and existence is
    * invariant under splitting a count into positive parts; the recount
    * invariants `count(DISTINCT __gh)` and `sum(__c)` equal the
    * from-scratch rebuild exactly (gated by `dedup_span_index_append`).
    * Appends go through the same bucket spec, so probe joins keep the
    * stored HashPartitioning; periodic compaction = re-running
    * [[buildIndex]] over the union. */
  def appendToIndex(table: IndexTable, delta: DataFrame, idCol: String,
      textCol: String, k: Int, numBuckets: Int): Unit = {
    // Window width is the index's identity: delta windows hashed at a
    // different k would poison the counts silently — the build stamps it,
    // the append requires a match.
    graft.Layouts.checkFingerprint(delta.sparkSession, table.counts,
      s"span|$k", "SpanDedup.appendToIndex")
    Bucketed.appendBucketedKeys(
      gramPositionsUncached(delta, idCol, textCol, k)
        .groupBy(col("__gh")).agg(count(lit(1)).as("__c")),
      table.counts, Seq("__gh"), numBuckets)
  }

  /** Compact an appended count index back to one row per hash: re-aggregate
    * the split counts and rewrite the bucketed layout (K3
    * truncate-then-load applied to index maintenance). Bounds the file and
    * row growth a long append history accumulates — each append adds a file
    * per bucket and a row per (hash, batch) — while changing nothing a
    * probe sees: existence and the recount invariants are preserved by
    * construction (`dedup_span_index_compact` pins both plus the
    * one-row-per-hash property). The rewrite reads only the index (≪ the
    * corpus), never the documents. */
  def compactIndex(spark: SparkSession, table: IndexTable,
      numBuckets: Int): Unit =
    Bucketed.compactTable(spark, table.counts, Seq("__gh"), numBuckets)(
      _.groupBy(col("__gh")).agg(sum(col("__c")).as("__c"))
        // hashes whose net count fell to zero ([[deleteFromIndex]]
        // decrements) are dead — the compact IS their physical purge
        .filter(col("__c") > 0L))

  /** Delete documents from the count index by EXACT DECREMENT — the
    * count-store's delete mechanic (the tombstone anti-join of the row
    * stores has nothing to anti-join here: counts are aggregated, a doc's
    * contribution is not a row but an addend). Re-hash ONLY the deleted
    * docs' windows and append their counts NEGATED; probes read net
    * presence (sum > 0 — [[incrementalSpans]]), so a hash whose every
    * occurrence was deleted stops matching immediately, and
    * [[compactIndex]] physically purges net-zero rows. O(|deleted docs|)
    * per takedown, the base corpus never re-read — the same O(delta)
    * contract as [[appendToIndex]], which this is the exact inverse of
    * (delete ∘ append ≡ id, spec-pinned). The caller passes the documents
    * being taken down (a takedown request carries them by definition);
    * decrementing docs never indexed leaves net-negative rows, which
    * presence reads as absent and compact drops — harmless, but it means
    * "delete twice" is NOT idempotent here the way tombstones are:
    * decrement exactly once per indexed doc. */
  def deleteFromIndex(table: IndexTable, docs: DataFrame, idCol: String,
      textCol: String, k: Int, numBuckets: Int): Unit = {
    graft.Layouts.checkFingerprint(docs.sparkSession, table.counts,
      s"span|$k", "SpanDedup.deleteFromIndex")
    Bucketed.appendBucketedKeys(
      gramPositionsUncached(docs, idCol, textCol, k)
        .groupBy(col("__gh")).agg((-count(lit(1))).as("__c")),
      table.counts, Seq("__gh"), numBuckets)
  }

  /** Duplicated spans of DELTA documents against corpus ∪ delta, with the
    * corpus appearing ONLY through index probes: a delta window is
    * duplicated iff its hash is stored (corpus occurrence ≥ 1) or occurs
    * ≥ 2 times within the delta itself — exactly the set the full batch
    * run marks in these documents (corpus ≥ 1 ∨ delta ≥ 2 ⟺ total ≥ 2
    * for a position that itself counts once), so the one-shot oracle
    * restricted to the delta pins this path. Per-batch work is
    * O(|delta windows|): one semi-join against the bucketed index + one
    * keyed self-count. */
  def incrementalSpans(spark: SparkSession, table: IndexTable,
      delta: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // Uncached positional stream: the checkpoint below materializes it once
    // for the two probes, and its blocks free with the batch — unlike a
    // Caches entry, which a stream would accumulate per micro-batch.
    val pos = gramPositionsUncached(delta, idCol, textCol, k).localCheckpoint()
    // Presence = NET count > 0, not row existence: the stored counts are
    // split across ingest batches (positive parts — splitting preserves
    // existence) AND may carry [[deleteFromIndex]]'s negative decrements
    // (a hash whose occurrences were all deleted nets to ≤ 0 and must stop
    // matching). Semi-join the store to the DELTA's hashes FIRST, then net
    // only the matched groups (r12 advice): without the restriction every
    // probe batch paid a full-store aggregation — per-batch cost growing
    // with total distinct hashes instead of delta-matched hashes. The
    // semi-join preserves the store scan's bucketed HashPartitioning (left
    // side of a broadcast semi), so the aggregation still reuses it — no
    // exchange touches the index side.
    val present = spark.table(table.counts)
      .join(pos.select("__gh").distinct(), Seq("__gh"), "left_semi")
      .groupBy(col("__gh")).agg(sum(col("__c")).as("__net"))
      .filter(col("__net") > 0L).select("__gh")
    val inCorpus = pos.join(present, Seq("__gh"), "left_semi")
    val inDelta = pos.join(
      pos.groupBy(col("__gh")).agg(count(lit(1)).as("__c"))
        .filter(col("__c") >= 2L).select("__gh"), Seq("__gh"))
    mergeIslands(
      inCorpus.unionAll(inDelta).select(col(idCol), col("__pos")).distinct(),
      idCol, k)
  }

  /** Streaming face of [[incrementalSpanStats]] — span-dedup the crawl as
    * it arrives: each micro-batch probes the persisted count index through
    * the identical batch transform (the foreachBatch bridge every
    * index-probing stream face here uses — bucketed-table joins are
    * batch-only). Batches are independent (marks depend on the stored
    * corpus and the batch itself), so per-batch output equals the batch
    * operator on the same rows (asserted in SpanDedupSpec). */
  def incrementalSpanStream(spark: SparkSession, table: IndexTable,
      deltaStream: DataFrame, idCol: String, textCol: String, k: Int)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    deltaStream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(incrementalSpanStats(spark, table, batch, idCol, textCol, k), batchId)
      }
      .outputMode("append")
      .start()

  /** Per-delta-document span accounting over [[incrementalSpans]] — the
    * ingest-batch report: (idCol, n_tokens, n_spans, dup_tokens). */
  def incrementalSpanStats(spark: SparkSession, table: IndexTable,
      delta: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val st = incrementalSpans(spark, table, delta, idCol, textCol, k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    delta.select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .join(st, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Per-document span accounting — the report a pipeline reads to decide
    * how aggressive the cut is: (idCol, n_tokens, n_spans, dup_tokens),
    * all exact longs, one row per input document. */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    spanStatsFrom(duplicateSpans(df, idCol, textCol, k), df, idCol, textCol)

  /** [[spanStats]] over a precomputed [[duplicateSpans]] frame — callers
    * composing stats AND the cut (the selection pipeline) cache the span
    * frame once instead of re-running the whole mark pipeline twice. */
  def spanStatsFrom(spans: DataFrame, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val st = spans
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    df.select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .join(st, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** The cut itself: every duplicated span removed, remaining tokens
    * rejoined in order — (idCol, clean_text), one row per input document
    * (untouched documents keep their full token stream). Covered positions
    * are enumerated from the merged spans (bounded by total duplicated
    * tokens) and anti-joined on (id, position) — an equi-join, never a
    * range probe. */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    removeSpansFrom(duplicateSpans(df, idCol, textCol, k), df, idCol, textCol)

  /** [[removeSpans]] over a precomputed [[duplicateSpans]] frame (see
    * [[spanStatsFrom]]). */
  def removeSpansFrom(spans: DataFrame, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val covered = spans
      .select(col(idCol),
        explode(sequence(col("span_start"), col("span_end"))).as("__pos"))
    val toks = df
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__pos"), col("__tok"))
    val cleaned = toks.join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__tok")))).as("__a"))
      .select(col(idCol),
        concat_ws(" ", transform(col("__a"), e => e.getField("__tok"))).as("clean_text"))
    df.select(col(idCol)).join(cleaned, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
