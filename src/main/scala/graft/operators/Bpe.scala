package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.,
  * ACL 2016) — the "train the tokenizer on the corpus" step of an LLM data
  * pipeline, re-expressed as keyed aggregations so it scales to a 100 TB
  * corpus the way real distributed BPE trainers do:
  *
  *  - ONE corpus scan builds the word-frequency table (distinct words ≪
  *    corpus tokens — the classic compression of the problem: every later
  *    round works on the vocabulary weighted by frequency, never the
  *    corpus again);
  *  - each merge round is one keyed aggregation over the vocabulary's
  *    adjacent symbol pairs plus a bounded argmax fetch (ONE row to the
  *    driver per round, like the IVF centroid fetch), then a narrow
  *    per-word `replace` projection applies the merge.
  *
  * Symbols are wrapped `\u001f sym \u001e` inside each word's
  * representation, so a merge is a plain left-to-right non-overlapping
  * string replace with exact greedy-BPE semantics: the wrappers anchor
  * both symbol boundaries (a pattern can never match a prefix or suffix
  * of a longer symbol), and because a replacement consumes its whole
  * wrapped pair, a run like `a a a` merges to `(aa) a` exactly as the
  * canonical greedy fold does. Both engines' `replace` (Spark's
  * UTF8String, DuckDB's) use the same leftmost-non-overlap scan, so the
  * oracle replays every round bit-for-bit; pre-tokenization keeps only
  * `[a-z]+` words of the `lang='en'` slice (per-language training,
  * standard alphabetic pre-tok), which also keeps the control-char
  * wrappers collision-free.
  *
  * Ties on pair count break lexicographically (count desc, pair asc) —
  * the determinism the fixed-point pins require.
  */
object Bpe {

  /** Symbol-wrapper delimiters (unit/record separator control chars —
    * excluded from `[a-z]+` pre-tokens by construction). */
  val L = "\u001f"
  val R = "\u001e"

  /** Wrapped-symbol representation of a word: each char c → `\u001f c
    * \u001e`, concatenated. */
  private def rep(word: Column): Column =
    regexp_replace(word, "(.)", s"$L$$1$R")

  /** Symbol array of a wrapped representation: strip the outer wrappers,
    * split on the inter-symbol `\u001e\u001f` seam. */
  private def symbolsOf(sym: Column): Column =
    split(sym.substr(lit(2), length(sym) - 2), s"$R$L")

  /** Adjacent-symbol pairs, space-separated (symbols are alphabetic, so
    * the space key is unambiguous); empty for single-symbol words. */
  private def pairsOf(sym: Column): Column = {
    val a = symbolsOf(sym)
    when(size(a) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(a) - 1),
        i => concat(element_at(a, i), lit(" "), element_at(a, i + 1))))
  }

  /** One learned merge applied to a wrapped representation. */
  private def applyMerge(sym: Column, lhs: String, rhs: String): Column =
    replace(sym, lit(s"$L$lhs$R$L$rhs$R"), lit(s"$L$lhs$rhs$R"))

  /** Lowercased `[a-z]+` word-frequency table of the `lang='en'` slice:
    * (w, freq). The ONE corpus-sized job in the trainer. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col("lang") === "en")
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Learn `k` merges: (step, lhs, rhs, merged, pair_count), step 1..k in
    * merge order. Each round: pair counts = one keyed agg over the
    * vocabulary; argmax = one-row driver fetch; apply = one `replace`
    * projection, `localCheckpoint`ed so lineage stays bounded. Stops
    * early if no adjacent pair remains. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var state = wordFreq(docs, textCol)
      .select(rep(col("w")).as("__sym"), col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var done = false
    for (step <- 1 to k if !done) {
      val best = state
        .select(explode(pairsOf(col("__sym"))).as("pair"), col("freq"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val Array(lhs, rhs) = best(0).getString(0).split(" ", 2)
        out += ((step, lhs, rhs, lhs + rhs, best(0).getLong(1)))
        state = state
          .select(applyMerge(col("__sym"), lhs, rhs).as("__sym"), col("freq"))
          .localCheckpoint()
      }
    }
    out.result().toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** Encode the corpus with a learned merge list: per doc, the `[a-z]+`
    * token count and the total symbol count after all merges — the
    * compression dial a tokenizer report shows. `merges` must be
    * [[learnMerges]] output (bounded: k rows, collected once); the merge
    * chain becomes a fixed nested-replace expression, so the encode pass
    * is one narrow corpus scan with no joins. */
  def encodeCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("step").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val enc = ms.foldLeft(rep(col("w"))) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }
    docs.filter(col("lang") === "en")
      .select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .select(col(idCol), size(symbolsOf(enc)).cast("long").as("__n"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("__n")).as("n_symbols"))
  }
}
