package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-wide repeated-span removal — the boilerplate filter of a training
  * pipeline (C4 dropped lines repeated ≥3×, Raffel et al. 2020 §2.2; Lee et
  * al. 2022 do it at the substring level with suffix arrays): a span that
  * recurs across many documents (headers, footers, license blurbs,
  * templates) carries no training signal and skews n-gram statistics.
  *
  * Spans here are NON-OVERLAPPING `window`-token blocks (the corpus has no
  * line structure; fixed windows are the suffix-array-free approximation
  * that still catches template text): a span seen in ≥ `minDocs` distinct
  * docs is boilerplate and its block is cut; the token tail (< window
  * tokens) is always kept. Reassembly preserves block order.
  *
  * Scale shape: explode → one keyed distinct-count over span hashes → one
  * hash join back → one keyed reassembly shuffle. Nothing is quadratic and
  * the repeated-span table is tiny next to the corpus (it's the point of
  * the filter). All hashing is the portable md5 token hash, so removal
  * decisions AND the reassembled text replay exactly in the DuckDB oracle.
  */
object Boilerplate {

  /** Per-doc summary of repeated-span removal: (idCol, n_spans long,
    * n_removed long, cleaned_hash = md5 of the reassembled text, tokens
    * joined by single spaces). Every input row appears in the output —
    * docs too short for one window keep their (normalized) text whole. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int, minDocs: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(minDocs > 1, s"minDocs must exceed 1, got $minDocs")
    // base feeds the window stream AND the final reassembly join; wins
    // feeds both the repeated-set aggregate and the marking probe. Register
    // both with Caches so the corpus-wide tokenize/explode runs once per
    // plan instead of three times.
    val base = graft.Caches.cached(df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__nw", (size(col("__toks")) / window).cast("int")))
    // Filter BEFORE the explode: Spark's sequence(1, 0) is the DESCENDING
    // [1, 0] (step defaults to -1 when start > stop), which would hand
    // zero-window docs a phantom w=0 block whose (w-1)*window+1 = -3 start
    // slices from the END of the token array.
    val wins = graft.Caches.cached(base
      .filter(col("__nw") >= 1)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1), col("__nw"))).as("__w"))
      .select(col(idCol), col("__w"),
        array_join(slice(col("__toks"), (col("__w") - 1) * window + 1,
          lit(window)), " ").as("__span"))
      .withColumn("__sh", TextFunctions.tokenHash(col("__span"))))
    // Distinct-doc counts per span hash; the repeated set is small and
    // broadcasts back onto the window stream.
    val rep = wins.groupBy("__sh")
      .agg(count_distinct(col(idCol)).as("__ndocs"))
      .filter(col("__ndocs") >= minDocs)
      .select("__sh")
    val marked = wins.join(broadcast(rep.withColumn("__rep", lit(true))),
      Seq("__sh"), "left")
    val perDoc = marked.groupBy(col(idCol))
      .agg(
        sum(when(col("__rep"), 1L).otherwise(0L)).as("__nrem"),
        array_join(transform(
          array_sort(collect_list(when(!coalesce(col("__rep"), lit(false)),
            struct(col("__w"), col("__span"))))),
          s => s.getField("__span")), " ").as("__spans"))
    base
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        col("__nw").cast("long").as("n_spans"),
        coalesce(col("__nrem"), lit(0L)).as("n_removed"),
        md5(concat_ws(" ",
          when(col("__spans") =!= "", col("__spans")),
          when(size(col("__toks")) > col("__nw") * window,
            array_join(slice(col("__toks"), col("__nw") * window + 1,
              size(col("__toks")) - col("__nw") * window), " "))))
          .as("cleaned_hash"))
  }
}
