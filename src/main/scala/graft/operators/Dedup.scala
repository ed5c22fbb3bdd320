package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the training-data pipeline (BASELINE.json
  * north star: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
  * near-dup). The reference's only dedup is the first-wins-by-key ranked-list
  * dedup (D1, `skills_for_jobs.py:372-379`, rebuilt in [[KnnJoin]]); these
  * generalize to corpus-scale content dedup.
  *
  * Scale posture: nothing here compares all pairs blindly at scale —
  * [[jaccardJoin]] joins through an inverted shingle index (pairs sharing no
  * shingle are never materialized), [[minhashLshJoin]] cuts candidates to
  * LSH-band collisions before verifying, and [[simhash]] reduces each doc to
  * 32 bits bucketable by band. [[cosinePairs]] is the brute-force verifier;
  * route candidates through LSH/IVF first when the corpus outgrows a
  * broadcast. All hashes derive from the portable md5 token hash, so each
  * operator replays exactly in the DuckDB oracle.
  */
object Dedup {

  /** Exact dedup by content hash: assigns every row its group representative
    * (min id per md5(text)). Output: (idCol, content_hash, rep_id,
    * is_dup boolean) — `filter(!is_dup)` is the keep-set, and the assignment
    * shape stays non-trivial even on a dup-free corpus. */
  def exactAssign(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("rep_id", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("rep_id"))
  }

  /** Distinct token n-gram shingles per row: (idCol, gram). Rows with fewer
    * than n tokens produce none (guarded — Spark's sequence(1, 0) counts
    * DOWN, which would index past the array).
    *
    * The token array is materialized as a column FIRST: higher-order
    * functions evaluate without codegen subexpression elimination, so an
    * `element_at(tokens(text), …)` inside the gram lambda would re-run the
    * whole regex tokenizer per element — O(tokens²) per row (measured 12s →
    * ~1s at sf0.1 for this one change). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val withToks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    val toks = col("__toks")
    val grams = when(size(toks) >= n, array_distinct(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
    withToks.select(col(idCol), explode(grams).as("gram"))
  }

  /** Shingles keyed by the portable 64-bit gram hash — the shared input of
    * [[jaccardJoin]] and [[minhashLshJoin]]. Joining fixed-width longs beats
    * sorting variable-length text, and caching ONE canonical plan here lets
    * Spark's cache manager share the materialized index across queries. (A
    * cross-hash collision merges two shingles identically on both sides —
    * the oracle joins on the same hash.) */
  private def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    shingles(df, idCol, textCol, n)
      .select(col(idCol), TextFunctions.tokenHash(col("gram")).as("__gh")).cache()

  private def sharedCounts(sh: DataFrame, idCol: String): DataFrame =
    sh.select(col(idCol).as("a_id"), col("__gh"))
      .join(sh.select(col(idCol).as("b_id"), col("__gh")), "__gh")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))

  /** Exact n-gram Jaccard similarity join through an inverted shingle index:
    * only pairs sharing ≥1 shingle are generated, so the shuffle is bounded
    * by the posting-list sizes, not |docs|². Output:
    * (a_id, b_id, shared, jaccard) for pairs with jaccard ≥ minJaccard,
    * a_id < b_id. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double): DataFrame = {
    val sh = hashedShingles(df, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    jaccardOf(sharedCounts(sh, idCol), sizes, idCol, minJaccard)
  }

  private def jaccardOf(pairs: DataFrame, sizes: DataFrame, idCol: String,
      minJaccard: Double): DataFrame =
    pairs
      .join(sizes.select(col(idCol).as("a_id"), col("__n").as("__na")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("__n").as("__nb")), "b_id")
      .withColumn("jaccard",
        round(col("shared") / (col("__na") + col("__nb") - col("shared")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("shared"), col("jaccard"))

  /** MinHash parameters: universal-hash family h_j(x) = (a_j·x + b_j) mod P
    * over the 32-bit shingle hash. Multipliers stay < 2^20 so a_j·x fits a
    * long. Fixed constants → fully deterministic, reproducible in SQL. */
  val MinhashP = 4294967311L // prime > 2^32
  val NumHashes = 16
  val LshBands = 8 // × 2 rows per band: catches J ≥ ~0.35 candidates w.h.p.
  val hashA: Seq[Long] = (1 to NumHashes).map(j => (1103515245L * j) % 1048573L + 1L)
  val hashB: Seq[Long] = (1 to NumHashes).map(j => (12345L + 2654435761L * j) % MinhashP)

  /** MinHash signature per row: (idCol, sig array<long>[NumHashes]).
    * Input must carry the hashed shingle column "__gh"; rows with no
    * shingles are dropped (no signature to compute). */
  def minhashSignatures(sh: DataFrame, idCol: String): DataFrame = {
    val ghs = sh.groupBy(col(idCol))
      .agg(collect_list(col("__gh")).as("__ghs"))
    val sigCols = (0 until NumHashes).map { j =>
      array_min(transform(col("__ghs"),
        x => (lit(hashA(j)) * x + lit(hashB(j))) % MinhashP))
    }
    ghs.select(col(idCol), array(sigCols: _*).as("sig"))
  }

  /** MinHash+LSH near-dup join: signatures → band buckets → candidate pairs
    * from band collisions → verified with true Jaccard ≥ minJaccard.
    * Candidate generation is a hash-bucket equi-join (shuffle keyed on
    * (band, bandhash)), never an all-pairs compare. */
  def minhashLshJoin(df: DataFrame, idCol: String, textCol: String, n: Int,
      minJaccard: Double): DataFrame = {
    val sh = hashedShingles(df, idCol, textCol, n)
    val sigs = minhashSignatures(sh, idCol)
    val rows = NumHashes / LshBands
    // band k hash = fold of sig[k*rows .. k*rows+rows-1]
    val bandCols = (0 until LshBands).map { k =>
      val slice0 = (0 until rows).map(r => element_at(col("sig"), k * rows + r + 1))
      struct(lit(k).as("band"),
        slice0.reduce((acc, s) => (acc * 31L + s) % MinhashP).as("bh"))
    }
    val buckets = sigs.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
      .select(col(idCol), col("__b.band"), col("__b.bh"))
    val cands = buckets.select(col(idCol).as("a_id"), col("band"), col("bh"))
      .join(buckets.select(col(idCol).as("b_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    // Candidate-FIRST verification: prune each shingle side to docs that
    // appear in an LSH candidate pair before the inverted-index self-join,
    // then semi-join the (much smaller) pair stream against the exact
    // candidate set. The full-index pair aggregation never runs — at scale
    // the posting lists shrink to the near-dup subset, not the corpus.
    val shA = sh.join(cands.select(col("a_id").as(idCol)).distinct(), idCol, "left_semi")
    val shB = sh.join(cands.select(col("b_id").as(idCol)).distinct(), idCol, "left_semi")
    val shared = shA.select(col(idCol).as("a_id"), col("__gh"))
      .join(shB.select(col(idCol).as("b_id"), col("__gh")), "__gh")
      .filter(col("a_id") < col("b_id"))
      .join(cands, Seq("a_id", "b_id"), "left_semi")
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    jaccardOf(shared, sizes, idCol, minJaccard)
  }

  /** 32-bit SimHash over the token stream (repeats weigh in): bit i of the
    * fingerprint is set when the +1/-1 sums of token-hash bit i are positive.
    * Token-less rows fingerprint to 0. Output: (idCol, simhash long). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Hash tokens BEFORE the per-bit fold: `bitvec(tokenHash(t))` would
    // re-run md5 once per bit (32×/token) since HOF lambdas don't CSE.
    // After transform(), `h` below is a bound lambda variable — evaluated
    // once per token no matter how many bits read it.
    val toks = transform(TextFunctions.tokens(col(textCol)), TextFunctions.tokenHash(_))
    // Integer bit ops only: tokenHash is 0..2^32-1, so shiftright == the
    // floor-div-by-2^i form but without 32 double pow/floor per token.
    val bitvec = (h: Column) => transform(sequence(lit(0), lit(31)),
      i => when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
        .otherwise(lit(-1L)))
    val sums = aggregate(toks,
      transform(sequence(lit(0), lit(31)), _ => lit(0L)),
      (acc, h) => zip_with(acc, bitvec(h), (a, b) => a + b))
    val fp = aggregate(
      zip_with(sums, sequence(lit(0), lit(31)),
        (s, i) => when(s > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
    df.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance ≤ maxHamming, a_id < b_id.
    *
    * Pigeonhole banding makes this an equi-join, not an all-pairs scan: cut
    * the 32-bit fingerprint into maxHamming+1 disjoint bands — any pair
    * within the hamming budget differs in ≤ maxHamming bits, so at least one
    * band matches EXACTLY. Candidates = hash-bucket self-join on
    * (band, band bits); survivors are verified with the true hamming
    * distance. Output is identical to the brute-force form, but the shuffle
    * is keyed and bounded by bucket sizes — the shape that survives scale. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming $maxHamming outside [0, 31]")
    // cache(): joins below would otherwise inline the 32-bit-sums expression
    // into every side and re-evaluate it per candidate.
    val fps = simhash(df, idCol, textCol).cache()
    val bands = maxHamming + 1
    // distribute 32 bits across bands (first `32 % bands` bands get an extra bit)
    val widths = Array.tabulate(bands)(k => 32 / bands + (if (k < 32 % bands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandCols = (0 until bands).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("simhash"), offsets(k)).bitwiseAND(lit((1L << widths(k)) - 1L))
          .as("bits"))
    }
    val buckets = fps.select(col(idCol), col("simhash"),
      explode(array(bandCols: _*)).as("__b"))
      .select(col(idCol), col("simhash"), col("__b.band"), col("__b.bits"))
    val cands = buckets.select(col(idCol).as("a_id"), col("simhash").as("__ha"),
        col("band"), col("bits"))
      .join(buckets.select(col(idCol).as("b_id"), col("simhash").as("__hb"),
        col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("hamming"))
      .distinct()
    cands.filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Embedding-cosine near-dup via LSH candidates: candidates come from a
    * bucket-collision self-join over [[RpLsh]] projection planes (OR over
    * `numTables` tables), and the fused cosine re-verifies every candidate —
    * the scale form of [[cosinePairs]] (approximate recall per the LSH
    * params; exact precision because nothing is emitted unverified). For
    * UNIT vectors cos ≥ t ⟺ ‖a−b‖ ≤ √(2−2t), so near-dup pairs sit
    * ≲ radius/√dim apart along each plane — pick `bucketLength` a few times
    * that. Deterministic md5-derived planes → the whole query, candidate set
    * included, replays in the DuckDB oracle. */
  def cosinePairsLsh(vecs: DataFrame, idCol: String, vecCol: String,
      minCos: Double, dim: Int, bucketLength: Double,
      numTables: Int = 3): DataFrame = {
    val v = vecs.select(col(idCol), col(vecCol)).cache()
    val b = RpLsh.bucketize(v, idCol, vecCol, dim, bucketLength, numTables)
    val cands = b.select(col(idCol).as("a_id"), col("tbl"), col("bucket"))
      .join(b.select(col(idCol).as("b_id"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cands
      .join(v.select(col(idCol).as("a_id"), col(vecCol).as("__va")), "a_id")
      .join(v.select(col(idCol).as("b_id"), col(vecCol).as("__vb")), "b_id")
      .withColumn("cos_sim",
        round(graft.functions.VectorFunctions.fusedDistance("cossim")(
          col("__va"), col("__vb")), 6))
      .filter(col("cos_sim") >= minCos)
      .select("a_id", "b_id", "cos_sim")
  }

  /** Embedding-cosine near-dup pairs: cos(a,b) ≥ minCos, a_id < b_id.
    * Brute-force verifier; feed it LSH/IVF candidates at scale
    * ([[cosinePairsLsh]]). */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    // cache(): embedding pipelines upstream would re-run on both join sides
    // otherwise; see simhashPairs for the repartition rationale. The inner
    // loop uses the fused single-pass cosine expression, not the HOF form.
    val v = vecs.select(col(idCol), col(vecCol)).cache()
    val par = vecs.sparkSession.sparkContext.defaultParallelism
    val a = v.repartition(par).select(col(idCol).as("a_id"), col(vecCol).as("__va"))
    val b = v.select(col(idCol).as("b_id"), col(vecCol).as("__vb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim",
        round(graft.functions.VectorFunctions.fusedDistance("cossim")(
          col("__va"), col("__vb")), 6))
      .filter(col("cos_sim") >= minCos)
      .select("a_id", "b_id", "cos_sim")
  }
}
