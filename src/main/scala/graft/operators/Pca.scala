package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.ExactRound

/** Distributed PCA over the embedding corpus, exact-integer end to end.
  *
  * The expensive half — the d×d second-moment (uncentered Gram) matrix —
  * is ONE scan: each row emits its upper-triangle products (d(d+1)/2 values
  * per row, flat-mapped in a codegen'd HOF, no self-join), prescaled to e9
  * integers so the keyed sum is exact and partition-order-proof. At 100 TB
  * that is a map-side-combined aggregation onto d² = 4096 cells — the
  * shuffle carries O(d²·partitions) rows regardless of corpus size.
  *
  * The cheap half — the top principal axis — is power iteration on the
  * COLLECTED d×d matrix (a bounded model fetch, the IVF/PQ-codebook
  * pattern), run in FIXED-POINT: after every mat-vec the vector is
  * re-quantized to e6 integers, so each iteration's input is integer-exact
  * and the whole trajectory replays bit-for-bit on any engine (the DuckDB
  * oracle reruns it as a recursive CTE over the same pinned integers).
  * Every non-integer step is a single correctly-rounded IEEE op (int→double
  * cast, one divide, sqrt), so there is no accumulation-order freedom
  * anywhere. Sign is fixed by the deterministic all-positive start.
  *
  * The axis itself is O(d) — projecting the corpus onto it (the dimension-
  * reduction / whitening-first-step a real embedding pipeline runs) is a
  * broadcast literal dot product: one more scan, no shuffle.
  */
object Pca {

  /** Fixed-point power-iteration rounds — enough for a clear top-eigengap
    * spectrum at d=64; the pin does not require convergence, it IS the
    * operator's defined output. */
  val Iters = 12

  /** Initial coordinate: e6 of 1/8 = 1/√64 (unit vector at d=64). */
  val InitE6 = 125000L

  /** Upper-triangle exact second-moment census: one row per (dim_i ≤ dim_j),
    * 1-BASED dims, with n and m2_e9 = round(mean of e9-prescaled per-row
    * products). The per-row product of two float→double casts is one IEEE
    * multiply — bit-identical on any engine reading the same floats; the
    * e9 floor-prescale is the identical op sequence (×, ×1e9, +0.5, floor)
    * whether Catalyst or this JVM loop evaluates it, so the integer sums
    * are the same numbers the HOF formulation produced.
    *
    * Shape: per-PARTITION Gram accumulation in one `mapPartitions` pass (a
    * genuine imperative-per-partition case — the HOF pair expansion paid
    * ~2 080 interpreted struct constructions per row, a 7 s census at
    * sf0.1), emitting ONE flat d(d+1)/2 partial array per partition; the
    * shuffle then carries partitions×d² cells, never corpus×d². Exact
    * integer partials are order-independent, so the re-combine is
    * partition-layout-proof. */
  def secondMoment(emb: DataFrame, vecCol: String): DataFrame =
    m2FromRaw(secondMomentRaw(emb, vecCol))

  /** The census in its RAW additive form: (dim_i, dim_j, n, s9) with
    * s9 = exact Σ of the e9-prescaled per-row products (decimal(38,0)).
    * Unlike the rounded mean `m2_e9`, raw cells MERGE exactly — census ⊎
    * census = census of the union — which is the O(delta) maintenance
    * path: a deployment stores the d² raw cells, folds each ingest
    * batch's raw census in with [[mergeRawCensus]] (one delta scan, no
    * corpus re-read), and derives the mean census on demand with
    * [[m2FromRaw]]. profile_cov_append pins merge ≡ rebuild cell for
    * cell. */
  def secondMomentRaw(emb: DataFrame, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Per-partition partials ride Long: |x·y|·1e9·rowsPerPartition < 2^63
    // holds with orders of magnitude to spare for unit-ish embeddings
    // (|x·y| ≤ ~400 ⇒ ~2×10¹⁰ rows per partition before overflow); the
    // cross-partition re-combine rides decimal(38,0).
    val partials = emb.select(col(vecCol).cast("array<double>"))
      .as[Seq[Option[Double]]] // Option elements: a null element must fail
      // with a diagnosable message, not the deserializer's generic one
      .mapPartitions { it =>
        var acc: Array[Long] = null
        var d = 0
        var n = 0L
        it.foreach { vOpt =>
          if (vOpt != null) {
            val v = vOpt.map(_.getOrElse(throw new IllegalArgumentException(
              "Pca.secondMoment: null embedding element — malformed vector")))
            if (acc == null) { d = v.length; acc = new Array[Long](d * (d + 1) / 2) }
            require(v.length == d,
              s"secondMoment: ragged vector (dim ${v.length} vs $d)")
            n += 1
            var c = 0
            var i = 0
            while (i < d) {
              val xi = v(i)
              var j = i
              while (j < d) {
                // identical to ExactRound.eScaled(x*y, 9)
                acc(c) += math.floor(xi * v(j) * 1e9 + 0.5d).toLong
                c += 1
                j += 1
              }
              i += 1
            }
          }
        }
        if (acc == null) Iterator.empty
        else {
          val out = new Array[(Long, Long, Long, Long)](acc.length)
          var c = 0
          var i = 1
          while (i <= d) {
            var j = i
            while (j <= d) { out(c) = (i.toLong, j.toLong, n, acc(c)); c += 1; j += 1 }
            i += 1
          }
          out.iterator
        }
      }
    partials.toDF("dim_i", "dim_j", "__n", "__p9")
      .groupBy("dim_i", "dim_j")
      .agg(sum(col("__n")).cast("long").as("n"),
        sum(col("__p9").cast("decimal(38,0)")).cast("decimal(38,0)").as("s9"))
  }

  /** Fold one raw census into another: exact integer sums per cell. */
  def mergeRawCensus(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("dim_i", "dim_j")
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("s9")).cast("decimal(38,0)").as("s9"))

  /** Derive the mean census (the [[secondMoment]] output contract) from a
    * raw census: m2_e9 = roundDiv(s9, n). */
  def m2FromRaw(raw: DataFrame): DataFrame =
    raw.select(col("dim_i"), col("dim_j"), col("n"),
      ExactRound.roundDiv(col("s9"), col("n")).as("m2_e9"))

  /** The fixed-point power iteration, mirrored EXACTLY by [[iterSql]]:
    *   w   = A_e9 · v_e6                  (integer mat-vec, |w| < 2^63)
    *   n2  = Σ w²                         (exact big-integer)
    *   v'  = floor(w/√n2 · 1e6 + 0.5)     (two IEEE ops + the e6 floor)
    * `m2` is [[secondMoment]] output (upper triangle; mirrored here). */
  def topAxisE6(m2: DataFrame): Array[Long] = {
    val cells = m2.select(col("dim_i").cast("long"), col("dim_j").cast("long"),
      col("m2_e9").cast("long")).collect()
    val d = cells.map(_.getLong(1)).max.toInt
    val a = Array.ofDim[Long](d, d)
    cells.foreach { case Row(i: Long, j: Long, x: Long) =>
      a(i.toInt - 1)(j.toInt - 1) = x
      a(j.toInt - 1)(i.toInt - 1) = x
    }
    var v = Array.fill(d)(InitE6)
    for (_ <- 1 to Iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L
        var j = 0
        while (j < d) { s += a(i)(j) * v(j); j += 1 }
        s
      }
      val n2 = w.foldLeft(BigInt(0))((acc, x) => acc + BigInt(x) * BigInt(x))
      val norm = math.sqrt(n2.toDouble)
      v = w.map(x => math.floor(x.toDouble / norm * 1e6 + 0.5).toLong)
    }
    v
  }

  /** Project every vector onto the e6 axis: proj_e12 = Σ e6(x_j)·v_e6[j],
    * an exact integer (|proj| ≤ d·1e12 < 2^53). Broadcast-literal dot —
    * scan-only, no shuffle. */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      axisE6: Array[Long]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val axis = array(axisE6.map(lit): _*)
    emb.select(col(idCol),
      aggregate(
        zip_with(v, axis, (x, w) => ExactRound.e6(x).cast("long") * w),
        lit(0L), (acc, t) => acc + t).as("proj_e12"))
  }

  /** Per-dimension means in micro-units: (dim 1-based, mean_e6). */
  def dimMeansE6(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("__i", "__x")))
      .select((col("__i") + 1).cast("long").as("dim"),
        ExactRound.e6(col("__x")).cast("long").as("__x6"))
      .groupBy("dim")
      .agg(ExactRound.roundDiv(sum(col("__x6").cast("decimal(38,0)")),
        count(lit(1))).as("mean_e6"))

  /** Per-dimension z-score whitening (the standardization step before
    * scalar/product quantization), pinned as ONE exact integer per vector:
    * z_checksum = Σ_j j · e4((x_j − μ_j)/σ_j). μ and σ derive from the
    * PINNED integer census ([[secondMoment]] diagonal + [[dimMeansE6]]) by
    * a fixed sequence of single IEEE ops, so both engines carry identical
    * doubles into the per-value e4 floor; collapsed dimensions (σ ≤ 0 or
    * NaN) contribute exactly 0. Stats collect is a bounded model fetch;
    * the corpus pass is a broadcast-literal scan, no shuffle. */
  def standardizeChecksum(emb: DataFrame, idCol: String, vecCol: String,
      census: DataFrame): DataFrame = {
    val means = dimMeansE6(emb, vecCol).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val diag = census.filter(col("dim_i") === col("dim_j"))
      .select(col("dim_i").cast("long"), col("m2_e9").cast("long")).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val d = means.keys.max
    val mus = Array.tabulate(d)(j => means(j + 1).toDouble / 1e6)
    val sgs = Array.tabulate(d) { j =>
      val mu = mus(j)
      val sg = math.sqrt(diag(j + 1).toDouble / 1e9 - mu * mu)
      // a near-constant dim can compute a slightly NEGATIVE variance from
      // the rounded census → NaN sqrt; NaN compares HIGH in both engines,
      // so a bare sg > 0 guard would take the branch — sanitize to the
      // documented exactly-0 contribution here (the oracle carries an
      // explicit isnan() guard for the same case)
      if (sg.isNaN || sg <= 0.0) 0.0 else sg
    }
    val muArr = array(mus.map(lit(_)): _*)
    val sgArr = array(sgs.map(lit(_)): _*)
    val v = col(vecCol).cast("array<double>")
    val terms = transform(v, (x, i) => {
      val mu = element_at(muArr, i + 1)
      val sg = element_at(sgArr, i + 1)
      when(sg > 0.0d,
        (i + 1).cast("long") * ExactRound.eScaled((x - mu) / sg, 4).cast("long"))
        .otherwise(0L)
    })
    emb.select(col(idCol),
      aggregate(terms, lit(0L), (acc, t) => acc + t).as("z_checksum"))
  }

  // ---- DuckDB twins ---------------------------------------------------------

  /** CTEs over `src`(vec_id, embedding): upper-triangle census
    * `${p}sm`(dim_i, dim_j, n, m2_e9), 1-based. CTE names carry prefix
    * `p` so two censuses (e.g. base + full for the drift gate) can
    * coexist in one query. */
  def secondMomentSql(dim: Int, src: String = "embeddings",
      p: String = ""): String =
    s"""${p}pr AS (SELECT ${ExactRound.eScaledSql(
            "CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)", 9)} AS p9,
       |    CAST(i AS BIGINT) AS dim_i, CAST(j AS BIGINT) AS dim_j
       |  FROM $src,
       |    unnest(generate_series(1, $dim)) AS t(i),
       |    unnest(generate_series(1, $dim)) AS u(j)
       |  WHERE j >= i),
       |${p}sm AS (SELECT dim_i, dim_j, count(*) AS n,
       |    ${ExactRound.roundDivSql("sum(p9)", "count(*)")} AS m2_e9
       |  FROM ${p}pr GROUP BY 1, 2)""".stripMargin

  /** CTEs replaying [[topAxisE6]] from `${p}sm`: ends in `${p}axis(v)` —
    * the e6 integer axis as a 1-based list. Requires [[secondMomentSql]]
    * at the same prefix. */
  def iterSql(dim: Int, p: String = ""): String =
    s"""${p}fm AS (SELECT dim_i AS i, dim_j AS j, m2_e9 AS a FROM ${p}sm
       |  UNION ALL SELECT dim_j, dim_i, m2_e9 FROM ${p}sm WHERE dim_i <> dim_j),
       |${p}am AS (SELECT list(r ORDER BY i) AS m
       |  FROM (SELECT i, list(a ORDER BY j) AS r FROM ${p}fm GROUP BY i)),
       |${p}it AS (SELECT 0 AS k,
       |    list_transform(generate_series(1, $dim), x -> CAST(${InitE6} AS BIGINT)) AS v
       |  UNION ALL
       |  SELECT k + 1,
       |    list_transform(w, x -> CAST(floor(CAST(x AS DOUBLE) / norm * 1e6 + 0.5) AS BIGINT))
       |  FROM (SELECT k, w,
       |      sqrt(CAST(list_sum(list_transform(w,
       |        x -> CAST(x AS HUGEINT) * CAST(x AS HUGEINT))) AS DOUBLE)) AS norm
       |    FROM (SELECT ${p}it.k AS k,
       |        list_transform(generate_series(1, $dim), i ->
       |          CAST(list_sum(list_transform(generate_series(1, $dim),
       |            j -> ${p}am.m[i][j] * ${p}it.v[j])) AS BIGINT)) AS w
       |      FROM ${p}it, ${p}am WHERE ${p}it.k < $Iters)) ),
       |${p}axis AS (SELECT v FROM ${p}it WHERE k = $Iters)""".stripMargin
}
