package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnJoin, PqIndex}
import graft.functions.VectorFunctions.L2

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def randVecs(seed: Int, n: Int, from: Int = 0): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(seed)
    (from until from + n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian())))
  }

  private lazy val corpus = randVecs(7, 120).toDF("id", "vec")
  private lazy val queries = randVecs(13, 5, from = 1000).toDF("qid", "qvec")

  test("fitSeeds slices codebooks; encode emits m in-range codes per row") {
    val model = PqIndex.fitSeeds(corpus, "id", "vec", m = 4, k = 8)
    assert(model.subDim == 4 && model.codebooks.size == 4)
    assert(model.codebooks.forall(_.size == 8))
    val enc = PqIndex.encode(corpus, "id", "vec", model)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect()
    assert(enc.length == 120)
    assert(enc.forall(_._2.size == 4))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 8)))
    intercept[IllegalArgumentException] {
      PqIndex.fitSeeds(corpus, "id", "vec", m = 5, k = 8) // 16 % 5 != 0
    }
  }

  test("a codebook seed row ADC-matches itself at distance 0") {
    val model = PqIndex.fitSeeds(corpus, "id", "vec", m = 4, k = 8)
    val enc = PqIndex.encode(corpus, "id", "vec", model)
    // Seed rows' subvectors ARE codewords, so their reconstruction error is
    // 0 and ADC distance from themselves (as queries) is exactly 0.
    val seedQ = corpus.filter($"id" < 8)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val top1 = PqIndex.search(seedQ, "qid", "qvec", enc, "id", model, 1)
      .select($"qid", $"id", $"dist").as[(Long, Long, Double)].collect()
    top1.foreach { case (q, id, d) => assert(id == q && d == 0.0, s"($q,$id,$d)") }
  }

  test("refine never lowers recall and always returns k rows per query") {
    val model = PqIndex.fitSeeds(corpus, "id", "vec", m = 4, k = 8)
    val enc = PqIndex.encode(corpus, "id", "vec", model)
    val k = 5
    val exact = KnnJoin.exact(queries, "qid", "qvec", corpus, "id", "vec", k, L2)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    val adc = PqIndex.search(queries, "qid", "qvec", enc, "id", model, k)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    val refined = PqIndex.searchRefined(queries, "qid", "qvec", enc, corpus,
      "id", "vec", model, k, overfetch = 8)
    val refSet = refined.select($"qid", $"id").as[(Long, Long)].collect().toSet
    assert(refined.groupBy("qid").count().as[(Long, Long)].collect()
      .forall(_._2 == k))
    assert((refSet & exact).size >= (adc & exact).size,
      s"refine recall ${(refSet & exact).size} < adc ${(adc & exact).size}")
    // Refined candidates all came from the ADC overfetch pool.
    val pool = PqIndex.search(queries, "qid", "qvec", enc, "id", model, k * 8)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    assert(refSet.subsetOf(pool))
  }

  test("fitKMeans cuts quantization error vs the seed codebooks") {
    val m = 4; val k = 8
    val seed = PqIndex.fitSeeds(corpus, "id", "vec", m, k)
    val trained = PqIndex.fitKMeans(corpus, "id", "vec", m, k)
    assert(trained.subDim == seed.subDim &&
      trained.codebooks.size == m && trained.codebooks.forall(_.size == k))
    // Mean squared reconstruction error must drop: Lloyd only ever lowers
    // the within-cluster SSE it optimizes, and seed codewords are plain
    // corpus rows, not centroids.
    def mse(model: PqIndex.Model): Double = {
      val rows = corpus.select($"vec").as[Seq[Double]].collect()
      rows.map { v =>
        (0 until m).map { s =>
          val sub = v.slice(s * model.subDim, (s + 1) * model.subDim)
          model.codebooks(s).map(cw =>
            cw.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum / rows.length
    }
    val (eSeed, eTrained) = (mse(seed), mse(trained))
    assert(eTrained < eSeed, s"trained MSE $eTrained !< seed MSE $eSeed")
    // Recall ordering is NOT asserted here: on a 5-query × k=5 toy corpus
    // it is sampling noise (observed flipping either way), while lower
    // quantization MSE is Lloyd's guaranteed invariant. The end-to-end
    // recall margin is driver-gated at fixture scale by pq_kmeans_recall's
    // in-plan raise_error (seed→kmeans gains of +0.09..+0.13 across SFs).
  }

  test("quantized Lloyd reaches its fixpoint early and replays bit-for-bit") {
    val m = 4; val k = 8
    // The e6 re-quantization of codeword means exists so the exact-equality
    // convergence check can actually fire (raw FP means carry a last-ulp
    // wobble that ran every fit to maxIter — the r9 bench-breach
    // mechanism). Generous cap: the assertion is that the loop STOPPED
    // well short of it, i.e. the early exit is reachable, not decorative.
    val (a, roundsA) = PqIndex.fitKMeansRounds(corpus, "id", "vec", m, k,
      maxIter = 30)
    assert(roundsA < 30, s"Lloyd ran all $roundsA rounds — fixpoint never fired")
    // On-grid models replay exactly: same data, same seeds, same rounds ⇒
    // the identical codebooks, which is what makes the trained quantizer
    // rebuild-reproducible (and its stored-layout fingerprint stable).
    val (b, roundsB) = PqIndex.fitKMeansRounds(corpus, "id", "vec", m, k,
      maxIter = 30)
    assert(roundsB == roundsA && b == a,
      s"re-fit diverged: rounds $roundsA vs $roundsB, models equal=${b == a}")
  }

  test("searchIvf pred: filter rides the index — hits satisfy it, trivial " +
      "pred is a no-op, and a match is never lost to post-k truncation") {
    import graft.operators.IvfIndex
    import graft.functions.VectorFunctions.Cosine
    val labeled = corpus.withColumn("label", pmod($"id", lit(3L)))
    val ivf = IvfIndex.fitSeeds(labeled, "id", "vec", 4)
    val pq = PqIndex.fitSeeds(labeled, "id", "vec", m = 4, k = 8)
    val indexed = IvfIndex.assign(labeled, "id", "vec", ivf, Cosine)
      .select($"id", $"label", $"list_id")
      .join(PqIndex.encode(labeled, "id", "vec", pq), "id")
    val k = 5
    val pred = $"label" === 0L
    val filtered = PqIndex.searchIvf(queries, "qid", "qvec", indexed, "id",
      ivf, pq, k, nProbe = 2, Cosine, pred = Some(pred))
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect()
    // every hit satisfies the predicate
    val allowed = labeled.filter(pred).select($"id").as[Long].collect().toSet
    assert(filtered.forall(r => allowed(r._2)), filtered.mkString(","))
    // trivial predicate ≡ the unfiltered search, row for row
    val unf = PqIndex.searchIvf(queries, "qid", "qvec", indexed, "id",
      ivf, pq, k, nProbe = 2, Cosine)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    val triv = PqIndex.searchIvf(queries, "qid", "qvec", indexed, "id",
      ivf, pq, k, nProbe = 2, Cosine, pred = Some(lit(true)))
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(triv == unf)
    // filter-BEFORE-ranking, the operator's whole point: only ~1/3 of the
    // corpus is labeled 0, so the unfiltered top-k post-filtered loses
    // slots that pred-before-ADC keeps filled (the low-k failure mode of
    // filter-after-search)
    val postK = unf.filter(r => allowed(r._2)).groupBy(_._1).map(_._2.size)
    val perQ = filtered.groupBy(_._1).map(_._2.size)
    assert(perQ.forall(_ == k), s"filtered search must fill k slots: $perQ")
    assert(postK.exists(_ < k),
      "fixture too permissive: post-k filtering lost no slot, pick a rarer label")
  }

  test("writeIvfIndex metaCols: the stored layout carries the filter " +
      "column, appends line up positionally, and the filtered stored " +
      "search equals the in-memory one") {
    import graft.operators.IvfIndex
    import graft.functions.VectorFunctions.Cosine
    val labeled = corpus.withColumn("label", pmod($"id", lit(3L)))
    val ivf = IvfIndex.fitSeeds(labeled, "id", "vec", 4)
    val pq = PqIndex.fitSeeds(labeled, "id", "vec", m = 4, k = 8)
    val base = labeled.filter($"id" < 100L)
    val delta = labeled.filter($"id" >= 100L)
    val path = java.nio.file.Files.createTempDirectory("pqmeta").toString
    PqIndex.writeIvfIndex(base, "id", "vec", pq, ivf, Cosine,
      "graft_test_pqmeta", s"$path/idx", metaCols = Seq("label"))
    PqIndex.appendToIvfIndex(delta, "id", "vec", pq, ivf, Cosine,
      "graft_test_pqmeta", metaCols = Seq("label"))
    val stored = spark.table("graft_test_pqmeta")
    assert(stored.columns.contains("label"))
    // append kept (id, label) aligned: the stored labels equal the source's
    val got = stored.select($"id", $"label").as[(Long, Long)].collect().toSet
    val want = labeled.select($"id", $"label").as[(Long, Long)].collect().toSet
    assert(got == want)
    val pred = $"label" === 0L
    val fromStore = PqIndex.searchIvf(queries, "qid", "qvec", stored, "id",
      ivf, pq, 5, 2, Cosine, pred = Some(pred))
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    val inMem = IvfIndex.assign(labeled, "id", "vec", ivf, Cosine)
      .select($"id", $"label", $"list_id")
      .join(PqIndex.encode(labeled, "id", "vec", pq), "id")
    val fromMem = PqIndex.searchIvf(queries, "qid", "qvec", inMem, "id",
      ivf, pq, 5, 2, Cosine, pred = Some(pred))
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(fromStore == fromMem)
    spark.sql("DROP TABLE IF EXISTS graft_test_pqmeta")
  }
}
