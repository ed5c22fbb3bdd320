package graft

import graft.operators.NaiveBayes

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // 2 pos docs with "good", 2 neg docs with "bad", "the" everywhere.
  private def docs = Seq(
    (1L, true, Seq("the", "good", "good")),
    (2L, true, Seq("the", "good")),
    (3L, false, Seq("the", "bad")),
    (4L, false, Seq("the", "bad", "bad"))
  )
  private def docsDf = docs.map { case (id, gp, _) => (id, gp) }.toDF("doc_id", "gp")
  private def tokDf = docs.flatMap { case (id, gp, ts) => ts.map((id, gp, _)) }
    .toDF("doc_id", "gp", "t")

  test("discriminative tokens separate the classes; scores match hand arithmetic") {
    val got = NaiveBayes.scoreDocs(docsDf, "doc_id", tokDf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_e8"), r.getAs[Boolean]("pred_pos"))).toMap
    // Hand model: tp = tn = 5, V = 3, prior = ln(2/2) = 0.
    def w(np: Long, nn: Long): Long =
      math.floor((math.log((np + 1).toDouble / 8.0)
        - math.log((nn + 1).toDouble / 8.0)) * 1e8 + 0.5).toLong
    val wThe = w(2, 2); val wGood = w(3, 0); val wBad = w(0, 3)
    assert(got(1L) === (wThe + 2 * wGood, true))
    assert(got(2L) === (wThe + wGood, true))
    assert(got(3L) === (wThe + wBad, false))
    assert(got(4L) === (wThe + 2 * wBad, false))
  }

  test("a token-less document scores exactly the prior") {
    val d = docsDf.union(Seq((5L, false)).toDF("doc_id", "gp"))
    val row = NaiveBayes.scoreDocs(d, "doc_id", tokDf)
      .filter($"doc_id" === 5L).collect().head
    assert(row.getAs[Long]("n_tokens") === 0L)
    // prior = ln(2/3) e8-scaled, ties-to-floor(x+0.5)
    val prior = math.floor(math.log(2.0 / 3.0) * 1e8 + 0.5).toLong
    assert(row.getAs[Long]("score_e8") === prior)
  }

  test("balanced symmetric corpus gives mirror-image scores") {
    val got = NaiveBayes.scoreDocs(docsDf, "doc_id", tokDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_e8")).toMap
    assert(got(1L) === -got(4L))
    assert(got(2L) === -got(3L))
  }
}
