package graft

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vector_distance is callable from SQL after register()") {
    Graft.register(spark)
    Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT vector_distance(a, b, 'cosine') AS c,
        |       vector_distance(a, b, 'l2') AS l,
        |       vector_distance(a, b, 'cossim') AS s FROM v""".stripMargin).head()
    assertNear(r.getDouble(0), 1.0)          // orthogonal → cosine distance 1
    assertNear(r.getDouble(1), math.sqrt(2)) // l2
    assertNear(r.getDouble(2), 0.0)          // similarity
  }

  test("SQL text functions are bit-equal to their Column forms") {
    Graft.register(spark)
    import org.apache.spark.sql.functions.{col, round}
    val docs = Seq((1L, "The quick brown fox and the lazy dog"),
      (2L, "a of and to is the"), (3L, "!!! ### $$$"), (4L, ""),
      (5L, "punctuation, mixed: 42 numbers & words")).toDF("doc_id", "t")
    docs.createOrReplaceTempView("gx_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_token_hash(t) AS th, graft_fingerprint(t) AS fp,
        |  graft_simhash(t) AS sh, round(graft_quality(t), 9) AS q,
        |  graft_hash_bucket(CAST(doc_id AS STRING), 10000) AS b
        |FROM gx_docs""".stripMargin).collect().map(_.toSeq).toSet
    val viaCols = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenHash(col("t")).as("th"),
        graft.functions.TextFunctions.fingerprint(col("t")).as("fp"),
        graft.operators.Dedup.simhashOf(col("t")).as("sh"),
        round(graft.functions.TextFunctions.qualityScore(col("t")), 9).as("q"),
        graft.operators.Sampling.hashBucket(col("doc_id"), 10000).as("b"))
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaCols)
  }

  test("bad kind and bad arity are rejected at analysis") {
    Graft.register(spark)
    Seq((Seq(1.0), Seq(1.0))).toDF("a", "b").createOrReplaceTempView("v2")
    intercept[Exception](
      spark.sql("SELECT vector_distance(a, b, 'hamming') FROM v2").head())
    intercept[Exception](
      spark.sql("SELECT vector_distance(a, b) FROM v2").head())
  }
}
