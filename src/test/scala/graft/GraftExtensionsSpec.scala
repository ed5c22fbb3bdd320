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

  test("bad kind and bad arity are rejected at analysis") {
    Graft.register(spark)
    Seq((Seq(1.0), Seq(1.0))).toDF("a", "b").createOrReplaceTempView("v2")
    intercept[Exception](
      spark.sql("SELECT vector_distance(a, b, 'hamming') FROM v2").head())
    intercept[Exception](
      spark.sql("SELECT vector_distance(a, b) FROM v2").head())
  }
}
