package graft.queries

import org.apache.spark.sql.SparkSession

// throwaway probe — deleted before commit
object TmpRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val (_, c) = Fixtures.split(spark, dir)
      val t0 = System.nanoTime()
      val (_, rounds) = graft.operators.PqIndex.fitKMeansRounds(c, "skill_id", "svec", 8, 16)
      println(s"PROBE $dir rounds=$rounds sec=${(System.nanoTime()-t0)/1e9}")
    }
    spark.stop()
  }
}
// movement probe
object TmpMoveProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.l2Distance
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val (_, c) = Fixtures.split(spark, dir)
      val m = 8; val k = 16
      var model = graft.operators.PqIndex.fitSeeds(c, "skill_id", "svec", m, k)
      val train = c.select(col("skill_id"), col("svec").cast("array<double>").as("__v"))
        .orderBy(col("skill_id")).limit(65536)
        .select(posexplode(array((0 until m).map(s =>
          slice(col("__v"), s * model.subDim + 1, model.subDim)): _*)))
        .toDF("s", "sub").cache()
      for (it <- 1 to 15) {
        val books = typedlit(model.codebooks)
        val means = train
          .withColumn("code",
            element_at(array_sort(transform(element_at(books, col("s") + 1),
              (cw, kk) => struct(l2Distance(col("sub"), cw).as("d"), kk.as("k")))), 1).getField("k"))
          .select(col("s"), col("code"), posexplode(col("sub")).as(Seq("d", "x")))
          .groupBy("s", "code", "d").agg(avg(col("x")).as("mx"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (key, rows) => key -> rows.sortBy(_.getInt(2)).map(r => math.rint(r.getDouble(3) * 1e6) / 1e6).toSeq }
        val next = graft.operators.PqIndex.Model(model.dim, model.subDim,
          (0 until m).map(s => (0 until k).map(kk => means.getOrElse((s, kk), model.codebooks(s)(kk)))))
        val maxMove = (0 until m).flatMap(s => (0 until k).map(kk =>
          next.codebooks(s)(kk).zip(model.codebooks(s)(kk)).map { case (a, b) => math.abs(a - b) }.max)).max
        println(s"MOVE $dir it=$it maxMove=$maxMove")
        model = next
      }
      train.unpersist()
    }
    spark.stop()
  }
}
// recall-vs-rounds probe: seed vs trained ADC recall at capped rounds
object TmpGainProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val K = 10
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val (q, c) = Fixtures.split(spark, dir)
      val exact = org.apache.spark.sql.functions.broadcast(
        graft.operators.KnnJoin.exact(q, "job_id", "qvec", c, "skill_id", "svec", K,
          graft.functions.VectorFunctions.L2))
      def recallOf(model: graft.operators.PqIndex.Model): Double = {
        val enc = graft.operators.PqIndex.encode(c, "skill_id", "svec", model)
        val adc = graft.operators.PqIndex.search(q, "job_id", "qvec", enc, "skill_id", model, K)
        graft.operators.Eval.recallSummary(
          graft.operators.Eval.recallAtK(adc, exact, "job_id", "skill_id"))
          .select("avg_recall").collect()(0).getDouble(0)
      }
      val seedR = recallOf(graft.operators.PqIndex.fitSeeds(c, "skill_id", "svec", 8, 16))
      for (cap <- Seq(3, 5, 7, 10)) {
        val (m2, r) = graft.operators.PqIndex.fitKMeansRounds(c, "skill_id", "svec", 8, 16, maxIter = cap)
        println(s"GAIN $dir cap=$cap rounds=$r seed=$seedR trained=${recallOf(m2)}")
      }
    }
    spark.stop()
  }
}
