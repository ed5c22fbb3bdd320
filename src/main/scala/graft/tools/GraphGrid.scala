package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{asDouble, Cosine}
import graft.operators.{GraphSearch, KnnJoin, PageRank}

/** Tuning harness for the graph-ANN tier: sweeps (degree, beam, hops) for
  * the flat NSW walk and (layerMod, upperDegree, upperHops, upperBeam,
  * nEntries) for the hierarchical walk, printing recall@K against the
  * exact ranking — the measurement behind the pinned operating point in
  * VectorQueries (PrK — the shared census/search graph degree — GsBeam,
  * GsHops). Not part of the query board;
  * run via `sbt "runMain graft.tools.GraphGrid"` with SPARK_GRAFT_SF_DIR.
  */
object GraphGrid {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val K = 10
    val NQ = 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("job_id"), asDouble(col("embedding")).as("qvec"))
    val c = emb.filter(col("vec_id") >= NQ)
      .select(col("vec_id").as("skill_id"), asDouble(col("embedding")).as("svec"))
    val exact = KnnJoin.exact(q, "job_id", "qvec", c, "skill_id", "svec", K,
      Cosine).cache()
    val nExact = exact.count().toDouble

    def recallOf(walk: org.apache.spark.sql.DataFrame): Double =
      walk.select("job_id", "skill_id")
        .join(exact.select("job_id", "skill_id"), Seq("job_id", "skill_id"))
        .count() / nExact

    val degrees = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 12))
    for (deg <- degrees) {
      val edges = PageRank.symmetrize(
        PageRank.directedKnnEdges(c, "skill_id", "svec", deg)).cache()
      edges.count()
      for (beam <- Seq(16, 32); hops <- Seq(4, 6)) {
        val t0 = System.nanoTime()
        val r = recallOf(GraphSearch.beamSearch(q, "job_id", "qvec", c,
          "skill_id", "svec", edges, hops, beam, K))
        println(f"flat deg=$deg%2d beam=$beam%2d hops=$hops%d recall=$r%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      for (beam <- Seq(16, 32); hops <- Seq(3, 4);
           (lm, ud, uh, ub, ne) <- Seq((4, 4, 2, 8, 4), (4, 8, 3, 8, 4))) {
        val t0 = System.nanoTime()
        val r = recallOf(GraphSearch.hierarchicalSearch(q, "job_id", "qvec",
          c, "skill_id", "svec", edges, hops, beam, K, lm, ud, uh, ub, ne))
        println(f"hier deg=$deg%2d beam=$beam%2d hops=$hops%d lm=$lm ud=$ud uh=$uh ub=$ub ne=$ne recall=$r%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
