package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{asDouble, L2}
import graft.operators.{Embedder, KnnJoin, PqIndex}

/** Measurement harness behind the pq_opq_recall pin: seed-PQ ADC recall
  * with and without the OPQ variance-balanced permutation, on both the
  * random-vector fixture and the Zipf-skewed hashing-TF document
  * embeddings. Run via `sbt "runMain graft.tools.OpqGrid"`. */
object OpqGrid {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val (kk, m, cb) = (10, 8, 16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def recallPair(q: DataFrame, c: DataFrame, qid: String, cid: String): Unit = {
      val exact = KnnJoin.exact(q, qid, "v", c, cid, "v", kk, L2).cache()
      val nEx = exact.count().toDouble
      def recallOf(qq: DataFrame, cc: DataFrame): Double = {
        val model = PqIndex.fitSeeds(cc, cid, "v", m, cb)
        val enc = PqIndex.encode(cc, cid, "v", model)
        PqIndex.search(qq, qid, "v", enc, cid, model, kk)
          .select(qid, cid)
          .join(exact.select(qid, cid), Seq(qid, cid)).count() / nEx
      }
      val plain = recallOf(q, c)
      val perm = PqIndex.variancePermutation(c, "v", m)
      val opq = recallOf(PqIndex.permute(q, "v", perm),
        PqIndex.permute(c, "v", perm))
      println(f"  plain=$plain%.3f opq=$opq%.3f")
      exact.unpersist()
    }

    println("fixture embeddings:")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    recallPair(emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "job_id"),
      emb.filter(col("vec_id") >= 20).withColumnRenamed("vec_id", "skill_id"),
      "job_id", "skill_id")

    println("hashTF document embeddings:")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val de = Embedder.hashTfEmbed(docs, "doc_id", "text", 64)
      .select(col("doc_id"), col("embedding").cast("array<double>").as("v"))
    recallPair(de.filter(col("doc_id") < 10),
      de.filter(col("doc_id") >= 10).withColumnRenamed("doc_id", "nbr_id"),
      "doc_id", "nbr_id")
    spark.stop()
  }
}
