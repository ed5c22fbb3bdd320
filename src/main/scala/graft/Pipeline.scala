package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{Cosine, Metric}
import graft.operators._

/** The reference's full workload as one composed library pipeline — a user
  * of empathco/skills_vectors maps their three scripts onto three calls:
  *
  *  - [[embed]]        ≙ entry point A (`create_*_embeddings.py`): text →
  *                       deterministic local embeddings (SURVEY.md §3.1).
  *  - [[buildIndex]]   ≙ entry point B (`load_skill_vectors_*.py`): truncate-
  *                       and-load the IVF-partitioned index (§3.2).
  *  - [[skillsForJobs]] ≙ entry point C (`skills_for_jobs.py`): per-job top-k
  *                       search (exact or probe-pruned ANN), first-wins dedup
  *                       by level, recall + similarity eval vs the exact
  *                       oracle, wide pivot report, CSV sink (§3.3).
  *
  * Every stage is the operator already covered by the driver's correctness
  * gate; this object only composes them.
  */
object Pipeline {

  /** Reference provider dims (`load_skill_vectors_pg.py:10-13`). */
  val ProviderDims: Map[String, Int] = Map("openai" -> 1536, "gemini" -> 768)

  case class Config(
      dim: Int = 1536,
      k: Int = 10,               // MAX_SKILLS (skills_for_jobs.py:23)
      maxJobs: Int = 5000,       // MAX_JOBS (skills_for_jobs.py:22)
      lists: Int = 4,            // NUM_LISTS (load_skill_vectors_pg.py:15)
      nProbe: Int = 4,           // probes = lists ⇒ exact (forced-ENN oracle)
      metric: Metric = Cosine)

  /** Entry point A: (id, text) → (id, embedding array<double>, unit norm). */
  def embed(df: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    Embedder.hashTfEmbed(df, idCol, textCol, dim)

  /** Entry point B: embed the skills table and persist the IVF index
    * (overwrite = the reference's truncate-then-load K3). Returns the
    * centroid model needed at search time. */
  def buildIndex(skills: DataFrame, cfg: Config, path: String): IvfIndex.Model = {
    val vectors = embed(skills, "abbreviation", "level_description", cfg.dim)
      .join(skills.select(col("abbreviation"), col("level")), "abbreviation")
    val model = IvfIndex.fitKMeans(vectors, "embedding", cfg.lists)
    IvfIndex.write(
      IvfIndex.assign(vectors, "abbreviation", "embedding", model, cfg.metric), path)
    model
  }

  case class Result(
      ranked: DataFrame,     // (job_code, abbreviation, level, rank, dist)
      recall: DataFrame,     // (avg_matches, avg_recall, n_queries)
      similarity: DataFrame, // (avg_avg_sim, n_queries)
      report: DataFrame)     // (job, skill0, level0, …)

  /** Entry point C over a previously built index. */
  def skillsForJobs(spark: SparkSession, jobs: DataFrame, indexPath: String,
      model: IvfIndex.Model, cfg: Config = Config()): Result = {
    val indexed = spark.read.parquet(indexPath).cache()
    val jobVecs = embed(jobs.limit(cfg.maxJobs), "job_code", "gpt_job_description", cfg.dim)

    val ann = IvfIndex.search(jobVecs, "job_code", "embedding",
      indexed, "abbreviation", "embedding", model, cfg.k, cfg.nProbe, cfg.metric)
    val exact = KnnJoin.exact(jobVecs, "job_code", "embedding",
      indexed, "abbreviation", "embedding", cfg.k, cfg.metric)

    // J3/D1: overfetch + first-wins dedup by level, re-ranked to k.
    val ranked = KnnJoin.exactDedupByKey(jobVecs, "job_code", "embedding",
      indexed, "abbreviation", "embedding", "level", cfg.k, cfg.metric)

    // J4/J5 + A1-A3 eval of the ANN path against the exact oracle.
    val recall = Eval.recallSummary(
      Eval.recallAtK(ann, exact, "job_code", "abbreviation"))
    val vecs = indexed.select(col("abbreviation"), col("embedding"))
    val hits = ann.join(vecs, "abbreviation")
    val best = exact.filter(col("rank") === 1).join(vecs, "abbreviation")
      .select(col("job_code"), col("embedding"))
    val similarity = Eval.similaritySummary(
      Eval.bestVectorSimilarity(hits, best, "job_code", "embedding"))

    // R1: the per-job wide report (job, skill0..k-1, level0..k-1).
    val report = Report.pivotTopK(ranked, "job_code", "rank", cfg.k,
      Seq("abbreviation" -> "skill", "level" -> "level"))

    Result(ranked, recall, similarity, report)
  }

  /** End-to-end convenience: build, search, evaluate, write the CSV report
    * (K2 sink, `job_skills_<backend><provider>.csv` shape). */
  def runAll(spark: SparkSession, skills: DataFrame, jobs: DataFrame,
      indexPath: String, reportPath: String, cfg: Config = Config()): Result = {
    val model = buildIndex(skills, cfg, indexPath)
    val result = skillsForJobs(spark, jobs, indexPath, model, cfg)
    Report.writeCsvReport(result.report, reportPath)
    result
  }
}
