package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for every table the engine reads.
  *
  * The reference infers schemas (pandas `read_csv`), which let its README and
  * code drift apart (SURVEY.md §1.1 — `skill_list.csv` columns declared in
  * `README.md:53` vs used in `load_skill_vectors_pg.py:18-19`). We declare and
  * validate instead: a reader fails fast when the on-disk schema drifts.
  */
object Schemas {

  /** skills table — reference shape per `load_skill_vectors_pg.py:16-19`,
    * `load_skill_vectors_weaviate.py:76-78`, `create_skill_embeddings.py:38`. */
  val skills: StructType = StructType(Seq(
    StructField("abbreviation", StringType),
    StructField("title", StringType),
    StructField("level", IntegerType),
    StructField("level_description", StringType)))

  /** jobs table — reference shape per `skills_for_jobs.py:426`,
    * `create_job_embeddings.py:36`. */
  val jobs: StructType = StructType(Seq(
    StructField("job_code", StringType),
    StructField("gpt_job_description", StringType)))

  /** Embedding matrix with an explicit row id — replaces the reference's
    * positional CSV-row-i ↔ npy-row-i alignment (`load_skill_vectors_pg.py:36-38`). */
  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val byName: Map[String, StructType] = Map(
    "embeddings" -> embeddings, "documents" -> documents, "events" -> events,
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem)
}
