package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotProduct

/** Deterministic random-projection LSH planes (SURVEY.md §2.3 X2; the batch
  * analog of the reference's HNSW build, `load_skill_vectors_milvus.py:53-68`).
  *
  * MLlib's BucketedRandomProjectionLSH draws its gaussian planes from the JVM
  * RNG — deterministic per run but not replayable in SQL, which left the ANN
  * path rows-only in the correctness gate. Here each plane is a unit vector
  * with entries ±1/√dim whose SIGNS derive from the portable md5 hash
  * ("rp_<table>_<dim>"), the same constants-interpolated-into-SQL methodology
  * as [[Dedup.hashA]]/[[Dedup.hashB]]: both the Spark plan and the DuckDB
  * oracle read the very same literals, so bucket ids — and therefore the
  * exact candidate sets — reproduce bit-identically cross-engine. Sign
  * projections are a standard LSH family (Charikar, STOC'02); ±1/√d keeps
  * the plane unit-norm so `bucketLength` means the same thing it does for
  * MLlib's unit gaussian planes.
  *
  * Bucket id = floor(round(⟨v, plane_t⟩ / bucketLength, 6)) — the round(…,6)
  * quantizes away cross-engine ulp drift before the discontinuous floor, the
  * same defense the oracle-compared distance columns use.
  */
object RpLsh {

  /** +1 or −1 for (hash table, dimension): parity of the first md5 byte. */
  def sign(table: Int, j: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"rp_${table}_$j".getBytes(StandardCharsets.UTF_8))
    if ((d(0) & 1) == 0) 1 else -1
  }

  /** Unit-norm projection plane for hash table `table`: entries ±1/√dim. */
  def plane(table: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => sign(table, j) / math.sqrt(dim.toDouble))

  /** One (id, tbl, bucket) row per input row per hash table. Pure codegen'd
    * column arithmetic — the projection is a fold over a literal array, no
    * UDF, no RNG, no fitted model to ship. */
  def bucketize(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bucketLength: Double, numTables: Int): DataFrame = {
    require(dim > 0 && bucketLength > 0 && numTables > 0,
      s"dim $dim / bucketLength $bucketLength / numTables $numTables must be positive")
    val vd = df.select(col(idCol), col(vecCol).cast("array<double>").as("__vd"))
    val tbls = (0 until numTables).map { t =>
      val proj = dotProduct(col("__vd"), lit(plane(t, dim).toArray))
      struct(lit(t).as("tbl"),
        floor(round(proj / bucketLength, 6)).cast("long").as("bucket"))
    }
    vd.select(col(idCol), explode(array(tbls: _*)).as("__h"))
      .select(col(idCol), col("__h.tbl").as("tbl"), col("__h.bucket").as("bucket"))
  }

  /** DuckDB list literal for [[plane]] — Double.toString round-trips, so the
    * SQL parser reconstructs bit-identical doubles. */
  def planeSql(table: Int, dim: Int): String =
    plane(table, dim).mkString("[", ", ", "]")

  /** DuckDB mirror of [[bucketize]] over relation `rel`: a UNION ALL of one
    * SELECT per hash table, columns (idSql, tbl, bucket). */
  def bucketsSql(rel: String, idSql: String, vecSql: String, dim: Int,
      bucketLength: Double, numTables: Int): String =
    (0 until numTables).map { t =>
      s"""SELECT $idSql, $t AS tbl,
         |    CAST(floor(round(list_dot_product($vecSql, ${planeSql(t, dim)}) / $bucketLength, 6)) AS BIGINT) AS bucket
         |  FROM $rel""".stripMargin
    }.mkString("\n  UNION ALL ")
}
