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
  * ("rp_<table>_<plane>_<dim index>"), the same constants-interpolated-into-SQL
  * methodology as [[Dedup.hashA]]/[[Dedup.hashB]]: both the Spark plan and the
  * DuckDB oracle read the very same literals, so bucket ids — and therefore
  * the exact candidate sets — reproduce bit-identically cross-engine. Sign
  * projections are a standard LSH family (Charikar, STOC'02); ±1/√d keeps
  * the plane unit-norm so `bucketLength` means the same thing it does for
  * MLlib's unit gaussian planes.
  *
  * AND/OR composition (the E2LSH construction): each of the `numTables` hash
  * tables quantizes `numPlanes` INDEPENDENT projections and its bucket key is
  * the tuple of all of them — a p-dimensional grid cell, not a 1-D slab.
  * Collision probability per table falls exponentially in `numPlanes`
  * (AND-amplification: only genuinely close pairs survive every coordinate),
  * while the OR over tables buys recall back. A single plane per table
  * (numPlanes = 1) degenerates to 1-D slabs that run fat on correlated
  * corpora, turning the downstream bucket self-join quadratic — the exact
  * failure mode ivfflat's `lists` parameter exists to avoid.
  *
  * Per-plane bucket id = floor(round(⟨v, plane_{t,p}⟩ / bucketLength, 6));
  * the round(…,6) quantizes away cross-engine ulp drift before the
  * discontinuous floor, the same defense the oracle-compared distance columns
  * use. The composed key is the ':'-joined decimal string of the per-plane
  * ids — string equality is engine-portable, and the join only ever tests
  * equality, never order.
  */
object RpLsh {

  /** +1 or −1 for (hash table, plane, dimension): parity of the first md5 byte. */
  def sign(table: Int, planeIdx: Int, j: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"rp_${table}_${planeIdx}_$j".getBytes(StandardCharsets.UTF_8))
    if ((d(0) & 1) == 0) 1 else -1
  }

  /** Unit-norm projection plane (table, planeIdx): entries ±1/√dim. */
  def plane(table: Int, planeIdx: Int, dim: Int): Seq[Double] =
    (0 until dim).map(j => sign(table, planeIdx, j) / math.sqrt(dim.toDouble))

  /** One (id, tbl, bucket) row per input row per hash table, bucket = the
    * AND-composed `numPlanes`-projection grid cell. Pure codegen'd column
    * arithmetic — each projection is a fold over a literal array, no UDF, no
    * RNG, no fitted model to ship.
    *
    * Fails fast (raise_error) on rows whose vector length ≠ `dim`: zip_with
    * pads the shorter array with nulls, so a silent mismatch would null every
    * projection and the downstream joins would return empty with no error —
    * while the DuckDB mirror errors loudly, splitting Spark and oracle.
    * NULL vectors pass through explicitly (size(null) is null, so without
    * the isNull branch the otherwise-raise would fire on them): their
    * projections are null in both engines, so they collapse into one
    * concat_ws bucket per table whose pairs die at the null-distance verify
    * — i.e. null-vector rows silently drop from join output, the pre-check
    * behavior. */
  def bucketize(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bucketLength: Double, numTables: Int, numPlanes: Int = 1): DataFrame = {
    require(dim > 0 && bucketLength > 0 && numTables > 0 && numPlanes > 0,
      s"dim $dim / bucketLength $bucketLength / numTables $numTables / numPlanes $numPlanes must be positive")
    val raw = col(vecCol).cast("array<double>")
    val checked = when(raw.isNull, raw)
      .when(size(raw) === dim, raw).otherwise(raise_error(concat(
      lit(s"RpLsh.bucketize: expected vectors of dim $dim, got "),
      size(raw).cast("string"))))
    val vd = df.select(col(idCol), checked.as("__vd"))
    val tbls = (0 until numTables).map { t =>
      val cells = (0 until numPlanes).map { p =>
        val proj = dotProduct(col("__vd"), lit(plane(t, p, dim).toArray))
        floor(round(proj / bucketLength, 6)).cast("long").cast("string")
      }
      struct(lit(t).as("tbl"), concat_ws(":", cells: _*).as("bucket"))
    }
    vd.select(col(idCol), explode(array(tbls: _*)).as("__h"))
      .select(col(idCol), col("__h.tbl").as("tbl"), col("__h.bucket").as("bucket"))
  }

  /** Multi-probe query-side buckets (Lv et al., VLDB 2007, simplified to
    * the unit perturbation set): per hash table, the base grid cell PLUS
    * every single-coordinate ±1 neighbor — (1 + 2·numPlanes) probes per
    * table. Near-boundary queries whose true neighbors landed one cell
    * over are recovered WITHOUT adding hash tables: probes multiply only
    * the (tiny) query side of the bucket join, while the corpus side —
    * the stored index, the thing that costs at 100 TB — is untouched.
    * Probe keys are pairwise distinct by construction (each differs in
    * exactly one coordinate), so no dedup pass is needed. Same output
    * shape as [[bucketize]]. */
  def bucketizeProbes(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bucketLength: Double, numTables: Int, numPlanes: Int = 1): DataFrame = {
    require(dim > 0 && bucketLength > 0 && numTables > 0 && numPlanes > 0,
      s"dim $dim / bucketLength $bucketLength / numTables $numTables / numPlanes $numPlanes must be positive")
    val raw = col(vecCol).cast("array<double>")
    val checked = when(raw.isNull, raw)
      .when(size(raw) === dim, raw).otherwise(raise_error(concat(
      lit(s"RpLsh.bucketizeProbes: expected vectors of dim $dim, got "),
      size(raw).cast("string"))))
    val vd = df.select(col(idCol), checked.as("__vd"))
    val probes = (0 until numTables).flatMap { t =>
      val cells = (0 until numPlanes).map { p =>
        val proj = dotProduct(col("__vd"), lit(plane(t, p, dim).toArray))
        floor(round(proj / bucketLength, 6)).cast("long")
      }
      val sets = Seq(cells) ++ (for {
        p <- 0 until numPlanes; d <- Seq(-1L, 1L)
      } yield cells.updated(p, cells(p) + lit(d)))
      sets.map(cs => struct(lit(t).as("tbl"),
        concat_ws(":", cs.map(_.cast("string")): _*).as("bucket")))
    }
    vd.select(col(idCol), explode(array(probes: _*)).as("__h"))
      .select(col(idCol), col("__h.tbl").as("tbl"), col("__h.bucket").as("bucket"))
  }

  /** DuckDB mirror of [[bucketizeProbes]]: UNION ALL of one SELECT per
    * (table, probe). */
  def probesSql(rel: String, idSql: String, vecSql: String, dim: Int,
      bucketLength: Double, numTables: Int, numPlanes: Int = 1): String =
    (0 until numTables).flatMap { t =>
      val cells = (0 until numPlanes).map { p =>
        s"CAST(floor(round(list_dot_product($vecSql, ${planeSql(t, p, dim)}) / $bucketLength, 6)) AS BIGINT)"
      }
      val sets = Seq(cells) ++ (for {
        p <- 0 until numPlanes; d <- Seq(-1, 1)
      } yield cells.updated(p, s"(${cells(p)} + ($d))"))
      sets.map(cs =>
        s"""SELECT $idSql, $t AS tbl,
           |    concat_ws(':', ${cs.mkString(",\n      ")}) AS bucket
           |  FROM $rel""".stripMargin)
    }.mkString("\n  UNION ALL ")

  /** Plane-family table id reserved for [[project]] so projection planes
    * never coincide with any LSH table's. */
  val ProjectionTable = 9999

  /** Johnson-Lindenstrauss random projection to `dimOut` dimensions: each
    * output component is ⟨v, plane_p⟩·√(dimIn/dimOut) over the same
    * md5-derived ±1/√dimIn planes the LSH family uses (sign projections
    * satisfy JL with the usual distortion bounds — Achlioptas, JCSS 2003),
    * so pairwise distances are preserved in expectation and the whole
    * transform replays in SQL. Pure per-row column arithmetic — no fitted
    * model, no shuffle; components round at 6 like every oracle-compared
    * distance. Output: (idCol, proj array<double>[dimOut]). */
  def project(df: DataFrame, idCol: String, vecCol: String, dimIn: Int,
      dimOut: Int): DataFrame = {
    require(dimIn > 0 && dimOut > 0 && dimOut <= dimIn,
      s"need 0 < dimOut $dimOut <= dimIn $dimIn")
    val scale = math.sqrt(dimIn.toDouble / dimOut)
    // Same guard as bucketize: a length-mismatched vector must raise, not
    // null every component while the DuckDB mirror errors loudly.
    val raw = col(vecCol).cast("array<double>")
    val checked = when(raw.isNull, raw)
      .when(size(raw) === dimIn, raw).otherwise(raise_error(concat(
        lit(s"RpLsh.project: expected vectors of dim $dimIn, got "),
        size(raw).cast("string"))))
    val vd = df.select(col(idCol), checked.as("__vd"))
    val comps = (0 until dimOut).map { p =>
      round(dotProduct(col("__vd"),
        lit(plane(ProjectionTable, p, dimIn).toArray)) * scale, 6)
    }
    vd.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** DuckDB mirror of one [[project]] component (0-based `p`). */
  def projectComponentSql(vecSql: String, dimIn: Int, dimOut: Int, p: Int): String = {
    val scale = math.sqrt(dimIn.toDouble / dimOut)
    s"round(list_dot_product($vecSql, ${planeSql(ProjectionTable, p, dimIn)}) * $scale, 6)"
  }

  /** DuckDB list literal for [[plane]] — Double.toString round-trips, so the
    * SQL parser reconstructs bit-identical doubles. */
  def planeSql(table: Int, planeIdx: Int, dim: Int): String =
    plane(table, planeIdx, dim).mkString("[", ", ", "]")

  /** DuckDB mirror of [[bucketize]] over relation `rel`: a UNION ALL of one
    * SELECT per hash table, columns (idSql, tbl, bucket). */
  def bucketsSql(rel: String, idSql: String, vecSql: String, dim: Int,
      bucketLength: Double, numTables: Int, numPlanes: Int = 1): String =
    (0 until numTables).map { t =>
      val cells = (0 until numPlanes).map { p =>
        s"CAST(floor(round(list_dot_product($vecSql, ${planeSql(t, p, dim)}) / $bucketLength, 6)) AS BIGINT)"
      }
      s"""SELECT $idSql, $t AS tbl,
         |    concat_ws(':', ${cells.mkString(",\n      ")}) AS bucket
         |  FROM $rel""".stripMargin
    }.mkString("\n  UNION ALL ")
}
