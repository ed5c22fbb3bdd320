package graft

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.SparkSession

/** Once-per-(session, key) builder memo for DDL-ish layouts — bucketed
  * tables, persisted dedup indexes, matrix exports — so the one-time build
  * runs once per JVM and Bench can attribute it to its producer query.
  *
  * Entries key on the SparkSession BY REFERENCE (`eq`), the same discipline
  * as [[Caches]]: an identity-hash key could be reused by a new session
  * after the old one is GC'd and hand out table names registered in a dead
  * catalog. [[tag]] folds the process id into path/table identifiers so
  * concurrent JVMs (bench + verify over one sfDir) never race on shared
  * /tmp files.
  */
object Layouts {

  private val reg = ArrayBuffer.empty[(SparkSession, String, Any)]

  /** Per-(session, key) build gates: [[once]] must not hold the registry
    * lock across `build` (a build is minutes of Spark jobs), or two
    * INDEPENDENT builds could never overlap — guide §2.6's idle-tail
    * back-fill, which pq_train_build uses to run its two Lloyd fits
    * concurrently. Same key still builds exactly once: the gate serializes
    * per key, and the post-acquire re-check handles the losing racer. An
    * identity-hash collision between two sessions only over-serializes
    * (never mis-shares — the registry lookup is still `eq`-exact). */
  private val gates = scala.collection.mutable.Map.empty[String, Object]

  /** Run `build` once for (session, key); later calls return the memoized
    * result. Concurrent callers of DIFFERENT keys build in parallel;
    * concurrent callers of the SAME key serialize on its gate. */
  def once[T](s: SparkSession, key: String)(build: => T): T = {
    def lookup: Option[Any] = synchronized(
      reg.find { case (sess, k, _) => (sess eq s) && k == key }.map(_._3))
    lookup match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val gate = synchronized(
          gates.getOrElseUpdate(s"${System.identityHashCode(s)}:$key", new Object))
        gate.synchronized {
          lookup match {
            case Some(v) => v.asInstanceOf[T]
            case None =>
              val v = build
              synchronized { reg += ((s, key, v)) }
              v
          }
        }
    }
  }

  /** Whether a [[once]] entry is live for (session, key) — test surface for
    * the cold-rerun invalidation pins. */
  def has(s: SparkSession, key: String): Boolean =
    synchronized(reg.exists { case (sess, k, _) => (sess eq s) && k == key })

  /** Registry watermark — pair with [[createdSince]]; the [[Caches.mark]]
    * twin for the DDL-ish builds (every build here is overwrite-shaped —
    * DROP TABLE IF EXISTS / mode("overwrite") — so re-running one after
    * [[invalidate]] is safe and re-pays the one-time cost, which is exactly
    * what [[graft.Bench]]'s cold breach rerun needs). */
  def mark(): Int = synchronized(reg.size)

  /** The (session, key) pairs registered after `m`. */
  def createdSince(m: Int): Seq[(SparkSession, String)] =
    synchronized(reg.drop(m).map { case (s, k, _) => (s, k) }.toSeq)

  /** Forget exactly the entries named in `keys`: the next [[once]] on the
    * same (session, key) re-runs its builder. */
  def invalidate(keys: Seq[(SparkSession, String)]): Unit = synchronized {
    reg.filterInPlace { case (s, k, _) =>
      !keys.exists { case (es, ek) => (es eq s) && ek == k } }
  }

  private val FpKey = "graft.model.fingerprint"

  /** MD5 hex of a fingerprint payload — ONE digest implementation for
    * every stored-layout stamp, so the formats can't drift apart. */
  def md5Hex(payload: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Stamp the model/parameter fingerprint a stored layout was built under
    * as a table property — the append paths' compatibility witness. */
  def stampFingerprint(s: SparkSession, tableName: String, fp: String): Unit =
    s.sql(s"ALTER TABLE $tableName SET TBLPROPERTIES ('$FpKey' = '$fp')")

  /** The stamped fingerprint of a table, if any — maintenance ops that
    * REWRITE a layout (compaction) read it first and re-stamp after.
    * Tolerant of non-catalog relations (temp views have no table
    * properties and SHOW TBLPROPERTIES throws on them): no catalog entry
    * simply means no stamp — the lenient legacy path. */
  def readFingerprint(s: SparkSession, tableName: String): Option[String] =
    scala.util.Try(
      s.sql(s"SHOW TBLPROPERTIES $tableName")
        .filter(org.apache.spark.sql.functions.col("key") === FpKey)
        .collect().headOption.map(_.getString(1))
    ).toOption.flatten

  /** Enforce that an O(delta) append runs under the SAME fingerprint the
    * base build stamped: a delta encoded against re-fitted models/params is
    * a silently incompatible code space — fail loudly instead. Tables
    * without a stamp (pre-fingerprint layouts) pass, preserving
    * compatibility with externally-created tables. */
  def checkFingerprint(s: SparkSession, tableName: String, fp: String,
      what: String): Unit = {
    val stored = readFingerprint(s, tableName)
    stored.foreach(st => require(st == fp,
      s"$what: append models/params do not match the stored layout's build " +
        s"(stored fingerprint $st, append $fp) — re-fitting requires a " +
        "rebuild, not an append"))
  }

  /** Deterministic pid-suffixed identifier for `dir`-scoped table names and
    * paths (hex of the dir's name-UUID + this JVM's pid). */
  def tag(dir: String): String =
    java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))
        .getMostSignificantBits) + s"_p${ProcessHandle.current().pid()}"
}
