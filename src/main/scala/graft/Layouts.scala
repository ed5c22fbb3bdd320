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

  /** Run `build` once for (session, key); later calls return the memoized
    * result. */
  def once[T](s: SparkSession, key: String)(build: => T): T = synchronized {
    reg.find { case (sess, k, _) => (sess eq s) && k == key } match {
      case Some((_, _, v)) => v.asInstanceOf[T]
      case None =>
        val v = build
        reg += ((s, key, v))
        v
    }
  }

  /** Deterministic pid-suffixed identifier for `dir`-scoped table names and
    * paths (hex of the dir's name-UUID + this JVM's pid). */
  def tag(dir: String): String =
    java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))
        .getMostSignificantBits) + s"_p${ProcessHandle.current().pid()}"
}
