package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole forked test JVM — suites must
  * not stop() it (sbt runs all suites in the single forked JVM). */
object SparkTestSession {
  lazy val get: SparkSession = {
    // Tuning(...) keeps the test session's AQE posture identical to
    // Bench/Verify so plan-shape pins exercise the shipped configuration.
    val s = Tuning(SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.get

  def assertNear(a: Double, b: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(a - b) <= tol, s"$a !≈ $b (tol $tol)")
}
