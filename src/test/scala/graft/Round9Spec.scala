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

  test("madOutliersApprox / iqrOutliersApprox: exact on sub-k data (KLL retains everything below k=200)") {
    import spark.implicits._
    // 1..100 plus two far outliers; n=102 < k, so sketch quantiles are
    // true order statistics and CDF lookups are exact counts
    val df = ((1 to 100).map(_.toDouble) ++ Seq(1e6, 1e6)).toDF("x")
    val m = graft.profiler.RobustStats.madOutliersApprox(df, Seq("x")).head()
    assert(m.getDouble(1) == 51.0)                     // median
    assert(m.getDouble(2) == 25.0)                     // MAD
    assert(m.getAs[Long]("n_below") == 0L)
    assert(m.getAs[Long]("n_above") == 2L)             // the two 1e6s
    val i = graft.profiler.RobustStats.iqrOutliersApprox(df, Seq("x")).head()
    assert(i.getDouble(1) == 26.0 && i.getDouble(2) == 77.0)  // q1, q3
    assert(i.getAs[Long]("n_below") == 0L)
    assert(i.getAs[Long]("n_above") == 2L)
    // all-null column: null stats, zero counts (mirrors the exact twins)
    val nulls = Seq.fill(5)(Option.empty[Double]).toDF("x")
    val nm = graft.profiler.RobustStats.madOutliersApprox(nulls, Seq("x")).head()
    assert(nm.isNullAt(1) && nm.getAs[Long]("n_above") == 0L)
    val ni = graft.profiler.RobustStats.iqrOutliersApprox(nulls, Seq("x")).head()
    assert(ni.isNullAt(1) && ni.getAs[Long]("n_below") == 0L)
  }

  test("winsorizedStatsApprox: exact bounds on sub-k data, moments from the same decSum pass") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val rows = graft.profiler.RobustStats
      .winsorizedStatsApprox(df, Seq("x")).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    // n=100 < k=200: sketch quantiles are true order statistics —
    // inclusive rank >= 0.01 selects 1, >= 0.99 selects 99
    assert(rows("WinsorizedLow-0.01") == 1.0)
    assert(rows("WinsorizedHigh-0.99") == 99.0)
    assert(rows("WinsorizedClipped-0.01-0.99") == 1.0)  // only 100 clips
    assert(rows("WinsorizedMean-0.01-0.99") == 50.49)   // (5050-1)/100
    assert(rows.contains("WinsorizedRankEps"))
    // all-null column contributes no rows (mirrors the exact twin)
    val nulls = Seq.fill(3)(Option.empty[Double]).toDF("x")
    assert(graft.profiler.RobustStats
      .winsorizedStatsApprox(nulls, Seq("x")).count() == 0L)
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
