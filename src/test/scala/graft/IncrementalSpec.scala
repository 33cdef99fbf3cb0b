package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.profiler.IncrementalProfiler

/** Mergeable incremental profiling: merged partial states must reproduce
  * the whole-table profile exactly (for the exact metrics) regardless of
  * how the data was split or in which order states merge. */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def metricMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("merge of disjoint splits equals the whole-table snapshot, any merge order") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val whole = metricMap(
      IncrementalProfiler.metrics(IncrementalProfiler.snapshot(li)))
    val parts = (0 until 3).map(i =>
      IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 3 === i)))
    val mergedA = metricMap(
      IncrementalProfiler.metrics(IncrementalProfiler.merge(parts)))
    val mergedB = metricMap(
      IncrementalProfiler.metrics(IncrementalProfiler.merge(parts.reverse)))
    val exact = Set(
      "Completeness", "Mean", "Sum", "StandardDeviation", "Minimum", "Maximum", "Size")
    for ((k @ (_, name), v) <- whole if exact(name)) {
      assert(mergedA(k) == v, s"$k merged != whole")
      assert(mergedB(k) == v, s"$k merge order changed the value")
    }
    // sketch estimates merge too (union semantics): within HLL error of exact
    val exactDistinct = li.select(countDistinct(col("l_orderkey"))).head().getLong(0).toDouble
    val est = mergedA(("l_orderkey", "ApproxCountDistinct"))
    assert(math.abs(est - exactDistinct) / exactDistinct < 0.05,
      s"HLL union estimate $est vs exact $exactDistinct")
  }

  test("merged KLL quantiles track the whole-table exact percentiles") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val parts = (0 until 3).map(i =>
      IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 3 === i)))
    val merged = metricMap(
      IncrementalProfiler.metrics(IncrementalProfiler.merge(parts)))
    val ps = graft.profiler.ScanMetrics.quantilePs(10)
    val exact = li.select(
      percentile(col("l_quantity"), array(ps.map(lit): _*)).as("q")).head()
      .getSeq[Double](0)
    // l_quantity spans 1..50; KLL rank error ~1.65% -> value tolerance ~1
    // on a uniform column, widened for sampling slack
    ps.zip(exact).foreach { case (p, ex) =>
      val est = merged(("l_quantity", s"ApproxQuantiles-$p"))
      assert(math.abs(est - ex) <= 3.0, s"p=$p est=$est exact=$ex")
    }
  }
}
