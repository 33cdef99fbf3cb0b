package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.profiler._

/** The batched (stack-based, one-shuffle) frequency path and the
  * per-column reference path must agree exactly — they implement the same
  * §2.A semantics and must not drift apart. */
class FreqConsistencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batched == per-column on a null-heavy mixed frame") {
    import spark.implicits._
    val df = Seq(
      ("a", "x"), ("a", null), ("b", "x"), (null, "y"),
      ("a", "x"), ("c", null), (null, null), ("NullValue", "y"))
      .toDF("s1", "s2")
    val fams = Profiler.freqFamilies
    val batched = FreqMetrics.batched(df, Seq("s1", "s2"), fams, noOfBins = 10, n = 8L)
    val perCol = Seq("s1", "s2").flatMap { c =>
      FreqMetrics.metrics(df, c, fams) ++ FreqMetrics.histogram(df, c, 10, 8L)
    }
    assert(batched.toSet == perCol.toSet,
      s"batched:\n${batched.sortBy(r => (r.instance, r.name)).mkString("\n")}\n" +
        s"perCol:\n${perCol.sortBy(r => (r.instance, r.name)).mkString("\n")}")
    // the genuine "NullValue" string and real nulls merge into one bucket
    val nvAbs = batched.collect {
      case MetricRow(_, "s1", "Histogram.abs.NullValue", v) => v
    }
    assert(nvAbs == Seq(3.0)) // 2 nulls + 1 literal "NullValue"
  }
}
