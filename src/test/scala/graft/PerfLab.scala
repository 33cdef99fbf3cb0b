package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only micro-benchmark harness (test scope, not shipped): times
  * alternative plans for the slow scan-battery singles in one JVM so host
  * noise and sbt startup don't drown the signal.
  *
  * Run: `sbt "Test/runMain graft.PerfLab"`
  */
object PerfLab {
  def time(label: String, warm: Int = 1, reps: Int = 3)(f: => Unit): Unit = {
    (1 to warm).foreach(_ => f)
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"$label%-40s min ${ts.min}%6.2f  med ${ts.sorted.apply(reps / 2)}%6.2f")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = graft.OracleSql.Lineitem.profiled

    // A: current shape — count_distinct slots in one wide agg (Expand x10)
    def variantA(): Unit = {
      val aggs = cols.map(c =>
        (count_distinct(col(c)).cast("double") / count(col(c))).as(s"d_$c"))
      li.agg(aggs.head, aggs.tail: _*).head()
    }

    // B: stacked narrow relation, one distinct group per column key
    def variantB(): Unit = {
      val stackArgs = lit(cols.size) +: cols.flatMap(c =>
        Seq(lit(c), col(c).cast("string")))
      li.select(stack(stackArgs: _*).as(Seq("instance", "v")))
        .groupBy("instance")
        .agg(count_distinct(col("v")).cast("double") / count(col("v")))
        .collect()
    }

    // C: explicit two-phase dedup then count
    def variantC(): Unit = {
      val stackArgs = lit(cols.size) +: cols.flatMap(c =>
        Seq(lit(c), col(c).cast("string")))
      li.select(stack(stackArgs: _*).as(Seq("instance", "v")))
        .where(col("v").isNotNull)
        .groupBy("instance", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("instance")
        .agg((count(lit(1)).cast("double") / sum(col("cnt"))).as("d"))
        .collect()
    }

    import graft.profiler.{ProfilerConfig, ScanMetrics}
    def battery(fams: Set[String]): Unit = {
      val slots = ScanMetrics.slots(li.schema, ProfilerConfig(), fams)
      ScanMetrics.compute(li, slots)
      ()
    }

    time("distinct A: wide agg Expand")(variantA())
    time("distinct B: stacked one-distinct")(variantB())
    time("distinct C: stacked two-phase")(variantC())
    time("battery distinctness (current)")(battery(Set("distinctness")))
    time("battery mean")(battery(Set("mean")))
    time("battery stddev_pop")(battery(Set("stddev_pop")))
    time("battery sum")(battery(Set("sum")))
    time("battery min+max")(battery(Set("minimum", "maximum")))

    // cost decomposition of the guarded stddev tree
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val Dec = DecimalType(38, 6)
    def xd(c: String) = col(c).cast(DoubleType)
    val nums = graft.OracleSql.Lineitem.numeric
    def headOf(aggs: Seq[org.apache.spark.sql.Column]): Unit = {
      li.agg(aggs.head, aggs.tail: _*).head(); ()
    }
    time("stddev fallback only (stddev_pop)")(
      headOf(nums.map(c => stddev_pop(xd(c)))))
    time("decimal sum only")(
      headOf(nums.map(c => try_sum(col(c).cast(Dec)))))
    time("decimal sumsq only")(
      headOf(nums.map(c => try_sum((xd(c) * xd(c)).cast(Dec)))))
    time("guard counts only")(
      headOf(nums.flatMap(c => Seq(
        count(col(c)), count(when(abs(xd(c)) <= 1e19, lit(1)))))))
    time("double sumsq only")(
      headOf(nums.map(c => sum(xd(c) * xd(c)))))

    // how many aggregate buffers does the guarded stddev tree really plan?
    val slots = ScanMetrics.slots(li.schema, ProfilerConfig(), Set("stddev_pop"))
    val aliased = slots.zipWithIndex.map { case (s, i) => s.expr.alias(s"m$i") }
    val plan = li.agg(aliased.head, aliased.tail: _*)
      .queryExecution.executedPlan.toString
    val nFuncs = "(?s)functions=\\[(.*?)\\]".r.findFirstMatchIn(plan)
      .map(_.group(1).split(",").length).getOrElse(-1)
    println(s"stddev_pop plan aggregate functions: $nFuncs")
    spark.stop()
  }
}
