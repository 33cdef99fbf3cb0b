package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Mergeable incremental profiling (SURVEY.md §4.4 optional extension —
  * the 100 TB operating mode): profile each partition/day/ingest batch
  * independently into a compact mergeable STATE relation, then combine
  * states without ever rescanning the data.
  *
  * State per numeric column:
  * `(instance, n, nn, dec_sum, oor, dec_sum_sq, oor_sq, mn, mx, hll, kll)`
  * — every field merges associatively (sums, min/max, Apache DataSketches
  * HLL union via `hll_union_agg`, KLL quantile-sketch merge via
  * [[graft.functions.KllAggs]]). A year of daily 300 GB snapshots merges
  * in milliseconds; the reference (and Deequ 1.0.2) must rescan the table.
  * The state covers the full mergeable half of the scan battery — Size,
  * Completeness, Sum, Mean, StandardDeviation, Minimum, Maximum exactly,
  * ApproxCountDistinct and ApproxQuantiles with bounded error; only the
  * exact-frequency family (CountDistinct/Entropy/Histogram/Uniqueness),
  * which provably needs the full value dictionary, requires a rescan.
  *
  * Metric parity: Size/Completeness/Sum/Mean/StandardDeviation/Minimum/
  * Maximum derived from a merged state are EXACTLY the whole-table values:
  * the sums quantize each addend to DECIMAL(38,6) straight from the native
  * column type (no double hop, so bigints beyond 2^53 stay exact), and
  * decimal aggregation is order- and partition-independent. This is what
  * the `incremental_profile` oracle asserts by splitting lineitem in two,
  * merging, and hash-matching the whole-table DuckDB result.
  *
  * ANSI safety at scale mirrors [[ScanMetrics]]: addends are range-guarded
  * (|x| ≤ 1e19 for sums, ≤ 1e15 for squares) and aggregated with `try_sum`,
  * so a pathological column cannot crash a snapshot; `oor`/`oor_sq` count
  * the guarded-out values and any overflow nulls propagate through merge,
  * so an inexact column silently omits its Sum/Mean/StandardDeviation rows
  * instead of reporting a wrong exact value. ApproxCountDistinct uses the
  * DataSketches estimate (mergeable, unlike HLL++ `approx_count_distinct`
  * buffers).
  */
object IncrementalProfiler {

  private val Dec = DecimalType(38, 6)
  // Same exact-path bounds as the scan battery (ScanMetrics.SumAbsBound /
  // SqAbsBound): sums of 10^12 in-range rows stay inside DECIMAL(38,6).
  private val SumAbsBound = 1e19
  private val SqAbsBound = 1e15

  /** One pass over the table: numeric columns stacked to
    * `(instance, v, vd, sq)` tuples, grouped by column — a single shuffle
    * of partial states. `vd` casts the NATIVE value to DECIMAL(38,6)
    * (exact for any in-range integral or decimal; quantizes doubles like
    * the oracle's `CAST(c AS DECIMAL(38,6))`); `sq` matches ScanMetrics'
    * square form `CAST(double(c) * double(c) AS DECIMAL(38,6))`. */
  def snapshot(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
      .filter(f => ColumnClass.of(f.dataType) == ColumnClass.Numeric)
      .map(_.name).toSeq
    require(cols.nonEmpty, "no numeric columns to profile")
    val stackArgs: Seq[Column] =
      lit(cols.size) +: cols.flatMap { c =>
        val xd = col(c).cast(DoubleType)
        Seq(
          lit(c),
          xd,
          when(abs(xd) <= SumAbsBound, col(c).cast(Dec)),
          when(abs(xd) <= SqAbsBound, (xd * xd).cast(Dec)))
      }
    df.select(stack(stackArgs: _*).as(Seq("instance", "v", "vd", "sq")))
      .groupBy("instance")
      .agg(
        count(lit(1)).as("n"),
        count(col("v")).as("nn"),
        try_sum(col("vd")).as("dec_sum"),
        count(when(col("v").isNotNull && col("vd").isNull, lit(1))).as("oor"),
        try_sum(col("sq")).as("dec_sum_sq"),
        count(when(col("v").isNotNull && col("sq").isNull, lit(1))).as("oor_sq"),
        min(col("v")).as("mn"),
        max(col("v")).as("mx"),
        // DataSketches HLL takes int/long/string/binary only; the string
        // form of a double is injective, so distinct counts are preserved
        hll_sketch_agg(col("v").cast("string")).as("hll"),
        // mergeable KLL quantile sketch — percentile_approx buffers cannot
        // be persisted across batches; this can (see KllAggs)
        graft.functions.KllAggs.kllSketchAgg(col("v")).as("kll"))
  }

  /** Combine any number of state relations — associative and commutative,
    * so states can merge across days, partitions or clusters in any order.
    * A snapshot whose decimal total overflowed (`try_sum` → null with
    * nn > 0) poisons the merged total to null rather than being silently
    * skipped by `sum`'s null-ignoring semantics. */
  def merge(states: Seq[DataFrame]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy("instance")
      .agg(
        sum(col("n")).as("n"),
        sum(col("nn")).as("nn"),
        count(when(col("dec_sum").isNull && col("nn") > 0, lit(1))).as("sum_bad"),
        try_sum(col("dec_sum")).as("dec_sum_raw"),
        sum(col("oor")).as("oor"),
        count(when(col("dec_sum_sq").isNull && col("nn") > 0, lit(1))).as("sq_bad"),
        try_sum(col("dec_sum_sq")).as("dec_sum_sq_raw"),
        sum(col("oor_sq")).as("oor_sq"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"),
        hll_union_agg(col("hll")).as("hll"),
        graft.functions.KllAggs.kllMergeAgg(col("kll")).as("kll"))
      .select(
        col("instance"), col("n"), col("nn"),
        when(col("sum_bad") === 0, col("dec_sum_raw")).as("dec_sum"),
        col("oor"),
        when(col("sq_bad") === 0, col("dec_sum_sq_raw")).as("dec_sum_sq"),
        col("oor_sq"),
        col("mn"), col("mx"), col("hll"), col("kll"))

  /** Metrics relation from a (possibly merged) state — no data scan.
    * Sum/Mean/StandardDeviation appear only when the exact decimal path
    * held end to end (no out-of-range addends, no overflow);
    * ApproxQuantiles come from the merged KLL sketch (error-bounded,
    * declared approximate like ApproxCountDistinct). */
  def metrics(state: DataFrame, quantiles: Int = 10): DataFrame = {
    val sumOk = col("nn") > 0 && col("oor") === 0 && col("dec_sum").isNotNull
    val sqOk = sumOk && col("oor_sq") === 0 && col("dec_sum_sq").isNotNull
    val sumD = col("dec_sum").cast(DoubleType)
    val sqD = col("dec_sum_sq").cast(DoubleType)
    val perCol = state.select(
      col("instance"),
      when(col("n") > 0, col("nn").cast(DoubleType) / col("n")).as("Completeness"),
      when(sumOk, sumD / col("nn")).as("Mean"),
      when(sumOk, sumD).as("Sum"),
      when(sqOk,
        sqrt(greatest(sqD / col("nn") - pow(sumD / col("nn"), lit(2)), lit(0.0))))
        .as("StandardDeviation"),
      col("mn").as("Minimum"),
      col("mx").as("Maximum"),
      hll_sketch_estimate(col("hll")).cast(DoubleType).as("ApproxCountDistinct"))
    val names = Seq(
      "Completeness", "Mean", "Sum", "StandardDeviation",
      "Minimum", "Maximum", "ApproxCountDistinct")
    val unpivoted = perCol.select(
      col("instance"),
      explode(array(names.map(n => struct(lit(n).as("name"), col(n).as("value"))): _*)).as("m"))
      .select(col("instance"), col("m.name").as("name"), col("m.value").as("value"))
      .where(col("value").isNotNull)
    val sizeRow = state.agg(max(col("n")).cast(DoubleType).as("value"))
      .select(lit("*").as("instance"), lit(MetricNames.Size).as("name"), col("value"))
    val ps = ScanMetrics.quantilePs(quantiles)
    // sketch decode runs on the metric-sized state relation (one row per
    // column), never the data path — a udf is fine here
    val qUdf = udf((bytes: Array[Byte]) =>
      graft.functions.KllAggs.quantiles(bytes, ps).orNull)
    val qNames = array(ps.map(p => lit(MetricNames.approxQuantile(p))): _*)
    val quantRows = state
      .select(col("instance"), qUdf(col("kll")).as("qs"))
      .where(col("qs").isNotNull)
      .select(col("instance"), qNames.as("names"), posexplode(col("qs")).as(Seq("i", "value")))
      .select(
        col("instance"),
        element_at(col("names"), col("i") + 1).as("name"),
        col("value"))
    unpivoted.unionByName(sizeRow).unionByName(quantRows)
  }
}
