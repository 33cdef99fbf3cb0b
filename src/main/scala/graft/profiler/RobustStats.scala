package graft.profiler

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType}

/** Winsorized (quantile-clipped) robust statistics (E70).
  *
  * Web-scale numeric metadata (token counts, byte sizes, scores) is
  * heavy-tailed enough that a handful of outliers dominate plain
  * mean/stddev; curation thresholds derived from them drift run to run.
  * The standard robust alternative clips every value into the exact
  * [p_lo, p_hi] quantile envelope before the moments — bounds, clipped
  * mean, clipped population stddev, and how many values were clipped.
  *
  * Two global aggregation passes over one shared spread() exchange
  * (computed once, reused as a skipped stage): (1) the exact-percentile
  * bounds pass, column-chunked into concurrent jobs so the sketch
  * aggregates' single-threaded final merges overlap (the ScanMetrics
  * Sketch-pass recipe; the 2·C doubles come to the driver —
  * metadata-sized, R14 policy); (2) one wide clipped-moment pass with
  * the bounds inlined as literals.
  * Moments use the decSum contract (addends quantized to DECIMAL(38,6))
  * so the result is partition-order independent and hash-matches the
  * DuckDB twin built from the same QUANTILE_CONT + LEAST/GREATEST
  * algebra.
  */
object RobustStats {

  private val Dec = DataTypes.createDecimalType(38, 6)

  private def decSum(c: Column): Column =
    sum(c.cast(Dec)).cast(DoubleType)

  /** (instance, name, value) triples per numeric column:
    * WinsorizedLow-p, WinsorizedHigh-p, WinsorizedMean-lo-hi,
    * WinsorizedStdDev-lo-hi, WinsorizedClipped-lo-hi. Columns whose
    * percentile is null (all-null column) contribute no rows. */
  def winsorizedStats(
      df: DataFrame, cols: Seq[String],
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(cols.nonEmpty, "winsorizedStats needs at least one column")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val spark = df.sparkSession
    import spark.implicits._

    // The exact-percentile aggregates are TypedImperativeAggregate value
    // maps: spread() buys the partial phase row-group parallelism (the
    // ScanMetrics Sketch-pass lesson), and chunking the columns into a few
    // concurrent jobs overlaps their single-threaded final merges — the
    // spread exchange is computed once and reused as a skipped stage by
    // the later jobs (including the moment pass below).
    val src = ScanMetrics.spread(df)
    val bRows: Seq[(String, Row)] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val jobs = cols.grouped(2).toSeq.map { group =>
        val aggs = group.map(c =>
          percentile(col(c).cast(DoubleType), array(lit(pLo), lit(pHi))).as(c))
        group -> Future(scala.concurrent.blocking {
          src.agg(aggs.head, aggs.tail: _*).head()
        })
      }
      jobs.flatMap { case (group, fut) =>
        val row = Await.result(fut, Duration.Inf)
        group.map(c => c -> row)
      }
    }
    val bounds: Seq[(String, (Double, Double))] = bRows.flatMap {
      case (c, row) =>
        val i = row.fieldIndex(c)
        if (row.isNullAt(i)) None
        else { val a = row.getSeq[Double](i); Some(c -> (a(0), a(1))) }
    }

    val momentAggs: Seq[Column] = bounds.flatMap { case (c, (lo, hi)) =>
      val x = col(c).cast(DoubleType)
      // explicit null branch: Spark's greatest/least SKIP null arguments,
      // so greatest(null, lo) would silently turn null values into lo
      val clip = when(x.isNull, lit(null).cast(DoubleType))
        .otherwise(least(greatest(x, lit(lo)), lit(hi)))
      Seq(
        decSum(clip).as(s"${c}__sum"),
        decSum(clip * clip).as(s"${c}__sumsq"),
        count(x).as(s"${c}__n"),
        count(when(x < lit(lo) || x > lit(hi), lit(1))).as(s"${c}__clipped"))
    }
    val m = src.agg(momentAggs.head, momentAggs.tail: _*).head()

    val lof = pLo.toString
    val hif = pHi.toString
    val rows = bounds.flatMap { case (c, (lo, hi)) =>
      val sumV = m.getAs[Double](s"${c}__sum")
      val sumSq = m.getAs[Double](s"${c}__sumsq")
      val n = m.getAs[Long](s"${c}__n")
      val clipped = m.getAs[Long](s"${c}__clipped")
      if (n == 0) Nil
      else {
        val mean = sumV / n
        val variance = math.max(sumSq / n - mean * mean, 0.0)
        Seq(
          (c, s"WinsorizedLow-$lof", lo),
          (c, s"WinsorizedHigh-$hif", hi),
          (c, s"WinsorizedMean-$lof-$hif", mean),
          (c, s"WinsorizedStdDev-$lof-$hif", math.sqrt(variance)),
          (c, s"WinsorizedClipped-$lof-$hif", clipped.toDouble))
      }
    }
    rows.toDF("instance", "name", "value")
      .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
  }

  /** Per-group exact quantiles (E82) — the per-domain length/quality
    * percentile table (p50/p95 doc length per source, score quartiles per
    * language) that whole-table quantiles (N8) and per-domain MEANS (E74)
    * both miss: curation cutoffs are set per source, and a domain whose
    * p99 length is 100× its p50 needs different chunking than a uniform
    * one.
    *
    * ONE groupBy(group) pass: Spark's exact `percentile` aggregate
    * (interpolating, the N8-twin contract already hash-proven against
    * DuckDB's QUANTILE_CONT) carries a per-group value buffer, so memory
    * is bounded by per-group DISTINCT values — right for metadata-sized
    * value domains (lengths, scores). At 100 TB with adversarial group
    * counts the documented scale path is the same battery over KLL
    * sketches (graft_kll_merge_agg, E19) — approximate per-group
    * quantiles, this exact pass as the spot-verifier. Null group values
    * form their own group; null values are ignored by both engines'
    * quantile aggregates. */
  def groupedQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles must be in [0, 1]")
    val aggs = count(col(valueCol)).as("n") +: ps.map(p =>
      round(percentile(col(valueCol), lit(p)), 6)
        .as(s"p${(p * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
