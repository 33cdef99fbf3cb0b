package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Equi-width numeric histogram — the numeric-binning complement of the
  * battery's categorical Histogram (reference/Deequ Histogram buckets by
  * distinct VALUE, useless for high-cardinality numerics). Two passes:
  * a 1-row min/max aggregate broadcast back, then a map-side bucket
  * assignment + hash aggregation on the bucket id — the classic
  * two-scan OLAP histogram; no sort, no per-value state.
  *
  * Bucket math is pure double arithmetic shared verbatim with the oracle;
  * the top edge closes into the last bucket (`least(…, bins-1)`), and a
  * constant column (min = max) degenerates to a single bucket 0 via a
  * guard that also dodges the ANSI divide-by-zero. Empty buckets emit no
  * row (same on both engines). NaN values are excluded up front: a single
  * NaN sorts above every double in Spark, so it would otherwise become
  * `max` and poison the width and every bucket edge. */
object NumericHistogram {

  /** The equi-width bucket id for value `v` given broadcast `mn`/`mx`
    * columns — ONE definition shared by [[equiWidth]] and the PSI drift
    * scorer (Checks.histogramDrift), so the two cannot disagree on
    * identical data. */
  private[profiler] def bucketExpr(v: Column, mn: Column, mx: Column, bins: Int): Column =
    when(
      mx > mn,
      least(floor((v.cast(DoubleType) - mn) / ((mx - mn) / lit(bins.toDouble))),
        lit((bins - 1).toLong)))
      .otherwise(lit(0L))

  /** Drop NULLs, NaNs and ±Infinity before any min/max or bucketing — an
    * infinite value as mn/mx would make the bucket width infinite and
    * collapse every finite row into bucket 0 (masking real drift in
    * histogramDrift), the same poisoning as NaN. */
  private[profiler] def finite(v: Column): Column = {
    val d = v.cast(DoubleType)
    v.isNotNull && !isnan(d) && abs(d) =!= lit(Double.PositiveInfinity)
  }

  def equiWidth(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val clean = df.where(finite(col(c)))
    val stats = clean.agg(
      min(col(c)).cast(DoubleType).as("mn"),
      max(col(c)).cast(DoubleType).as("mx"))
    val w = (col("mx") - col("mn")) / lit(bins.toDouble)
    clean
      .crossJoin(broadcast(stats))
      .select(bucketExpr(col(c), col("mn"), col("mx"), bins).as("bucket"), col("mn"), col("mx"))
      .groupBy("bucket", "mn", "mx")
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bucket"),
        round(col("mn") + col("bucket").cast(DoubleType) * w, 6).as("lo"),
        round(col("mn") + (col("bucket") + 1).cast(DoubleType) * w, 6).as("hi"),
        col("cnt"))
  }
}
