package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed exact multi-quantile battery — the frequency-CDF execution
  * of Spark's `percentile` aggregate (r16 optimization, guide §1.2/§2.5).
  *
  * The built-in exact `percentile` is a TypedImperativeAggregate whose
  * state is a per-partition VALUE→COUNT map: every partial serializes its
  * whole map onto the shuffle wire and ONE thread deserializes, merges and
  * sorts all of them in the final merge. Probed at sf0.1 that single task
  * is 2-26 s per column chunk — the dominant cost of `quantiles_exact`,
  * `winsorized_stats`, `iqr_outliers` and `mad_outliers` — and at scale it
  * is a straight driver-shaped bottleneck (all distinct values of every
  * column through one JVM thread).
  *
  * Here the same numbers come from relational algebra, parallel and
  * skew-free end to end:
  *
  *   1. ONE codegen'd pass explodes the requested expressions to
  *      `(column-idx, value)` and hash-aggregates to per-value frequencies
  *      (map-side combined: the shuffle carries DISTINCT values per
  *      partition, never rows); the frequency relation is
  *      `localCheckpoint`ed — every later step reads the cached blocks;
  *   2. per-column totals `n` come to the driver (C longs), which fixes
  *      the target ranks `floor/ceil(p·(n−1))` as literals;
  *   3. the CDF is one cumulative-sum window over the cached frequency
  *      relation, KEYED by column index (never Exchange SinglePartition):
  *      per-column work is bounded by that column's DISTINCT count — the
  *      same quantity the value-map aggregate held in every partial —
  *      with columns in parallel instead of serialized through one merge
  *      thread (a fully balanced two-phase range-chunk cumsum was built
  *      and measured SLOWER at sf0.1: its 3 extra jobs of scheduling
  *      floor cost more than the skew it removed; revisit only if a
  *      single column's distinct set ever dominates a real profile);
  *   4. the two values bracketing each target rank fall out of one tiny
  *      keyed aggregation (`min(when(cum−cnt ≤ k < cum))`), ≤ 2·|ps|
  *      doubles per column to the driver;
  *   5. the driver interpolates with the EXACT arithmetic of
  *      `Percentile.getPercentile`: `position = p·(n−1)`;
  *      `(higher−position)·lower + (position−lower)·higher`, the same
  *      IEEE operations in the same order — results are bit-identical to
  *      the built-in aggregate (property-pinned by OptimizationR16Spec).
  *
  * Scale note: every stage is bounded by DISTINCT values per range chunk,
  * never by rows or by one column's value set; the only driver state is
  * per-chunk totals and the bracketing values. The approximate KLL twins
  * remain the declared 100 TB lanes; this is their exact oracle-twin made
  * parallel.
  */
object ExactQuantiles {

  /** Exact quantiles at `ps` for every named expression (cast to double),
    * over one shared scan. Returns, per input name, None when the column
    * has no non-null values, otherwise the `percentile`-identical values
    * in `ps` order. */
  def quantiles(
      src: DataFrame,
      exprs: Seq[(String, Column)],
      ps: Seq[Double]): Map[String, Option[Seq[Double]]] = {
    require(exprs.nonEmpty, "ExactQuantiles needs at least one expression")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "percentages must be in [0, 1]")
    val arr = array(exprs.map(_._2.cast(DoubleType)): _*)
    val freq = src
      .select(posexplode(arr).as(Seq("idx", "v")))
      .where(col("v").isNotNull)
      .groupBy("idx", "v")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)

    // per-column totals -> target ranks as driver literals
    val nMap: Map[Int, Long] = freq.groupBy("idx")
      .agg(sum("cnt").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (nMap.isEmpty) return exprs.map { case (name, _) => name -> None }.toMap

    // cumulative counts from ONE per-column window over the cached
    // frequency relation (keyed by column index — never a
    // single-partition exchange): each column's task is bounded by its
    // DISTINCT count, the same quantity the value-map aggregate held in
    // every partial, with columns running in parallel instead of through
    // one merge thread
    val wCum = Window.partitionBy("idx").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = freq.select(
      col("idx"), col("v"), col("cnt"),
      sum("cnt").over(wCum).as("cum"))

    // one bracketing (lo, hi) value pair per requested percentage: the
    // distinct value whose tie-interval [cum−cnt, cum) covers the target
    // 0-based rank — exactly one row matches, so min() selects it. Ranks
    // are per-column literals indexed by idx.
    val brackets = ps.zipWithIndex.flatMap { case (pct, i) =>
      def arrOf(f: Double => Long) = array(exprs.indices.map(j =>
        lit(nMap.get(j).fold(-1L)(n => f(pct * (n - 1))))): _*)
      val lo = element_at(arrOf(_.floor.toLong), col("idx") + 1)
      val hi = element_at(arrOf(_.ceil.toLong), col("idx") + 1)
      Seq(
        min(when(col("cum") - col("cnt") <= lo && col("cum") > lo, col("v")))
          .as(s"lo_$i"),
        min(when(col("cum") - col("cnt") <= hi && col("cum") > hi, col("v")))
          .as(s"hi_$i"))
    }
    val rows = cdf.groupBy("idx")
      .agg(brackets.head, brackets.tail: _*)
      .collect()
      .map(r => r.getAs[Int]("idx") -> r).toMap

    exprs.zipWithIndex.map { case ((name, _), idx) =>
      name -> ((nMap.get(idx), rows.get(idx)) match {
        case (Some(n), Some(r)) => Some(
          ps.zipWithIndex.map { case (pct, i) =>
            // Percentile.getPercentile, verbatim arithmetic
            val position = pct * (n - 1)
            val lower = position.floor.toLong
            val higher = position.ceil.toLong
            val lowerKey = r.getAs[Double](s"lo_$i")
            if (higher == lower) lowerKey
            else {
              val higherKey = r.getAs[Double](s"hi_$i")
              if (higherKey == lowerKey) lowerKey
              else (higher - position) * lowerKey +
                (position - lower) * higherKey
            }
          })
        case _ => None
      })
    }.toMap
  }
}
