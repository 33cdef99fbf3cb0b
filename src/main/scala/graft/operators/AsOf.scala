package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval (range) joins — see [[AsOf.rangeJoin]] — and as-of
  * enrichment: attach to every row the most recent STRICTLY-PRIOR
  * value(s) from rows matching a predicate, within the same key partition
  * in event-time order — the point-in-time join of event analytics ("the
  * last page view before this purchase") that plain equi-joins cannot
  * express. Spark has no native ASOF JOIN (DuckDB/Pandas do); composing it
  * as `last(when(pred, v), ignoreNulls).over(key-partitioned window)` keeps
  * it a SINGLE shuffle keyed on the partition key with a sort within each
  * key — no self-join, no range-join explosion, and whole rows never
  * duplicate. Skew note: one hyperactive key sorts in one task — the same
  * bound as any per-key ordered operator; salt upstream if a key exceeds
  * task memory. */
object AsOf {

  /** For each row: `outCols` = the as-of values of `valueCols` taken from
    * the latest strictly-earlier row (by `orderCol`) satisfying
    * `sourcePred`; null when no such row exists.
    *
    * Determinism: if `(keyCol, orderCol)` alone is not a total order,
    * `last(...)` over the ROWS frame picks a partition-dependent row among
    * ties — pass the row's unique id as `tieBreak` to pin the order (the
    * oracle twin appends the same column to its window ORDER BY). */
  def lastPrior(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      sourcePred: Column,
      valueCols: Seq[(String, String)],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy((orderCol +: tieBreak).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    valueCols.foldLeft(df) { case (acc, (v, out)) =>
      acc.withColumn(out, last(when(sourcePred, col(v)), ignoreNulls = true).over(w))
    }
  }

  /** Bucketized interval join (E117) — `facts.value ∈ [lo, hi)` against
    * an INTERVALS relation (tolerance bands, IP ranges, SLA windows —
    * possibly overlapping, so this is not bucket assignment): the naive
    * `JOIN ON v >= lo AND v < hi` has no equi-key, which Spark plans as
    * BroadcastNestedLoopJoin (or a CartesianProduct) — an O(|F|·|I|)
    * scan that dies long before 100 TB. Here both sides map to integer
    * buckets of `bucketWidth` — facts to ONE bucket, each interval
    * EXPLODED to every bucket it overlaps — turning the θ-join into a
    * hash equi-join on the bucket id plus a residual predicate. A
    * (fact, interval) match survives exactly once (the fact's single
    * bucket), so no post-join dedup exists.
    *
    * Tuning & guards: cost ∝ Σ buckets-per-interval — pick `bucketWidth`
    * near the median interval span so typical intervals explode to ~2
    * buckets; a degenerate interval spanning more than
    * `maxBucketsPerInterval` buckets fails loudly (raise_error, the
    * winnowing-cap contract) instead of silently exploding the build
    * side. Null values/bounds drop out (null bucket keys never match —
    * the θ-join's own semantics). Plan shape pinned by PlanAuditSpec:
    * hash join on `_b`, never BNLJ/Cartesian. */
  def rangeJoin(
      facts: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    import org.apache.spark.sql.types.LongType
    val fb = facts.withColumn("_b",
      floor(col(valueCol).cast("double") / bucketWidth).cast(LongType))
    val blo = floor(col(loCol).cast("double") / bucketWidth).cast(LongType)
    val bhi = floor(col(hiCol).cast("double") / bucketWidth).cast(LongType)
    val ib = intervals.withColumn("_b",
      explode(sequence(blo,
        when(bhi - blo < maxBucketsPerInterval, bhi).otherwise(
          raise_error(concat(
            lit("rangeJoin: interval ["), col(loCol).cast("string"),
            lit(", "), col(hiCol).cast("string"),
            lit(s") spans > $maxBucketsPerInterval buckets; " +
              "widen bucketWidth or split the interval")))))))
    fb.join(ib, Seq("_b"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_b")
  }
}
