package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of enrichment: attach to every row the most recent STRICTLY-PRIOR
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
}
