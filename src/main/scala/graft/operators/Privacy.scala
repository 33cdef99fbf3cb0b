package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling (E241): k-anonymity / l-diversity over a set
  * of quasi-identifier columns (Sweeney '02, "k-anonymity: a model for
  * protecting privacy"; Machanavajjhala et al. '07 for l-diversity) —
  * the table-shaped re-identification audit that complements the
  * regex-shaped E25 PII scan. A row is k-anonymous when at least k rows
  * share its full quasi-identifier combination (its EQUIVALENCE CLASS);
  * a class is l-diverse when its sensitive attribute takes at least l
  * distinct values (a k-large class with ONE sensitive value still
  * leaks it — the homogeneity attack k-anonymity alone misses).
  *
  * Spark-first shape: ONE hash aggregate over the quasi-identifier key
  * (count + count-distinct-sensitive, map-side combined), so the audit
  * is a single shuffle of class-sized rows regardless of table width —
  * linear in rows, and the shuffle carries |classes| rows, not |table|.
  * No driver-side state; thresholds are plain column predicates.
  *
  * Cites reference scope: the reference profiles completeness/
  * distinctness per column (Profiler.scala:166-253) but has no
  * cross-column privacy model — extension per SURVEY §2.E. */
object Privacy {

  /** Per-equivalence-class audit relation: the quasi-identifier columns,
    * `class_size` (the k of every member row), `l_distinct` (distinct
    * sensitive values), `is_k_anonymous`, `is_l_diverse`, and
    * `reident_risk` = 1/class_size rounded to 6 dp (the worst-case
    * prosecutor-model re-identification probability). */
  def kAnonymity(
      df: DataFrame,
      quasiIdCols: Seq[String],
      sensitiveCol: Column,
      k: Long = 5L,
      l: Long = 2L): DataFrame = {
    require(quasiIdCols.nonEmpty, "kAnonymity: no quasi-identifier columns")
    require(k >= 1 && l >= 1, s"kAnonymity: k=$k l=$l out of range")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(sensitiveCol).as("l_distinct"))
      .withColumn("is_k_anonymous", col("class_size") >= k)
      .withColumn("is_l_diverse", col("l_distinct") >= l)
      .withColumn("reident_risk",
        round(lit(1.0) / col("class_size"), 6))
  }

  /** Suppression executor: rows whose equivalence class fails the k
    * threshold get every quasi-identifier REPLACED by the `"*"`
    * generalization token (cast to string — suppression changes the
    * column domain by design); passing rows keep their values, also
    * stringified so the output schema is uniform. Class sizes ride a
    * broadcast join of the (class → size) relation back onto the table
    * — class keys are aggregate-sized, the payload never shuffles. */
  def kAnonymizeExecute(
      df: DataFrame,
      quasiIdCols: Seq[String],
      k: Long = 5L): DataFrame = {
    require(quasiIdCols.nonEmpty, "kAnonymizeExecute: no quasi-identifier columns")
    val sizes = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val joined = df.join(broadcast(sizes), quasiIdCols, "left")
    val suppress = col("class_size") < k
    val out = quasiIdCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        when(suppress, lit("*")).otherwise(col(c).cast("string")))
    }
    out.withColumn("suppressed", suppress)
  }
}
