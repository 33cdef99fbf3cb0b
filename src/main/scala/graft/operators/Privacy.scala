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

  /** t-closeness audit (E254) — Li, Li & Venkatasubramanian ICDE '07,
    * the third rung of the privacy ladder ([[kAnonymity]] k → its
    * l-diversity column → this): a class can be k-large AND l-diverse
    * yet still leak by SKEW — if 96% of a class shares one sensitive
    * value the attacker's posterior moves far from the global prior.
    * t-closeness bounds the Earth Mover's Distance between each class's
    * sensitive distribution and the GLOBAL one: for an ordered numeric
    * attribute with m distinct global values,
    * `EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i} (p_class(v_j) − p_global(v_j))|`
    * (the paper's ordered-distance closed form).
    *
    * Determinism: per-cell ratios are double; the prefix sum runs in
    * FIXED (class, value-asc) window order; |cum| is 6-dp-quantized to
    * DECIMAL(38,6) before the order-free per-class sum; `m = 1`
    * degenerates to EMD 0 (one value — every class matches the prior).
    *
    * Scale shape: the zero-filled grid is |classes| × m rows via a
    * BROADCAST of the global value relation (m is small by the privacy
    * model — sensitive attributes are banded/categorical); the prefix
    * window keys by class, never single-partition; everything upstream
    * is two map-side-combined aggregates of the table. */
  def tCloseness(
      df: DataFrame,
      quasiIdCols: Seq[String],
      sensitiveCol: Column,
      t: Double = 0.2): DataFrame = {
    require(quasiIdCols.nonEmpty, "tCloseness: no quasi-identifier columns")
    require(t > 0.0 && t <= 1.0, s"tCloseness: t=$t out of (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val qi = quasiIdCols.map(col)
    val base = df.select(qi :+ sensitiveCol.as("sv"): _*)
      .where(col("sv").isNotNull)
    val global = base.groupBy("sv").agg(count(lit(1)).as("gc"))
    val totals = global.agg(
      sum("gc").cast("long").as("n_total"),
      count(lit(1)).cast("long").as("m"))
    val classes = base.groupBy(qi: _*).agg(count(lit(1)).as("class_size"))
    val cells = base.groupBy(qi :+ col("sv"): _*)
      .agg(count(lit(1)).as("cc"))
    val grid = classes
      .crossJoin(broadcast(global))
      .join(cells, quasiIdCols :+ "sv", "left")
      .withColumn("cc", coalesce(col("cc"), lit(0L)))
      .crossJoin(broadcast(totals))
    val w = Window.partitionBy(qi: _*)
      .orderBy(col("sv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = col("cc").cast("double") / col("class_size").cast("double") -
      col("gc").cast("double") / col("n_total").cast("double")
    grid
      .withColumn("cum", sum(r).over(w))
      .withColumn("vrnk", row_number().over(
        Window.partitionBy(qi: _*).orderBy(col("sv").asc)).cast("long"))
      // the m-th |cum| is 0 up to float dust; the paper sums i < m
      .where(col("vrnk") < col("m") || col("m") === 1)
      .groupBy(qi :+ col("class_size") :+ col("m"): _*)
      .agg(sum(round(abs(col("cum")), 6).cast("decimal(38,6)")).as("emdsum"))
      .withColumn("emd",
        when(col("m") > 1,
          round(col("emdsum").cast("double") /
            (col("m") - 1).cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("is_t_close", col("emd") <= t)
      .select(qi :+ col("class_size") :+ col("emd") :+ col("is_t_close"): _*)
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
