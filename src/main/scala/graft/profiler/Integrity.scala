package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-table integrity profiling — the Deequ-family capabilities the
  * reference's fixed 17-analyzer battery omits but the same Glue-catalog
  * profiling workflow needs (reference scope: awsdataprofiler
  * Profiler.scala:172-205 profiles each table in isolation; these two
  * operators relate tables / column sets).
  *
  * Scale shape: both reduce to KEY relations before anything joins or
  * distincts — the fact-table payload never shuffles. Referential
  * integrity shuffles `(key, count)` pairs (map-side combined) and
  * anti-joins two compact key relations; candidate-key discovery runs
  * all combos' exact distinct counts in ONE pass (Catalyst Expand:
  * one shuffle, rows × combos of only the combo columns).
  */
object Integrity {

  /** Referential-integrity profile of `child.childKey → parent.parentKey`:
    * one row `(relation, n_rows, n_null, n_keys, n_orphan_keys,
    * n_orphan_rows, containment)` where containment = fraction of
    * non-null child rows whose key exists in the parent (6-dp, null when
    * the child has no non-null keys).
    *
    * Plan: child collapses to per-key counts (map-side combine — the
    * shuffle carries one row per distinct key), parent to a distinct key
    * relation; orphans = left-anti join of the two. Neither table's
    * payload columns ever leave the scan.
    */
  def referential(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      relation: String): DataFrame = {
    val keyCounts = ScanMetrics.spread(child)
      .select(col(childKey).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
    val parentKeys = ScanMetrics.spread(parent)
      .select(col(parentKey).as("k"))
      .where(col("k").isNotNull)
      .distinct()
    val orphans = keyCounts.where(col("k").isNotNull)
      .join(parentKeys, Seq("k"), "left_anti")
      .agg(
        count(lit(1)).as("n_orphan_keys"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"))
    val totals = keyCounts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
      coalesce(sum(when(col("k").isNull, col("cnt"))), lit(0L)).as("n_null"),
      count(when(col("k").isNotNull, lit(1))).as("n_keys"))
    // both sides are single-row aggregates — the cross join is trivial
    totals.crossJoin(orphans).select(
      lit(relation).as("relation"),
      col("n_rows").cast(LongType).as("n_rows"),
      col("n_null").cast(LongType).as("n_null"),
      col("n_keys").cast(LongType).as("n_keys"),
      col("n_orphan_keys").cast(LongType).as("n_orphan_keys"),
      col("n_orphan_rows").cast(LongType).as("n_orphan_rows"),
      // double-division + ROUND(…, 6): the same quantization contract the
      // hash-green Distinctness metric already pins against DuckDB
      when(col("n_rows") > col("n_null"),
        round((col("n_rows") - col("n_null") - col("n_orphan_rows"))
          .cast(DoubleType) / (col("n_rows") - col("n_null")).cast(DoubleType), 6))
        .as("containment"))
  }

  /** Candidate-key discovery: for each column combo, exact distinctness
    * of the fully-non-null tuples. Returns `(key_cols, n_rows,
    * n_distinct, n_with_null, distinctness, is_key)` — `is_key` iff the
    * combo is total (no nulls) and unique.
    *
    * All combos evaluate in ONE aggregation: Spark's multi-distinct
    * rewrite expands rows × combos carrying only the combo columns, a
    * single shuffle. At 100 TB you would screen combos with
    * `approx_count_distinct` first (one scan, no expansion) and verify
    * only near-unique survivors exactly — the exact pass here IS that
    * verification step.
    *
    * Multi-arg `count_distinct` skips rows where ANY combo column is
    * null (SQL semantics) — `n_distinct` counts fully-non-null tuples,
    * `n_with_null` reports how many rows were excluded.
    */
  def candidateKeys(df: DataFrame, combos: Seq[Seq[String]]): DataFrame = {
    require(combos.nonEmpty && combos.forall(_.nonEmpty), "need non-empty combos")
    val src = ScanMetrics.spread(df)
    val aggs = combos.zipWithIndex.flatMap { case (cols, i) =>
      val anyNull = cols.map(col(_).isNull).reduce(_ || _)
      Seq(
        count_distinct(col(cols.head), cols.tail.map(col): _*).as(s"d_$i"),
        count(when(anyNull, lit(1))).as(s"w_$i"))
    }
    val one = src.agg(count(lit(1)).as("n_rows"), aggs: _*).collect()(0)
    val n = one.getAs[Long]("n_rows")
    val rows = combos.zipWithIndex.map { case (cols, i) =>
      val d = one.getAs[Long](s"d_$i")
      val w = one.getAs[Long](s"w_$i")
      // same double-division + HALF_UP-6dp contract as the Distinctness
      // metric (Spark round() semantics, hash-green vs DuckDB ROUND)
      val distinctness =
        if (n == 0L) null
        else java.lang.Double.valueOf(BigDecimal(d.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (cols.mkString(","), n, d, w, distinctness, w == 0L && d == n && n > 0L)
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6)), 1),
      StructType(Seq(
        StructField("key_cols", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("n_with_null", LongType, nullable = false),
        StructField("distinctness", DoubleType, nullable = true),
        StructField("is_key", BooleanType, nullable = false))))
  }

  /** Approximate-functional-dependency discovery (E110) — the
    * profiling classic next to [[candidateKeys]]: for each declared
    * LHS→RHS pair, how close does LHS *determine* RHS? `violations` is
    * the minimum number of rows to delete for the FD to hold exactly
    * (the g3 error of Kivinen & Mannila): n − Σ_lhs max_rhs count, and
    * `fd_ratio` its complement share. `n_nationkey→n_name` scores 1.0;
    * a near-FD with a few dirty rows scores 0.99x — the signal schema
    * inference and key-repair tooling thresholds on.
    *
    * ONE scan for ALL pairs: each row explodes map-side into
    * (pair, lhs, rhs) triples (the E90 Expand shape), then three
    * cascaded aggregations over strictly shrinking relations — distinct
    * cells (map-side combined: the shuffle carries Σ distinct(l,r) per
    * pair, never rows), per-LHS best, per-pair totals. No per-pair jobs,
    * no self-joins. Values compare as strings (pairs should be
    * integer/string columns; a double column's rendering is
    * engine-specific). Null LHS forms its own group (nulls-equal FD
    * semantics); null RHS is a value. */
  def functionalDependencies(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one lhs->rhs pair")
    val triples = array(pairs.zipWithIndex.map { case ((l, r), i) =>
      struct(lit(i).as("pid"), col(l).cast("string").as("lhs"),
        col(r).cast("string").as("rhs"))
    }: _*)
    val labels = array(pairs.map { case (l, r) => lit(s"$l->$r") }: _*)
    df.select(explode(triples).as("p")).select(col("p.*"))
      .groupBy("pid", "lhs", "rhs").agg(count(lit(1)).as("c"))
      .groupBy("pid", "lhs").agg(sum("c").as("lc"), max("c").as("best"))
      .groupBy("pid").agg(
        sum("lc").as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum("best").as("n_conforming"))
      .select(
        element_at(labels, col("pid") + 1).as("fd"),
        col("n_rows").cast(LongType).as("n_rows"),
        col("n_lhs"),
        (col("n_rows") - col("n_conforming")).cast(LongType).as("violations"),
        round(col("n_conforming").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("fd_ratio"))
  }
}
