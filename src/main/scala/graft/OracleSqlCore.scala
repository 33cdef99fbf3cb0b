package graft

/** OracleSql — Core lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlCore { this: OracleSql.type =>
  import Lineitem._

  /** Static column inventory of the `lineitem` testdata table
    * (TESTDATA.md; types = Spark catalogString for the schema relation). */
  object Lineitem {
    val numeric: Seq[String] = Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val text: Seq[String] = Seq("l_returnflag", "l_linestatus")
    /** Profiled columns (timestamp l_shipdate is class Skipped). */
    val profiled: Seq[String] = numeric ++ text
    val types: Seq[(String, String)] = Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
      "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double",
      "l_tax" -> "double", "l_returnflag" -> "string",
      // parquet stores isAdjustedToUTC=false -> Spark 4 reads TIMESTAMP_NTZ
      "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz")
  }

  private[graft] lazy val T = "lineitem"

  def wrap(inner: String): String =
    s"SELECT * FROM ($inner) q ORDER BY instance, name"

  private[graft] def union(selects: Seq[String]): String = selects.mkString(" UNION ALL ")

  /** One `SELECT '<col>' AS instance, '<metric>' AS name, <expr> AS value`. */
  private[graft] def sel(c: String, metric: String, valueExpr: String, from: String = T): String =
    s"SELECT '$c' AS instance, '$metric' AS name, ROUND($valueExpr, 6) AS value FROM $from"

  private[graft] def perCol(cols: Seq[String], metric: String)(expr: String => String): String =
    union(cols.map(c => sel(c, metric, expr(c))))

  /** DECIMAL(38,6)-quantized order-independent sum (matches
    * ScanMetrics.decSum). */
  private[graft] def decSum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)"

  private[graft] def decSumSq(c: String): String =
    s"CAST(SUM(CAST(CAST($c AS DOUBLE) * CAST($c AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)"

  // ---- per-metric value expressions (must mirror ScanMetrics/FreqMetrics) ----

  lazy val sizeSelect: String =
    s"SELECT '*' AS instance, 'Size' AS name, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS value FROM $T"

  def completenessExpr(c: String) = s"COUNT($c) * 1.0 / COUNT(*)"
  def minimumExpr(c: String) = s"CAST(MIN($c) AS DOUBLE)"
  def maximumExpr(c: String) = s"CAST(MAX($c) AS DOUBLE)"
  def meanExpr(c: String) = s"${decSum(c)} / COUNT($c)"
  def sumExpr(c: String) = decSum(c)
  def stddevPopExpr(c: String) =
    s"SQRT(GREATEST(${decSumSq(c)} / COUNT($c) - POW(${decSum(c)} / COUNT($c), 2), 0.0))"
  def distinctnessExpr(c: String) = s"COUNT(DISTINCT $c) * 1.0 / COUNT($c)"
  def maxLengthExpr(c: String) = s"CAST(MAX(LENGTH($c)) AS DOUBLE)"
  def minLengthExpr(c: String) = s"CAST(MIN(LENGTH($c)) AS DOUBLE)"
  def countDistinctExpr(c: String) = s"CAST(COUNT(DISTINCT $c) AS DOUBLE)"

  /** Frequency-table subquery for a column. */
  private[graft] def freq(c: String, from: String = T): String =
    s"(SELECT COUNT(*) AS cnt FROM $from WHERE $c IS NOT NULL GROUP BY $c) f"

  /** Entropy via the same algebraic form as FreqMetrics:
    * H = ln(nn) − Σ cnt·ln(cnt) / nn. */
  private[graft] def entropySel(c: String, from: String = T): String =
    sel(c, "Entropy", "LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt)", freq(c, from))

  private[graft] def uvrSel(c: String, from: String = T): String =
    sel(c, "UniqueValueRatio",
      "SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)", freq(c, from))

  private[graft] def uniquenessSel(c: String, from: String = T): String =
    sel(c, "Uniqueness",
      "SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(cnt)", freq(c, from))

  private[graft] def countDistinctSel(c: String, from: String = T): String =
    sel(c, "CountDistinct", "CAST(COUNT(*) AS DOUBLE)", freq(c, from))

  /** Histogram bins + top-N abs/ratio rows for one column (null-inclusive
    * stringified frequency; cap with (cnt DESC, v ASC) tie-break; ratio
    * denominator = all rows n). */
  private[graft] def histogramSelects(c: String, bins: Int, from: String = T): Seq[String] = {
    val f = s"(SELECT COALESCE(CAST($c AS VARCHAR), 'NullValue') AS v, COUNT(*) AS cnt FROM $from GROUP BY 1)"
    val top = s"(SELECT v, cnt FROM $f z ORDER BY cnt DESC, v ASC LIMIT $bins)"
    Seq(
      s"SELECT '$c' AS instance, 'Histogram.bins' AS name, ROUND(CAST((SELECT COUNT(*) FROM $f z) AS DOUBLE), 6) AS value",
      s"SELECT '$c' AS instance, 'Histogram.abs.' || v AS name, ROUND(CAST(cnt AS DOUBLE), 6) AS value FROM $top t",
      s"SELECT '$c' AS instance, 'Histogram.ratio.' || v AS name, ROUND(cnt * 1.0 / (SELECT COUNT(*) FROM $from), 6) AS value FROM $top t")
  }

  private[graft] def histogramSql(c: String, bins: Int, from: String = T): String =
    union(histogramSelects(c, bins, from))

  private[graft] def quantExactSelects(c: String, q: Int): Seq[String] =
    (1 to q).map { i =>
      val p = i.toDouble / q
      sel(c, s"QuantilesExact-$p", s"CAST(QUANTILE_CONT($c, $p) AS DOUBLE)")
    }

  lazy val size: String = wrap(sizeSelect)
  lazy val completeness: String = wrap(perCol(profiled, "Completeness")(completenessExpr))
  lazy val minimum: String = wrap(perCol(numeric, "Minimum")(minimumExpr))
  lazy val maximum: String = wrap(perCol(numeric, "Maximum")(maximumExpr))
  lazy val mean: String = wrap(perCol(numeric, "Mean")(meanExpr))
  lazy val sum: String = wrap(perCol(numeric, "Sum")(sumExpr))
  lazy val stddevPop: String = wrap(perCol(numeric, "StandardDeviation")(stddevPopExpr))
  lazy val distinctness: String = wrap(perCol(profiled, "Distinctness")(distinctnessExpr))
  lazy val maxLength: String = wrap(perCol(text, "MaxLength")(maxLengthExpr))
  lazy val minLength: String = wrap(perCol(text, "MinLength")(minLengthExpr))
  lazy val countDistinct: String = wrap(union(text.map(c => countDistinctSel(c))))
  lazy val entropy: String = wrap(union(text.map(c => entropySel(c))))
  lazy val uniqueValueRatio: String = wrap(union(text.map(c => uvrSel(c))))
  lazy val uniqueness: String = wrap(union(text.map(c => uniquenessSel(c))))
  lazy val histogram: String = wrap(union(text.map(c => histogramSql(c, 10))))
  lazy val quantilesExact: String = wrap(union(numeric.flatMap(c => quantExactSelects(c, 10))))

  /** R5: SELECT DISTINCT two-column projection. */
  lazy val dedupColumnNames: String =
    s"SELECT DISTINCT l_returnflag, l_linestatus FROM $T ORDER BY l_returnflag, l_linestatus"

  /** VALUES list literal of the schema relation for join oracles. */
  private[graft] lazy val schemaValues: String =
    types.map { case (c, t) => s"('$c', '$t')" }.mkString(", ")

  /** R6: metrics ⟕ schema relation on instance (Dataset row → null type). */
  lazy val metricsTypeJoin: String = {
    val m = union(Seq(sizeSelect, perCol(profiled, "Completeness")(completenessExpr)))
    s"WITH m AS ($m), s(instance, type) AS (VALUES $schemaValues) " +
      "SELECT m.instance, m.name, m.value, s.type FROM m LEFT JOIN s ON m.instance = s.instance " +
      "ORDER BY m.instance, m.name"
  }

  /** R9: boolean + date columns derived from lineitem, cast to string, then
    * profiled with the text battery subset (MinLength/MaxLength/Histogram).
    * Spark's cast renders boolean as "true"/"false" and date as ISO yyyy-MM-dd,
    * matching DuckDB's VARCHAR casts (SURVEY.md §1.4.7). */
  lazy val castUnsupported: String = {
    val derived =
      s"(SELECT CAST(l_quantity > 25.0 AS VARCHAR) AS flag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day FROM $T) d"
    val cols = Seq("flag", "ship_day")
    wrap(union(
      cols.map(c => sel(c, "MinLength", s"CAST(MIN(LENGTH($c)) AS DOUBLE)", derived)) ++
      cols.map(c => sel(c, "MaxLength", s"CAST(MAX(LENGTH($c)) AS DOUBLE)", derived)) ++
      cols.map(c => histogramSql(c, 10, derived))))
  }

  /** Drift twin: the same metric expressions computed over the even/odd
    * orderkey halves, joined; 6-place quantization BEFORE the deltas
    * (publication precision), same guarded CASE semantics. */
  lazy val profileDrift: String = {
    def half(tag: String, parity: Int): String = {
      val from = s"(SELECT * FROM lineitem WHERE l_orderkey % 2 = $parity) $tag"
      union(
        Seq(s"SELECT '*' AS instance, 'Size' AS name, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS value FROM $from") ++
          profiled.map(c => sel(c, "Completeness", completenessExpr(c), from)) ++
          numeric.map(c => sel(c, "Mean", meanExpr(c), from)) ++
          numeric.map(c => sel(c, "Sum", sumExpr(c), from)))
    }
    s"""WITH a AS (${half("h0", 0)}), b AS (${half("h1", 1)})
SELECT a.instance, a.name, a.value AS value_a, b.value AS value_b,
  ROUND(b.value - a.value, 6) AS delta,
  ROUND(CASE WHEN ABS(a.value) > 0 THEN (b.value - a.value) / ABS(a.value) END, 6) AS rel_change,
  CASE WHEN ABS(a.value) = 0 THEN 'incomparable'
       WHEN ABS((b.value - a.value) / ABS(a.value)) > 0.05 THEN 'drift'
       ELSE 'stable' END AS status
FROM a JOIN b ON a.instance = b.instance AND a.name = b.name
ORDER BY a.instance, a.name"""
  }

  lazy val profileLineitem: String = {
    def ent(entity: String)(s: String): String =
      s.replaceFirst("^SELECT ", s"SELECT '$entity' AS entity, ")
    val columnSelects: Seq[String] =
      profiled.map(c => sel(c, "Completeness", completenessExpr(c))) ++
        numeric.map(c => sel(c, "Minimum", minimumExpr(c))) ++
        numeric.map(c => sel(c, "Maximum", maximumExpr(c))) ++
        numeric.map(c => sel(c, "Mean", meanExpr(c))) ++
        numeric.map(c => sel(c, "Sum", sumExpr(c))) ++
        numeric.map(c => sel(c, "StandardDeviation", stddevPopExpr(c))) ++
        profiled.map(c => sel(c, "Distinctness", distinctnessExpr(c))) ++
        text.map(c => sel(c, "MaxLength", maxLengthExpr(c))) ++
        text.map(c => sel(c, "MinLength", minLengthExpr(c))) ++
        text.map(c => countDistinctSel(c)) ++
        text.map(c => entropySel(c)) ++
        text.map(c => uvrSel(c)) ++
        text.map(c => uniquenessSel(c)) ++
        text.flatMap(c => histogramSelects(c, 10))
    val m = union(ent("Dataset")(sizeSelect) +: columnSelects.map(ent("Column")))
    s"WITH m AS ($m), s(instance, type) AS (VALUES $schemaValues) " +
      "SELECT m.entity, m.instance, m.name, m.value, s.type FROM m LEFT JOIN s ON m.instance = s.instance " +
      "ORDER BY m.instance, m.name"
  }

  /** Whole-table twin of the merged incremental profile: the split-snapshot-
    * merge pipeline must reproduce these exact values (decimal sums are
    * order- and partition-independent). */
  lazy val incrementalProfile: String = wrap(union(
    Seq(sizeSelect) ++
      Lineitem.numeric.map(c => sel(c, "Completeness", completenessExpr(c))) ++
      Lineitem.numeric.map(c => sel(c, "Mean", meanExpr(c))) ++
      Lineitem.numeric.map(c => sel(c, "Sum", sumExpr(c))) ++
      Lineitem.numeric.map(c => sel(c, "StandardDeviation", stddevPopExpr(c))) ++
      Lineitem.numeric.map(c => sel(c, "Minimum", minimumExpr(c))) ++
      Lineitem.numeric.map(c => sel(c, "Maximum", maximumExpr(c)))))

  /** Segmented-incremental twin (E100): the incremental battery GROUPed
    * by the segment column — same exact decimal/double algebra per
    * segment, per-segment Size rows. */
  lazy val segmentedIncrementalProfile: String = {
    def gsel(c: String, metric: String, expr: String) =
      s"SELECT CAST(l_returnflag AS VARCHAR) AS segment, '$c' AS instance, " +
        s"'$metric' AS name, ROUND($expr, 6) AS value FROM $T GROUP BY 1"
    val size =
      s"SELECT CAST(l_returnflag AS VARCHAR) AS segment, '*' AS instance, " +
        s"'Size' AS name, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS value FROM $T GROUP BY 1"
    val parts = Seq(size) ++
      Lineitem.numeric.map(c => gsel(c, "Completeness", completenessExpr(c))) ++
      Lineitem.numeric.map(c => gsel(c, "Mean", meanExpr(c))) ++
      Lineitem.numeric.map(c => gsel(c, "Sum", sumExpr(c))) ++
      Lineitem.numeric.map(c => gsel(c, "StandardDeviation", stddevPopExpr(c))) ++
      Lineitem.numeric.map(c => gsel(c, "Minimum", minimumExpr(c))) ++
      Lineitem.numeric.map(c => gsel(c, "Maximum", maximumExpr(c)))
    s"SELECT * FROM (${parts.mkString(" UNION ALL ")}) q " +
      "ORDER BY segment, instance, name"
  }

  /** R7: the schema relation is metadata-derived (parquet footer), so its
    * oracle is a golden VALUES literal of lineitem's declared (column,
    * catalogString) pairs — pinning exactly what `Profiler.schemaDF` must
    * read out of the footer. */
  lazy val schemaDf: String =
    s"SELECT * FROM (VALUES $schemaValues) s(instance, type) ORDER BY instance"

  /** R4: the Column-entity side of the entity split over a size +
    * completeness profile — exactly the per-column Completeness rows (the
    * Size row carries entity 'Dataset' and is filtered out). */
  lazy val metricsSplit: String = wrap(perCol(profiled, "Completeness")(completenessExpr))

  /** R11: global multi-key sort + limit over the flagship metrics. */
  lazy val sortedMetricsHead: String = {
    val m = union(Seq(
      sizeSelect,
      perCol(profiled, "Completeness")(completenessExpr),
      perCol(numeric, "Minimum")(minimumExpr),
      perCol(numeric, "Maximum")(maximumExpr),
      perCol(text, "MaxLength")(maxLengthExpr),
      perCol(text, "MinLength")(minLengthExpr)))
    s"SELECT * FROM ($m) q ORDER BY instance, name LIMIT 100"
  }

  /** Static column inventory of EVERY testdata table (TESTDATA.md schemas):
    * the Text+Numeric columns the profiler's battery covers. Skipped
    * classes are absent from BOTH sides: embeddings' float array and every
    * timestamp column (`events.ts` is TIMESTAMP(MICROS, NTZ) — class
    * Skipped per reference parity, like lineitem/orders' date columns). */
  private[graft] lazy val allTablesProfiled: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "label"),
    "events" -> Seq("event_id", "user_id", "event_type", "value", "props"),
    "lineitem" -> Lineitem.profiled,
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "region" -> Seq("r_regionkey", "r_name"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))

  /** Every driver-provided parquet table (the R2 enumeration domain) —
    * derived from the profile battery's list so the two can't drift. */
  lazy val AllTables: Seq[String] = allTablesProfiled.map(_._1)

  /** Golden twin of the approx-sketch accuracy audit: the Spark side emits
    * deterministic booleans (HLL within 3x rsd of exact, percentile_approx
    * inside the exact envelope at p ± 2/accuracy), so the oracle pins them
    * as an all-true VALUES list — any sketch regression hash-fails. */
  lazy val approxErrorAudit: String = {
    val rows = Lineitem.numeric.flatMap { c =>
      s"('$c', 'ApproxCountDistinct', true)" +:
        (1 to 10).map(i => s"('$c', 'ApproxQuantiles-${i / 10.0}', true)")
    }
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) AS t(instance, name, within_bound) " +
      "ORDER BY instance, name"
  }

  /** Flagship multi-table twin: per-table Size + per-column Completeness,
    * UNION ALL across the whole catalog — the reference main loop's output
    * reproduced table-by-table in SQL. */
  lazy val profileAllTables: String = {
    val selects = allTablesProfiled.flatMap { case (t, cols) =>
      s"""SELECT '$t' AS table_name, 'Dataset' AS entity, '*' AS instance,
  'Size' AS name, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS value FROM $t""" +:
        cols.map(c =>
          s"""SELECT '$t', 'Column', '$c', 'Completeness',
  ROUND(COUNT($c) * 1.0 / COUNT(*), 6) FROM $t""")
    }
    s"SELECT * FROM (${selects.mkString(" UNION ALL ")}) q " +
      "ORDER BY table_name, entity, instance, name"
  }

  /** All-true golden twin shared by the round-6 invariant audits: each
    * audit emits deterministic booleans pinning a guaranteed property of
    * an operator whose raw output SQL cannot reproduce (LSH banding,
    * randomized sketch compaction, plan shapes, sink side effects); a
    * regression flips a row to false and hash-fails. */
  private[graft] def allTrue(properties: Seq[String]): String =
    s"SELECT * FROM (VALUES ${properties.sorted.map(p => s"('$p', true)").mkString(", ")}) " +
      "AS t(property, ok) ORDER BY property"
}
