package graft

/** DuckDB oracle SQL for every oracle=Y query key (SURVEY.md §2).
  *
  * Each SQL string must produce byte-identical values to the Spark query on
  * the same Parquet files, so both sides follow the shared determinism
  * contract (SURVEY.md §7.3): explicit total-order ORDER BY, ROUND(x, 6) on
  * every value, DECIMAL(38,6)-quantized sums (order-independent), identical
  * entropy/stddev algebra, and the declared (count DESC, value ASC) histogram
  * tie-break.
  */
object OracleSql {

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

  private val T = "lineitem"

  def wrap(inner: String): String =
    s"SELECT * FROM ($inner) q ORDER BY instance, name"

  private def union(selects: Seq[String]): String = selects.mkString(" UNION ALL ")

  /** One `SELECT '<col>' AS instance, '<metric>' AS name, <expr> AS value`. */
  private def sel(c: String, metric: String, valueExpr: String, from: String = T): String =
    s"SELECT '$c' AS instance, '$metric' AS name, ROUND($valueExpr, 6) AS value FROM $from"

  private def perCol(cols: Seq[String], metric: String)(expr: String => String): String =
    union(cols.map(c => sel(c, metric, expr(c))))

  /** DECIMAL(38,6)-quantized order-independent sum (matches
    * ScanMetrics.decSum). */
  private def decSum(c: String): String =
    s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)"

  private def decSumSq(c: String): String =
    s"CAST(SUM(CAST(CAST($c AS DOUBLE) * CAST($c AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)"

  // ---- per-metric value expressions (must mirror ScanMetrics/FreqMetrics) ----

  val sizeSelect: String =
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
  private def freq(c: String, from: String = T): String =
    s"(SELECT COUNT(*) AS cnt FROM $from WHERE $c IS NOT NULL GROUP BY $c) f"

  /** Entropy via the same algebraic form as FreqMetrics:
    * H = ln(nn) − Σ cnt·ln(cnt) / nn. */
  private def entropySel(c: String, from: String = T): String =
    sel(c, "Entropy", "LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt)", freq(c, from))

  private def uvrSel(c: String, from: String = T): String =
    sel(c, "UniqueValueRatio",
      "SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)", freq(c, from))

  private def uniquenessSel(c: String, from: String = T): String =
    sel(c, "Uniqueness",
      "SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(cnt)", freq(c, from))

  private def countDistinctSel(c: String, from: String = T): String =
    sel(c, "CountDistinct", "CAST(COUNT(*) AS DOUBLE)", freq(c, from))

  /** Histogram bins + top-N abs/ratio rows for one column (null-inclusive
    * stringified frequency; cap with (cnt DESC, v ASC) tie-break; ratio
    * denominator = all rows n). */
  private def histogramSelects(c: String, bins: Int, from: String = T): Seq[String] = {
    val f = s"(SELECT COALESCE(CAST($c AS VARCHAR), 'NullValue') AS v, COUNT(*) AS cnt FROM $from GROUP BY 1)"
    val top = s"(SELECT v, cnt FROM $f z ORDER BY cnt DESC, v ASC LIMIT $bins)"
    Seq(
      s"SELECT '$c' AS instance, 'Histogram.bins' AS name, ROUND(CAST((SELECT COUNT(*) FROM $f z) AS DOUBLE), 6) AS value",
      s"SELECT '$c' AS instance, 'Histogram.abs.' || v AS name, ROUND(CAST(cnt AS DOUBLE), 6) AS value FROM $top t",
      s"SELECT '$c' AS instance, 'Histogram.ratio.' || v AS name, ROUND(cnt * 1.0 / (SELECT COUNT(*) FROM $from), 6) AS value FROM $top t")
  }

  private def histogramSql(c: String, bins: Int, from: String = T): String =
    union(histogramSelects(c, bins, from))

  private def quantExactSelects(c: String, q: Int): Seq[String] =
    (1 to q).map { i =>
      val p = i.toDouble / q
      sel(c, s"QuantilesExact-$p", s"CAST(QUANTILE_CONT($c, $p) AS DOUBLE)")
    }

  // ---- full per-query-key oracle statements ----

  import Lineitem._

  val size: String = wrap(sizeSelect)
  val completeness: String = wrap(perCol(profiled, "Completeness")(completenessExpr))
  val minimum: String = wrap(perCol(numeric, "Minimum")(minimumExpr))
  val maximum: String = wrap(perCol(numeric, "Maximum")(maximumExpr))
  val mean: String = wrap(perCol(numeric, "Mean")(meanExpr))
  val sum: String = wrap(perCol(numeric, "Sum")(sumExpr))
  val stddevPop: String = wrap(perCol(numeric, "StandardDeviation")(stddevPopExpr))
  val distinctness: String = wrap(perCol(profiled, "Distinctness")(distinctnessExpr))
  val maxLength: String = wrap(perCol(text, "MaxLength")(maxLengthExpr))
  val minLength: String = wrap(perCol(text, "MinLength")(minLengthExpr))
  val countDistinct: String = wrap(union(text.map(c => countDistinctSel(c))))
  val entropy: String = wrap(union(text.map(c => entropySel(c))))
  val uniqueValueRatio: String = wrap(union(text.map(c => uvrSel(c))))
  val uniqueness: String = wrap(union(text.map(c => uniquenessSel(c))))
  val histogram: String = wrap(union(text.map(c => histogramSql(c, 10))))
  val quantilesExact: String = wrap(union(numeric.flatMap(c => quantExactSelects(c, 10))))

  /** R5: SELECT DISTINCT two-column projection. */
  val dedupColumnNames: String =
    s"SELECT DISTINCT l_returnflag, l_linestatus FROM $T ORDER BY l_returnflag, l_linestatus"

  /** VALUES list literal of the schema relation for join oracles. */
  private val schemaValues: String =
    types.map { case (c, t) => s"('$c', '$t')" }.mkString(", ")

  /** R6: metrics ⟕ schema relation on instance (Dataset row → null type). */
  val metricsTypeJoin: String = {
    val m = union(Seq(sizeSelect, perCol(profiled, "Completeness")(completenessExpr)))
    s"WITH m AS ($m), s(instance, type) AS (VALUES $schemaValues) " +
      "SELECT m.instance, m.name, m.value, s.type FROM m LEFT JOIN s ON m.instance = s.instance " +
      "ORDER BY m.instance, m.name"
  }

  /** R9: boolean + date columns derived from lineitem, cast to string, then
    * profiled with the text battery subset (MinLength/MaxLength/Histogram).
    * Spark's cast renders boolean as "true"/"false" and date as ISO yyyy-MM-dd,
    * matching DuckDB's VARCHAR casts (SURVEY.md §1.4.7). */
  val castUnsupported: String = {
    val derived =
      s"(SELECT CAST(l_quantity > 25.0 AS VARCHAR) AS flag, CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day FROM $T) d"
    val cols = Seq("flag", "ship_day")
    wrap(union(
      cols.map(c => sel(c, "MinLength", s"CAST(MIN(LENGTH($c)) AS DOUBLE)", derived)) ++
      cols.map(c => sel(c, "MaxLength", s"CAST(MAX(LENGTH($c)) AS DOUBLE)", derived)) ++
      cols.map(c => histogramSql(c, 10, derived))))
  }

  /** The flagship deterministic full-profile pipeline (R15): every
    * deterministic family over every applicable column, plus the schema join,
    * with entity labels. */
  /** Correlation twin: identical decimal-quantized moments and identical
    * double assembly order; the variance-product guard precedes SQRT
    * (DuckDB raises on sqrt of a negative). */
  val columnCorr: String = corrSql(numeric, T)

  /** The pairwise-Pearson twin over arbitrary columns of an arbitrary
    * relation — shared by `column_corr` (E37) and `null_corr` (E104). */
  def corrSql(cols: Seq[String], from: String): String = {
    val numeric = cols
    val T = from
    val pairs = for {
      i <- numeric.indices
      j <- (i + 1) until numeric.size
    } yield (numeric(i), numeric(j))
    // same |x| ≤ 1e15 decimal-range guard as the engine: out-of-range
    // values are excluded from the guarded sums and null the pair's corr
    def ok(c: String) = s"ABS(CAST($c AS DOUBLE)) <= 1e15"
    def m(a: String, b: String) =
      s"$a IS NOT NULL AND $b IS NOT NULL AND ${ok(a)} AND ${ok(b)}"
    def dsum(a: String, b: String, e: String) =
      s"CAST(SUM(CASE WHEN ${m(a, b)} THEN $e END) AS DOUBLE)"
    val oorCols = numeric.map(c =>
      s"COUNT(CASE WHEN $c IS NOT NULL AND NOT (${ok(c)}) THEN 1 END) AS oor_$c")
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      Seq(
        s"COUNT(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL THEN 1 END) AS n_$k",
        s"${dsum(a, b, s"CAST($a AS DECIMAL(38,6))")} AS sx_$k",
        s"${dsum(a, b, s"CAST($b AS DECIMAL(38,6))")} AS sy_$k",
        s"${dsum(a, b, s"CAST(CAST($a AS DOUBLE) * CAST($a AS DOUBLE) AS DECIMAL(38,6))")} AS sxx_$k",
        s"${dsum(a, b, s"CAST(CAST($b AS DOUBLE) * CAST($b AS DOUBLE) AS DECIMAL(38,6))")} AS syy_$k",
        s"${dsum(a, b, s"CAST(CAST($a AS DOUBLE) * CAST($b AS DOUBLE) AS DECIMAL(38,6))")} AS sxy_$k")
    } ++ oorCols
    val selects = pairs.zipWithIndex.map { case ((a, b), k) =>
      val nD = s"CAST(n_$k AS DOUBLE)"
      val num = s"$nD * sxy_$k - sx_$k * sy_$k"
      val g = s"($nD * sxx_$k - sx_$k * sx_$k) * ($nD * syy_$k - sy_$k * sy_$k)"
      s"SELECT '$a' AS col_a, '$b' AS col_b, n_$k AS n, ROUND(CASE WHEN oor_$a + oor_$b = 0 AND $g > 0 THEN ($num) / SQRT($g) END, 6) AS corr FROM a"
    }
    s"WITH a AS (SELECT ${aggs.mkString(", ")} FROM $T)\n" +
      selects.mkString(" UNION ALL ") + "\nORDER BY col_a, col_b"
  }

  /** Equi-width histogram twin: identical double bucket math, top edge
    * closed into the last bucket, constant-column guard before the
    * division. */
  val numericHistogram: String =
    s"""WITH s AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS mn, CAST(MAX(l_extendedprice) AS DOUBLE) AS mx FROM $T),
b AS (SELECT CASE WHEN mx > mn
        THEN LEAST(CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mn) / ((mx - mn) / CAST(10 AS DOUBLE))) AS BIGINT), 9)
        ELSE 0 END AS bucket, mn, mx
      FROM $T, s WHERE l_extendedprice IS NOT NULL)
SELECT bucket,
  ROUND(mn + bucket * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS lo,
  ROUND(mn + (bucket + 1) * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS hi,
  COUNT(*) AS cnt
FROM b GROUP BY bucket, mn, mx ORDER BY bucket"""

  /** Constraint-suite twin: the same metric value expressions joined to a
    * VALUES suite; status by the same CASE semantics (unknown when the
    * metric is absent). */
  val constraintCheck: String = {
    val m = union(Seq(
      sizeSelect,
      sel("l_orderkey", "Completeness", completenessExpr("l_orderkey")),
      sel("l_quantity", "Completeness", completenessExpr("l_quantity")),
      sel("l_orderkey", "Distinctness", distinctnessExpr("l_orderkey")),
      sel("l_quantity", "Minimum", minimumExpr("l_quantity")),
      sel("l_returnflag", "MaxLength", maxLengthExpr("l_returnflag"))))
    s"""WITH m AS ($m),
s(check_name, instance, metric, op, threshold) AS (VALUES
  ('c1_size_min', '*', 'Size', '>=', 1000.0),
  ('c2_orderkey_complete', 'l_orderkey', 'Completeness', '>=', 1.0),
  ('c3_quantity_complete', 'l_quantity', 'Completeness', '>=', 0.95),
  ('c4_orderkey_distinctness', 'l_orderkey', 'Distinctness', '<=', 0.5),
  ('c5_quantity_min', 'l_quantity', 'Minimum', '>=', 1.0),
  ('c6_returnflag_len', 'l_returnflag', 'MaxLength', '<=', 1.0),
  ('c7_ghost_metric', 'no_such_col', 'Completeness', '>=', 0.5))
SELECT s.check_name, s.instance, s.metric, s.op, CAST(s.threshold AS DOUBLE) AS threshold,
  ROUND(m.value, 6) AS value,
  CASE WHEN m.value IS NULL THEN 'unknown'
       WHEN (s.op = '>=' AND m.value >= s.threshold) OR (s.op = '<=' AND m.value <= s.threshold) THEN 'pass'
       ELSE 'fail' END AS status
FROM s LEFT JOIN m ON m.instance = s.instance AND m.name = s.metric
ORDER BY s.check_name"""
  }

  /** Drift twin: the same metric expressions computed over the even/odd
    * orderkey halves, joined; 6-place quantization BEFORE the deltas
    * (publication precision), same guarded CASE semantics. */
  val profileDrift: String = {
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

  val profileLineitem: String = {
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

  // =====================================================================
  // Training-data-pipeline extensions (documents / embeddings / events)
  // =====================================================================

  /** Exact dedup by SHA-256 content hash (same hash both engines). */
  val dedupExact: String =
    "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents " +
      "GROUP BY sha256(text) ORDER BY doc_id"

  /** E71 vocab-growth twin: identical bucket algebra
    * `(id * B) // (max_id + 1)`, token first-appearance attribution, and
    * cumulative window over the B-row grid. */
  val vocabGrowth: String =
    """WITH mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       FROM documents WHERE text IS NOT NULL),
fdoc AS (SELECT w, MIN(doc_id) AS fd FROM tk GROUP BY w),
vb AS (SELECT (fd * 10) // m AS bucket, COUNT(*) AS nv FROM fdoc, mx GROUP BY 1),
tb AS (SELECT (doc_id * 10) // m AS bucket, COUNT(*) AS nt FROM tk, mx GROUP BY 1),
db AS (SELECT (doc_id * 10) // m AS bucket, COUNT(*) AS nd FROM documents, mx GROUP BY 1),
g AS (SELECT range AS bucket FROM range(10)),
j AS (SELECT g.bucket, COALESCE(db.nd, 0) AS nd, COALESCE(tb.nt, 0) AS nt,
             COALESCE(vb.nv, 0) AS nv
      FROM g LEFT JOIN db ON g.bucket = db.bucket
             LEFT JOIN tb ON g.bucket = tb.bucket
             LEFT JOIN vb ON g.bucket = vb.bucket)
SELECT bucket,
  CAST(SUM(nd) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS docs,
  CAST(SUM(nt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens,
  CAST(SUM(nv) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
FROM j ORDER BY bucket"""

  /** E70 winsorized-stats twin: exact QUANTILE_CONT bounds (matching
    * Spark's interpolating `percentile`), explicit null-preserving
    * LEAST/GREATEST clip, decSum-quantized clipped moments. */
  private def winsorSelects(c: String, pLo: String, pHi: String): Seq[String] = {
    val b = s"(SELECT CAST(QUANTILE_CONT(CAST($c AS DOUBLE), $pLo) AS DOUBLE) AS lo, " +
      s"CAST(QUANTILE_CONT(CAST($c AS DOUBLE), $pHi) AS DOUBLE) AS hi FROM $T) b"
    val clip = s"CASE WHEN $c IS NULL THEN NULL " +
      s"ELSE LEAST(GREATEST(CAST($c AS DOUBLE), b.lo), b.hi) END"
    val sumClip = s"CAST(SUM(CAST(($clip) AS DECIMAL(38,6))) AS DOUBLE)"
    val sumSqClip = s"CAST(SUM(CAST(($clip) * ($clip) AS DECIMAL(38,6))) AS DOUBLE)"
    val n = s"COUNT($c)"
    Seq(
      s"SELECT '$c' AS instance, 'WinsorizedLow-$pLo' AS name, ROUND(b.lo, 6) AS value FROM $b",
      s"SELECT '$c' AS instance, 'WinsorizedHigh-$pHi' AS name, ROUND(b.hi, 6) AS value FROM $b",
      s"SELECT '$c' AS instance, 'WinsorizedMean-$pLo-$pHi' AS name, " +
        s"ROUND($sumClip / $n, 6) AS value FROM $T, $b",
      s"SELECT '$c' AS instance, 'WinsorizedStdDev-$pLo-$pHi' AS name, " +
        s"ROUND(SQRT(GREATEST($sumSqClip / $n - POW($sumClip / $n, 2), 0.0)), 6) AS value FROM $T, $b",
      s"SELECT '$c' AS instance, 'WinsorizedClipped-$pLo-$pHi' AS name, " +
        s"ROUND(CAST(COUNT(CASE WHEN CAST($c AS DOUBLE) < b.lo OR CAST($c AS DOUBLE) > b.hi " +
        s"THEN 1 END) AS DOUBLE), 6) AS value FROM $T, $b")
  }

  val winsorizedStats: String =
    wrap(union(Lineitem.numeric.flatMap(c => winsorSelects(c, "0.01", "0.99"))))

  /** KS-drift twin (E98): pooled distinct values, conditional count
    * merge, explicit ROWS-framed cumulative window, integer counts to
    * the final double division, display-only ROUND. */
  val ksDrift: String =
    raw"""WITH u AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_orderkey % 2 AS side
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
m AS (SELECT v,
        CAST(COUNT(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS ca,
        CAST(COUNT(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS cb
      FROM u GROUP BY v),
c AS (SELECT v, ca, cb,
        SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
        SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb,
        SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
      FROM m)
SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
  CAST(COUNT(*) AS BIGINT) AS n_values,
  ROUND(MAX(ABS(CAST(cca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(ccb AS DOUBLE) / CAST(nb AS DOUBLE))), 6) AS ks_d
FROM c"""

  /** Spearman twin (E103): average-tie ranks via RANK + tie-count
    * windows, then the columnCorr moment algebra over the rank CTE
    * (DECIMAL(38,6)-quantized rank sums are exact — ranks are integers
    * or halves). */
  def spearman(pairs: Seq[(String, String)], from: String = T): String = {
    val selects = pairs.map { case (a, b) =>
      def avgRank(v: String) =
        s"CAST(RANK() OVER (ORDER BY $v) AS DOUBLE) + " +
          s"CAST(COUNT(*) OVER (PARTITION BY $v) - 1 AS DOUBLE) / CAST(2.0 AS DOUBLE)"
      val nD = "CAST(n AS DOUBLE)"
      val g = s"($nD * sxx - sx * sx) * ($nD * syy - sy * sy)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
  ROUND(CASE WHEN $g > 0 THEN ($nD * sxy - sx * sy) / SQRT($g) END, 6) AS spearman
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ra AS DECIMAL(38,6))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(ra * ra AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(rb AS DECIMAL(38,6))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(rb * rb AS DECIMAL(38,6))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(ra * rb AS DECIMAL(38,6))) AS DOUBLE) AS sxy
  FROM (
    SELECT ${avgRank("va")} AS ra, ${avgRank("vb")} AS rb
    FROM (SELECT CAST($a AS DOUBLE) AS va, CAST($b AS DOUBLE) AS vb
          FROM $from WHERE $a IS NOT NULL AND $b IS NOT NULL) c) r) g"""
    }
    selects.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** Benford twin (E97): first significant digit from the DECIMAL(38,6)
    * string rendering (never log10/floor — last-ulp coin-flip on powers
    * of ten), 1-9 spine LEFT JOIN, LN-based expected shares, chi-square
    * terms ROUND(·,12) → DECIMAL(38,12) window-summed. */
  val benfordDigits: String =
    raw"""WITH d AS (SELECT regexp_extract(CAST(CAST(l_extendedprice AS DECIMAL(38,6)) AS VARCHAR), '[1-9]') AS ds FROM lineitem),
c AS (SELECT CAST(ds AS INT) AS digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d WHERE ds IS NOT NULL AND ds <> '' GROUP BY 1),
s AS (SELECT t.digit, COALESCE(c.n_obs, 0) AS n_obs FROM (SELECT UNNEST(range(1, 10)) AS digit) t LEFT JOIN c ON t.digit = c.digit),
w AS (SELECT digit, n_obs, SUM(n_obs) OVER () AS n, LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(CAST(10.0 AS DOUBLE)) AS exp_share FROM s),
f AS (SELECT digit, n_obs,
        CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share, exp_share,
        (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - exp_share) * (CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - exp_share) / exp_share * CAST(n AS DOUBLE) AS term
      FROM w)
SELECT digit, n_obs, ROUND(obs_share, 6) AS obs_share, ROUND(exp_share, 6) AS exp_share,
  ROUND(CAST(SUM(CAST(ROUND(term, 12) AS DECIMAL(38,12))) OVER () AS DOUBLE), 6) AS chi2
FROM f ORDER BY digit"""

  /** IQR-outlier twin (E96): raw QUANTILE_CONT quartiles (the proven E70
    * bit-parity), fence arithmetic in the same fixed double order,
    * conditional counts against the RAW fences, ROUND for display only. */
  val iqrOutliers: String = {
    val rows = Lineitem.numeric.map { c =>
      val q = s"(SELECT CAST(QUANTILE_CONT(CAST($c AS DOUBLE), 0.25) AS DOUBLE) AS q1, " +
        s"CAST(QUANTILE_CONT(CAST($c AS DOUBLE), 0.75) AS DOUBLE) AS q3 FROM $T) q"
      val f = s"(SELECT q1, q3, q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo, " +
        s"q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi FROM $q) f"
      s"""SELECT '$c' AS instance, ROUND(f.q1, 6) AS q1, ROUND(f.q3, 6) AS q3,
  ROUND(f.lo, 6) AS fence_lo, ROUND(f.hi, 6) AS fence_hi,
  CAST(COUNT(CASE WHEN CAST($c AS DOUBLE) < f.lo THEN 1 END) AS BIGINT) AS n_below,
  CAST(COUNT(CASE WHEN CAST($c AS DOUBLE) > f.hi THEN 1 END) AS BIGINT) AS n_above
FROM $T, $f GROUP BY 1, 2, 3, 4, 5"""
    }
    s"SELECT * FROM (\n${rows.mkString("\nUNION ALL\n")}) u ORDER BY instance"
  }

  /** MAD-outlier twin (E114): nested exact medians (QUANTILE_CONT twice,
    * the deviation median over the SAME |x − med| doubles), identical
    * fixed-order fence algebra. */
  val madOutliers: String = {
    val rows = Lineitem.numeric.map { c =>
      val m = s"(SELECT CAST(QUANTILE_CONT(CAST($c AS DOUBLE), 0.5) AS DOUBLE) AS med FROM $T) m"
      val d = s"(SELECT med, CAST(QUANTILE_CONT(ABS(CAST($c AS DOUBLE) - med), 0.5) AS DOUBLE) AS mad FROM $T, $m GROUP BY med) d"
      val f = s"(SELECT med, mad, med - CAST(3.0 AS DOUBLE) * mad AS lo, " +
        s"med + CAST(3.0 AS DOUBLE) * mad AS hi FROM $d) f"
      s"""SELECT '$c' AS instance, ROUND(f.med, 6) AS median, ROUND(f.mad, 6) AS mad,
  ROUND(f.lo, 6) AS fence_lo, ROUND(f.hi, 6) AS fence_hi,
  CAST(COUNT(CASE WHEN CAST($c AS DOUBLE) < f.lo THEN 1 END) AS BIGINT) AS n_below,
  CAST(COUNT(CASE WHEN CAST($c AS DOUBLE) > f.hi THEN 1 END) AS BIGINT) AS n_above
FROM $T, $f GROUP BY 1, 2, 3, 4, 5"""
    }
    s"SELECT * FROM (\n${rows.mkString("\nUNION ALL\n")}) u ORDER BY instance"
  }

  /** E69 blocklist-filter twin: the operator's Bloom prefilter is a pure
    * routing optimization (no false negatives; false positives resolved by
    * the exact anti-join), so the oracle is the plain anti-join over the
    * identically-derived blocklist (same sha256 bucket math as the
    * sampling oracles). */
  val blocklistFilter: String =
    """WITH bl AS (
  SELECT DISTINCT source FROM documents
  WHERE ('0x' || substr(sha256(source || 'blocklist'), 1, 8))::BIGINT % 10000 < 3000
)
SELECT d.doc_id, d.source FROM documents d
WHERE d.source IS NULL OR NOT EXISTS (SELECT 1 FROM bl WHERE bl.source = d.source)
ORDER BY d.doc_id"""

  /** E68 paragraph/span-dedup twin: identical fixed-window segmentation
    * (5-word chunks of the single-space tokenization, zipped
    * unnest/generate_subscripts), global span frequency, drop spans with
    * count >= 2, reassemble survivors in span order with single spaces.
    * COALESCE('') mirrors Spark's concat_ws over an empty array. */
  val paragraphDedup: String =
    """WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS arr FROM documents WHERE text IS NOT NULL
), z AS (
  SELECT doc_id, unnest(arr) AS w, generate_subscripts(arr, 1) AS i FROM toks
), spans AS (
  SELECT doc_id, (i - 1) // 5 AS span_idx, string_agg(w, ' ' ORDER BY i) AS span
  FROM z GROUP BY doc_id, (i - 1) // 5
), freq AS (
  SELECT span, COUNT(*) AS c FROM spans GROUP BY span
), kept AS (
  SELECT s.doc_id, s.span_idx, s.span
  FROM spans s JOIN freq f USING (span) WHERE f.c < 2
), agg AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.clean_text, '') AS clean_text,
  CAST(COALESCE(t.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(COALESCE(t.n_spans, 0) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
FROM documents d
LEFT JOIN agg a ON d.doc_id = a.doc_id
LEFT JOIN tot t ON d.doc_id = t.doc_id
ORDER BY d.doc_id"""

  /** Incremental-dedup twin: EXISTS semi-join on the content hash. */
  val dedupIncremental: String =
    """SELECT n.doc_id, EXISTS (
  SELECT 1 FROM documents o WHERE o.doc_id < 400 AND sha256(o.text) = sha256(n.text)
) AS dup FROM documents n WHERE n.doc_id >= 400 ORDER BY n.doc_id"""

  /** Shared CTE chain computing exact word-3-gram Jaccard pairs ≥ 0.5
    * (`jpairs(id_a, id_b)`) — the oracle twin of Dedup.ngramJaccard with
    * no doc-freq cap. */
  private val jaccardCtes: String =
    raw"""words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jpairs AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT id_a, id_b, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b) q
  WHERE jaccard >= 0.5)"""

  val dedupNgramJaccard: String =
    s"WITH $jaccardCtes\nSELECT id_a, id_b, jaccard FROM jpairs ORDER BY id_a, id_b"

  /** Dedup-survival twin (E202): the same shingle/intersection chain at
    * the 0.1 floor, a 9-row threshold grid non-equi-joined against the
    * pair relation, exact distinct-removal counts per slice. */
  lazy val dedupSurvival: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jp AS (SELECT id_a, id_b, jaccard FROM (
    SELECT id_a, id_b, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b) q
  WHERE jaccard >= 0.1),
grid AS (SELECT CAST(i AS DOUBLE) / CAST(10 AS DOUBLE) AS t FROM UNNEST(range(1, 10)) g(i)),
agg AS (SELECT t, CAST(COUNT(jp.id_a) AS BIGINT) AS n_pairs,
    CAST(COUNT(DISTINCT jp.id_b) AS BIGINT) AS n_removed
  FROM grid LEFT JOIN jp ON jp.jaccard >= grid.t GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
SELECT ROUND(t, 1) AS threshold, n_pairs, n_removed,
  n_docs - n_removed AS n_survivors
FROM agg, tot ORDER BY threshold"""

  /** Connected components over the Jaccard pair graph: transitive closure
    * via a recursive CTE, each node labeled with the smallest reachable
    * doc id — the oracle twin of Clustering.dedupClusters (which computes
    * the same fixpoint with the alternating-star algorithm). */
  val dedupClusters: String =
    s"""WITH RECURSIVE $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION SELECT id_b, id_a FROM jpairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u ORDER BY doc_id"""

  /** Leakage-safe split twin: the dedupClusters recursive-CTE component
    * labels, split key = COALESCE(cluster canonical id, own doc_id),
    * bucketed by the shared sha256 hash into the same 90/5/5 ranges as
    * datasetSplit. */
  val leakageSafeSplit: String =
    s"""WITH RECURSIVE $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION SELECT id_b, id_a FROM jpairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
clusters AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
keyed AS (
  SELECT d.doc_id, ('0x' || substr(sha256(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR) || 'graft'), 1, 8))::BIGINT % 10000 AS b
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
SELECT doc_id, CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END AS split
FROM keyed ORDER BY doc_id"""

  /** Decontamination twin: distinct word-3-gram shingles per doc, train
    * (doc_id % 50 != 0) joined to bench (doc_id % 50 = 0) on shared
    * shingles, pairs with >= 3 shared shingles flagged. */
  val contamination: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
pairs AS (
  SELECT a.doc_id AS train_id, b.doc_id AS bench_id, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s
  WHERE a.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
  GROUP BY 1, 2)
SELECT train_id, bench_id, shared FROM pairs WHERE shared >= 3 ORDER BY train_id, bench_id"""

  /** Contamination-ratio twin (E93): same trigram CTE, train side as a
    * DISTINCT shingle set, LEFT JOIN membership, per-eval-doc counts. */
  val contaminationRatio: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 <> 0),
per AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams, CAST(COUNT(t.s) AS BIGINT) AS n_contaminated
        FROM sh b LEFT JOIN train t ON b.s = t.s WHERE b.doc_id % 50 = 0 GROUP BY 1)
SELECT doc_id, n_ngrams, n_contaminated,
  ROUND(CAST(n_contaminated AS DOUBLE) / CAST(n_ngrams AS DOUBLE), 6) AS contaminated_ratio
FROM per ORDER BY doc_id"""

  /** BM25 twin for the fixed query (spark, merge, vector), k1=1.2, b=0.75.
    * Every fractional constant is CAST to DOUBLE (a bare 2.2 is DECIMAL in
    * DuckDB — exact-decimal then one late rounding, which does NOT equal
    * Java double arithmetic), and the three term scores are added in the
    * same fixed left-associated order as the Spark expression tree, so the
    * raw doubles match bit-for-bit. LN not LOG (DuckDB LOG is log10). */
  val bm25TopK: String = {
    def term(i: Int): String =
      s"(CASE WHEN tf$i > 0 THEN LN((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (CAST(df$i AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * CAST(tf$i AS DOUBLE) * CAST(2.2 AS DOUBLE) / (CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) ELSE CAST(0.0 AS DOUBLE) END)"
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
  CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf0,
  CAST(len(list_filter(w, x -> x = 'merge')) AS BIGINT) AS tf1,
  CAST(len(list_filter(w, x -> x = 'vector')) AS BIGINT) AS tf2 FROM words),
stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
  CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
  CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
  CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2 FROM base),
scored AS (SELECT doc_id, ${term(0)} + ${term(1)} + ${term(2)} AS raw FROM base, stats)
SELECT doc_id, ROUND(raw, 6) AS score FROM scored ORDER BY raw DESC, doc_id LIMIT 20"""
  }

  /** Multi-query BM25 twin (E190): query terms from the eval slice
    * (doc_id % 101 = 0), postings over the corpus slice pruned to the
    * query-term set, df stopping (df ≤ 1000) + per-query 16 rarest
    * terms (df asc, term asc), the E27 score with every constant
    * interpolated from the SAME JVM doubles the Spark side uses as
    * literals, per-(query, doc) terms ROUND(·, 12) decimal-summed, rank
    * on the EXACT decimal (doc-id tie-break). */
  lazy val bm25Multi: String = {
    val k1 = 1.2; val b = 0.75
    raw"""WITH cw AS (SELECT doc_id, $wsToksLowerSql AS w FROM documents WHERE doc_id % 101 <> 0),
qw AS (SELECT doc_id AS query_id, $wsToksLowerSql AS w FROM documents WHERE doc_id % 101 = 0),
dls AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM cw),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dls),
qt AS (SELECT DISTINCT query_id, t FROM (SELECT query_id, unnest(w) AS t FROM qw) z),
post AS (SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(w) AS t FROM cw) x
  WHERE t IN (SELECT t FROM qt) GROUP BY 1, 2),
dfr AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1 HAVING COUNT(*) <= 1000),
qsel AS (SELECT query_id, t, df FROM (
  SELECT q.query_id, q.t, d.df,
    ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY d.df, q.t) AS trk
  FROM qt q JOIN dfr d USING (t)) z WHERE trk <= 16),
cand AS (SELECT query_id, p.doc_id,
    CAST(ROUND(LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) * CAST(tf AS DOUBLE) * ${k1 + 1.0} / (CAST(tf AS DOUBLE) + $k1 * (${1.0 - b} + $b * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))), 12) AS DECIMAL(38,12)) AS term
  FROM qsel s JOIN post p USING (t) JOIN dls USING (doc_id), stats),
sc AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms, SUM(term) AS s
  FROM cand GROUP BY 1, 2)
SELECT query_id, doc_id, n_terms, ROUND(CAST(s AS DOUBLE), 6) AS score
FROM sc
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) <= 10
ORDER BY query_id, doc_id"""
  }

  /** Unigram-LM twin: same tokenization, per-token ln(c/total) as pure
    * double math, addends quantized to DECIMAL(38,12) before the per-doc
    * sum (order-independent — the engine's exact-sum contract). LN not LOG
    * (DuckDB LOG is log10). */
  val lmQuality: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t FROM words),
vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
lp AS (SELECT doc_id, CAST(ROUND(LN(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)), 12) AS DECIMAL(38,12)) AS lp FROM tok JOIN vocab USING (t), tot),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(lp) AS slp FROM lp GROUP BY 1)
SELECT doc_id, n_tokens,
  ROUND(CAST(slp AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS avg_logprob,
  ROUND(EXP(-(CAST(slp AS DOUBLE) / CAST(n_tokens AS DOUBLE))), 6) AS perplexity
FROM agg ORDER BY doc_id"""

  /** Bigram-LM twin (E83): same tokenization, positions via
    * generate_subscripts, adjacent-position self-join to form bigrams,
    * Laplace counts in integer algebra, the LN at the same double
    * division, ROUND(·,12) → DECIMAL(38,12) per-doc sums. */
  val bigramLm: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM words),
big AS (SELECT a.doc_id, a.t AS w1, b.t AS w2 FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cb) AS cw FROM bc GROUP BY 1),
voc AS (SELECT COUNT(DISTINCT t) AS v FROM tok),
lp AS (SELECT doc_id, CAST(ROUND(LN(CAST(cb + 1 AS DOUBLE) / CAST(cw + v AS DOUBLE)), 12) AS DECIMAL(38,12)) AS lp
       FROM big JOIN bc USING (w1, w2) JOIN ctx USING (w1), voc),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, SUM(lp) AS slp FROM lp GROUP BY 1)
SELECT doc_id, n_bigrams,
  ROUND(CAST(slp AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS avg_logprob,
  ROUND(EXP(-(CAST(slp AS DOUBLE) / CAST(n_bigrams AS DOUBLE))), 6) AS perplexity
FROM agg ORDER BY doc_id"""

  /** DSIR importance-weight twin (E157): the same word unigram+bigram
    * features, the same 31-adic rolling hash of the FULL feature string
    * mod 64 buckets, target = English-labeled docs, +1-smoothed
    * histograms, per-bucket log-ratios at ROUND(LN(double÷double),12) →
    * DECIMAL(38,12) per-doc sums (the bigram-LM contract), zero-feature
    * docs carrying log 1 = 0 via the LEFT JOIN. */
  lazy val dsirWeights: String = // lazy: wsToksLowerSql initializes later in this object
    raw"""WITH words AS (SELECT doc_id, lang, $wsToksLowerSql AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM words),
feats AS (
  SELECT doc_id, t AS f FROM tok
  UNION ALL
  SELECT a.doc_id, a.t || ' ' || b.t AS f
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
fb AS (SELECT f.doc_id, d.lang = 'en' AS is_t,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(f.f, ''), c -> CAST(ord(c) AS BIGINT))),
      (a, b) -> (a * 31 + b) % 2147483647) % 64 AS bucket
  FROM feats f JOIN documents d USING (doc_id)),
hist AS (SELECT bucket,
    SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct, COUNT(*) AS cr
  FROM fb GROUP BY 1),
tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM hist),
lr AS (SELECT bucket,
    CAST(ROUND(LN(CAST(ct + 1 AS DOUBLE) / CAST(nt + 64 AS DOUBLE))
             - LN(CAST(cr + 1 AS DOUBLE) / CAST(nr + 64 AS DOUBLE)), 12)
      AS DECIMAL(38,12)) AS lr
  FROM hist, tot),
pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, SUM(lr) AS s
  FROM fb JOIN lr USING (bucket) GROUP BY 1)
SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats,
  ROUND(CAST(COALESCE(s, 0) AS DOUBLE), 6) AS log_weight
FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY d.doc_id"""

  /** BPE-induction twin (E159): the identical iteration REPLAYED as
    * chained CTEs — per step, weighted adjacent-pair counts over the
    * current vocabulary symbolization, the same (count DESC, l, r)
    * deterministic best-pair cut, and the same greedy left-to-right
    * non-overlapping merge as a `list_reduce` fold (accumulator =
    * list-of-symbols; the last element either absorbs the next symbol
    * into the merged pair or the symbol appends — provably equivalent to
    * the scan because a symbol merged THIS pass equals l||r and can
    * never equal l again, r being non-empty). Eight steps, matching the
    * declared query's nMerges. */
  /** The chained induction CTEs shared by [[bpeMerges]] and
    * [[bpeEncode]]: `WITH vocab, it0, (p_k, b_k, it_k)*` — it`K` holds
    * the vocabulary fully encoded under the K learned merges. */
  private def bpeChain(K: Int): String = {
    def fold(b: String) =
      s"list_reduce(list_transform(syms, s -> [s]), " +
        s"(acc, x) -> CASE WHEN acc[-1] = $b.l AND x[1] = $b.r " +
        s"THEN list_append(list_slice(acc, 1, len(acc) - 1), $b.l || $b.r) " +
        s"ELSE list_concat(acc, x) END)"
    val sb = new StringBuilder
    sb ++= s"""WITH vocab AS (SELECT t AS w, COUNT(*) AS cnt FROM (
  SELECT unnest($wsToksLowerSql) AS t FROM documents) u GROUP BY 1),
it0 AS (SELECT w, cnt, string_split(w, '') AS syms FROM vocab)"""
    for (k <- 1 to K) {
      sb ++= s""",
p$k AS (SELECT pr['l'] AS l, pr['r'] AS r, SUM(cnt) AS c FROM (
  SELECT cnt, unnest(list_transform(range(1, len(syms)), i -> {'l': syms[i], 'r': syms[i+1]})) AS pr
  FROM it${k - 1} WHERE len(syms) >= 2) t GROUP BY 1, 2),
b$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
it$k AS (SELECT w, cnt, ${fold("b")} AS syms FROM it${k - 1}, b$k b)"""
    }
    sb.toString
  }

  lazy val bpeMerges: String = {
    val K = 8
    bpeChain(K) + "\n" + (1 to K).map(k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, l AS lhs, r AS rhs, " +
        s"l || r AS merged, CAST(c AS BIGINT) AS pair_count FROM b$k")
      .mkString("\nUNION ALL\n") + "\nORDER BY merge_rank"
  }

  /** BPE-encode twin (E160): the encoded vocabulary is the induction
    * chain's own it8 (merges apply in rank order — the single-pass-per-
    * rank equivalence argued in BpeInduction.bpeEncode's doc), joined
    * back onto the corpus words; one doc-keyed rollup. */
  lazy val bpeEncode: String =
    bpeChain(8) + s""",
enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS ntok FROM it8),
wd AS (SELECT doc_id, unnest($wsToksLowerSql) AS w FROM documents)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(ntok) AS BIGINT) AS n_bpe_tokens,
  ROUND(CAST(SUM(LENGTH(w)) AS DOUBLE) / CAST(SUM(ntok) AS DOUBLE), 6) AS chars_per_token
FROM wd JOIN enc USING (w) GROUP BY doc_id ORDER BY doc_id"""

  /** Gini-concentration twin (E106): per-group token totals, ROW_NUMBER
    * over the same (x ASC, g ASC) order, identical closed-form double
    * algebra. */
  lazy val giniConcentration: String =
    raw"""WITH t AS (SELECT source AS g, SUM(COALESCE(len($wsToksSql), 0)) AS x
           FROM documents GROUP BY 1),
r AS (SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x ASC, g ASC) AS BIGINT) * x AS ix FROM t),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, CAST(SUM(x) AS BIGINT) AS total_tokens,
             CAST(SUM(ix) AS BIGINT) AS six FROM r)
SELECT n_groups, total_tokens,
  CASE WHEN total_tokens = 0 OR n_groups = 0 THEN NULL
       ELSE ROUND((CAST(2.0 AS DOUBLE) * CAST(six AS DOUBLE)) /
                  (CAST(n_groups AS DOUBLE) * CAST(total_tokens AS DOUBLE)) -
                  CAST(n_groups + 1 AS DOUBLE) / CAST(n_groups AS DOUBLE), 6) END AS gini
FROM a"""

  /** Vocabulary-coverage twin (E84): same tokenization, top-k vocab under
    * the (freq DESC, token ASC) total order, LEFT JOIN membership test,
    * per-doc OOV counts and ROUND(·,6) rate. */
  def vocabCoverage(k: Int): String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t FROM words),
vocab AS (SELECT t FROM (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1 ORDER BY c DESC, t ASC LIMIT $k)),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(CASE WHEN v.t IS NULL THEN 1 END) AS BIGINT) AS n_oov
        FROM tok LEFT JOIN vocab v ON tok.t = v.t GROUP BY 1)
SELECT doc_id, n_tokens, n_oov,
  ROUND(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS oov_rate
FROM per ORDER BY doc_id"""

  /** TF-IDF keyword twin: same tokenization, tf·ln(N/df) with
    * CAST-to-DOUBLE math, (score DESC, token ASC) rank tie-break. */
  val tfidfKeywords: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t FROM words),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (SELECT doc_id, t, CAST(tf AS DOUBLE) * LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS s
  FROM tf JOIN dfreq USING (t), n),
ranked AS (SELECT doc_id, t, s, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, t ASC) AS rank FROM scored)
SELECT doc_id, t AS token, ROUND(s, 6) AS tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""

  /** Repetition-metrics twin: same tokenization as the other text oracles,
    * per-doc token/bigram frequency profiles computed list-wise, fractions
    * CASE-guarded exactly like the Spark side. */
  val repetitionMetrics: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tokc AS (SELECT doc_id, t, COUNT(*) AS c FROM (SELECT doc_id, unnest(w) AS t FROM words) GROUP BY 1, 2),
toks AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS mx FROM tokc GROUP BY 1),
bigc AS (SELECT doc_id, g, COUNT(*) AS c FROM (SELECT doc_id, w[i] || ' ' || w[i+1] AS g FROM words, UNNEST(range(1, len(w))) s(i)) GROUP BY 1, 2),
bigs AS (SELECT doc_id, MAX(c) AS mb, CAST(SUM(c) AS BIGINT) AS nb FROM bigc GROUP BY 1)
SELECT d.doc_id,
  COALESCE(n_tokens, 0) AS n_tokens,
  COALESCE(n_distinct, 0) AS n_distinct,
  ROUND(CASE WHEN n_tokens > 0 THEN 1.0 - n_distinct * 1.0 / n_tokens END, 6) AS dup_token_frac,
  COALESCE(mx, 0) AS max_token_freq,
  ROUND(CASE WHEN nb > 0 THEN mb * 1.0 / nb END, 6) AS top_bigram_frac
FROM documents d LEFT JOIN toks ON d.doc_id = toks.doc_id LEFT JOIN bigs ON d.doc_id = bigs.doc_id
ORDER BY d.doc_id"""

  /** PII scan twin: identical rendered-text expression, identical regex
    * patterns (shared constants — valid in both Java regex and RE2 with the
    * same leftmost-first semantics), identical email→IP→phone replacement
    * order. */
  val piiScan: String = {
    import graft.functions.PiiFunctions.{EmailPattern, Ipv4Pattern, PhonePattern}
    s"""WITH r AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
  CASE WHEN doc_id % 3 = 0 THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) || '.8' ELSE '' END ||
  CASE WHEN doc_id % 5 = 0 THEN ' tel 25-989-741-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '$EmailPattern')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '$Ipv4Pattern')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(t, '$PhonePattern')) AS BIGINT) AS n_phones,
  sha256(regexp_replace(regexp_replace(regexp_replace(t, '$EmailPattern', '[EMAIL]', 'g'), '$Ipv4Pattern', '[IP]', 'g'), '$PhonePattern', '[PHONE]', 'g')) AS redacted_sha
FROM r ORDER BY doc_id"""
  }

  /** Left-fold double dot product — matches Spark `aggregate` (0.0 seed,
    * left-to-right) bit-for-bit. */
  private def listDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"

  private def listNorm(a: String): String =
    s"SQRT(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"

  /** Brute-force cosine top-10 per query vector (query set = vec_id % 97 = 0),
    * ranked on the 6-dp-rounded cosine with id tie-break. */
  val annCosineTopK: String =
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0)
SELECT query_id, neighbor_id, cos FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM q CROSS JOIN embeddings e) t
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
ORDER BY query_id, neighbor_id"""

  /** Top-50 closest embedding pairs — the near-dup review list (exact
    * pairwise twin of Similarity.cosineNearDupPairs). */
  val dedupEmbeddingCosine: String =
    s"""SELECT id_a, id_b, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(${listDot("a.embedding", "b.embedding")} / (${listNorm("a.embedding")} * ${listNorm("b.embedding")}), 6) AS cos
  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id) t
ORDER BY cos DESC, id_a, id_b LIMIT 50"""

  /** Nearest-centroid twin: same fold dot/norm, rank 1 per vector on
    * (6-dp cosine DESC, centroid_id ASC). */
  val knnAssign: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
s AS (SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0)
SELECT vec_id, centroid_id, cos FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1
ORDER BY vec_id"""

  /** JSON property extraction + grouped aggregate over the events stream
    * table (props is a JSON string column). */
  val eventsJson: String =
    "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
      "COUNT(*) AS n_events, " +
      "ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value " +
      "FROM events GROUP BY 1 ORDER BY 1"

  /** The deterministic sampling hash bucket — identical algebra to
    * Sampling.hashBucket (first 8 hex chars of sha256(key ++ salt) as an
    * unsigned int, mod 10000). */
  private val sampleBucket: String =
    "(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::BIGINT % 10000)"

  val sampleDeterministic: String =
    s"SELECT doc_id FROM documents WHERE $sampleBucket < 1000 ORDER BY doc_id"

  /** Temperature-mixture twin (Sampling.mixtureResample, alpha = 0.5,
    * target = corpus size): per-language share smoothed by POW(·, 0.5)
    * (= correctly-rounded sqrt in both engines), quantized to
    * DECIMAL(38,6) before the exact normalizer sum — the engine's standard
    * cross-engine FP contract — then the same round(rate·10⁴) bucket bound
    * over the same sha256 bucket. */
  val mixtureResample: String =
    s"""WITH counts AS (SELECT lang AS stratum, COUNT(*) AS n FROM documents WHERE lang IS NOT NULL GROUP BY lang),
tot AS (SELECT SUM(n) AS nn FROM counts),
sm AS (SELECT stratum, n, GREATEST(CAST(POW(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 0.5) AS DECIMAL(38,6)), CAST(0.000001 AS DECIMAL(38,6))) AS sd FROM counts, tot),
norm AS (SELECT SUM(sd) AS s FROM sm),
bounds AS (SELECT stratum,
  CAST(ROUND(LEAST(1.0, CAST(sd AS DOUBLE) / CAST(s AS DOUBLE) * (SELECT CAST(nn AS DOUBLE) FROM tot) / CAST(n AS DOUBLE)) * 10000) AS BIGINT) AS bound
  FROM sm, norm)
SELECT d.doc_id, d.lang FROM documents d JOIN bounds b ON d.lang = b.stratum
WHERE $sampleBucket < b.bound ORDER BY d.doc_id"""

  val datasetSplit: String =
    s"""SELECT doc_id, CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END AS split
FROM (SELECT doc_id, $sampleBucket AS b FROM documents) q ORDER BY doc_id"""

  /** Stratified-sample twin: strata by integer-divided char length, up to
    * 10 docs per stratum in (hash bucket, doc_id) order — the same bucket
    * algebra as [[sampleDeterministic]]. */
  val stratifiedSample: String =
    s"""SELECT doc_id, stratum FROM (
  SELECT doc_id, LENGTH(text) // 100 AS stratum,
    ROW_NUMBER() OVER (PARTITION BY LENGTH(text) // 100 ORDER BY $sampleBucket, doc_id) AS rn
  FROM documents) q WHERE rn <= 10 ORDER BY doc_id"""

  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  private val wsToksSql = raw"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
  private val wsToksLowerSql = raw"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"

  private def stopList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Whitespace + BPE-ish token counts per document. */
  /** Sequence-packing twin: the windowed prefix sum DuckDB can afford on
    * oracle-scale data (the Spark side computes the same prefix sum
    * distributedly — two-phase per-partition totals + offset seeding). */
  val sequencePacking: String =
    s"""WITH t AS (SELECT doc_id, CAST(len($wsToksSql) AS BIGINT) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t)
SELECT doc_id, n_tokens, cum_before // 1000 AS pack_id, cum_before FROM c ORDER BY doc_id"""

  /** Streaming-dedup twin: the final complete-mode state equals the batch
    * group-by-content-hash dedup table. */
  val streamingDedup: String =
    "SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_hash, COUNT(*) AS dup_count " +
      "FROM documents GROUP BY sha256(text) ORDER BY doc_id"

  /** Chunking twin: same start grid (stride 48), same slice clamping, same
    * space-joined SHA-256 fingerprint over original-case tokens. */
  val docChunks: String =
    s"""WITH words AS (SELECT doc_id, $wsToksSql AS w FROM documents),
c AS (SELECT doc_id, w, CAST(i AS BIGINT) AS chunk_idx
  FROM words, UNNEST(range(0, CASE WHEN len(w) = 0 THEN 0
    WHEN len(w) > 64 THEN CAST(CEIL((len(w) - 64) / 48.0) AS BIGINT) + 1
    ELSE 1 END)) t(i))
SELECT doc_id, chunk_idx, chunk_idx * 48 + 1 AS start_tok,
  CAST(LEAST(64, len(w) - chunk_idx * 48) AS BIGINT) AS n_tokens,
  sha256(array_to_string(list_slice(w, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS chunk_sha
FROM c ORDER BY doc_id, chunk_idx"""

  val tokenCount: String =
    s"SELECT doc_id, CAST(len($wsToksSql) AS BIGINT) AS ws_tokens, " +
      s"CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS bpe_tokens " +
      "FROM documents ORDER BY doc_id"

  /** Length / punctuation / stopword quality metrics + composite score
    * (identical expression tree to TextFunctions.qualityScore; the CASE
    * guards mirror its null-on-empty division guards). */
  val textQuality: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""SELECT doc_id, n_chars, ws_tokens,
  ROUND(CASE WHEN n_chars > 0 THEN punct * 1.0 / n_chars END, 6) AS punct_ratio,
  ROUND(CASE WHEN ws_tokens > 0 THEN stop_hits * 1.0 / ws_tokens END, 6) AS stopword_ratio,
  ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS quality
FROM (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents) q ORDER BY doc_id"""
  }

  /** Corpus-card twin: every card number on an already-proven contract —
    * integer counts, DECIMAL(38,6)-quantized quality mean rendered as
    * DOUBLE on both engines (the join_cardinality lesson), QUANTILE_CONT
    * bit-parity for the token median, count-desc/lang-asc-NULLS-FIRST
    * argmax tie-break matching Spark's asc (nulls first). */
  lazy val corpusCard: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT lang, sha256(text) AS text_h, ws_tokens,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS q
  FROM (
    SELECT lang, text, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) i),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(ws_tokens) AS BIGINT) AS total_ws_tokens,
    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
    CAST(COUNT(DISTINCT text_h) AS BIGINT) AS nd,
    ROUND(CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) / COUNT(q), 6) AS mean_quality,
    ROUND(QUANTILE_CONT(CAST(ws_tokens AS DOUBLE), 0.5), 6) AS p50_tokens
  FROM b),
t AS (
  SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM b GROUP BY 1 ORDER BY c DESC, lang ASC NULLS FIRST LIMIT 1)
SELECT n_docs, total_ws_tokens, n_langs, top_lang,
  ROUND(CAST(c AS DOUBLE) / n_docs, 6) AS top_lang_share,
  ROUND(CAST(n_docs - nd AS DOUBLE) / n_docs, 6) AS exact_dup_rate,
  mean_quality, p50_tokens
FROM m, t"""
  }

  /** Top-k-by-quality twin (E107): the textQuality score expression,
    * ROW_NUMBER under the same (score DESC NULLS LAST, doc_id ASC)
    * total order, rank ≤ k. */
  lazy val topkByQuality: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH s AS (
  SELECT doc_id, lang,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM (
    SELECT doc_id, lang, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) q),
r AS (SELECT doc_id, lang, score,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC NULLS LAST, doc_id ASC) AS rn
      FROM s)
SELECT doc_id, lang, score FROM r WHERE rn <= 10 ORDER BY lang, doc_id"""
  }

  /** Domain report-card twin (E74): the textQuality inner relation plus
    * sentinel-coalesced content hash; dup counts via (hash, domain)
    * partials joined to corpus hash frequencies; decimal-quantized mean
    * quality (the decSum contract). */
  val domainStats: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT domain, lang, h, nt,
    CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END AS q
  FROM (
    SELECT source AS domain, lang,
      COALESCE(sha256(text), '__null__') AS h,
      CAST(COALESCE(len($wsToksSql), 0) AS BIGINT) AS nt,
      CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) i),
hd AS (SELECT h, domain, COUNT(*) AS c FROM b GROUP BY 1, 2),
hf AS (SELECT h, SUM(c) AS f FROM hd GROUP BY 1),
dup AS (SELECT domain, CAST(COALESCE(SUM(CASE WHEN f > 1 THEN c END), 0) AS BIGINT) AS dup_docs
  FROM hd JOIN hf USING (h) GROUP BY 1),
agg AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(nt) AS BIGINT) AS n_tokens,
    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
    ROUND(CAST(SUM(CAST(ROUND(q, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(q), 6) AS mean_quality
  FROM b GROUP BY 1)
SELECT agg.domain, n_docs, n_tokens, n_langs, mean_quality,
  CAST(COALESCE(dup_docs, 0) AS BIGINT) AS dup_docs
FROM agg LEFT JOIN dup USING (domain) ORDER BY domain"""
  }

  /** Split-divergence twin (E75): the datasetSplit bucket CASE, one
    * token pivot, guarded shares, identical JSD term algebra with
    * ROUND(·,12) → DECIMAL(38,12) sums (the PSI contract). */
  val splitDivergence: String = {
    val names = Seq("train", "valid", "test")
    val caseSplit =
      "CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END"
    val cCols = names.map(n =>
      s"COUNT(CASE WHEN split = '$n' THEN 1 END) AS c_$n").mkString(",\n    ")
    val tCols = names.flatMap(n => Seq(
      s"CAST(COALESCE(SUM(c_$n), 0) AS BIGINT) AS t_$n",
      s"CAST(COUNT(CASE WHEN c_$n > 0 THEN 1 END) AS BIGINT) AS v_$n"))
      .mkString(",\n    ")
    val pCols = names.map(n =>
      s"CASE WHEN t_$n > 0 THEN c_$n * 1.0 / t_$n ELSE 0.0 END AS p_$n")
      .mkString(",\n    ")
    val pairs = for { i <- names.indices; j <- names.indices if i < j }
      yield (names(i), names(j))
    val dCols = pairs.flatMap { case (a, b) =>
      val m = s"((p_$a + p_$b) / 2.0)"
      Seq(
        s"ROUND(CAST(COALESCE(SUM(CAST(ROUND(0.5 * (CASE WHEN c_$a > 0 THEN p_$a * LN(p_$a / $m) ELSE 0.0 END) + 0.5 * (CASE WHEN c_$b > 0 THEN p_$b * LN(p_$b / $m) ELSE 0.0 END), 12) AS DECIMAL(38,12))), 0) AS DOUBLE), 6) AS jsd_${a}_$b",
        s"CAST(COUNT(CASE WHEN c_$a > 0 AND c_$b > 0 THEN 1 END) AS BIGINT) AS shared_${a}_$b")
    }.mkString(",\n    ")
    val rows = pairs.map { case (a, b) =>
      s"SELECT '$a' AS split_a, '$b' AS split_b, t_$a AS tokens_a, t_$b AS tokens_b, v_$a AS vocab_a, v_$b AS vocab_b, shared_${a}_$b AS vocab_shared, jsd_${a}_$b AS jsd FROM t, d"
    }.mkString("\nUNION ALL ")
    s"""WITH s AS (
  SELECT text, $caseSplit AS split
  FROM (SELECT doc_id, text, $sampleBucket AS b FROM documents) q0),
tok AS (SELECT split, t.x AS token
  FROM s, UNNEST($wsToksLowerSql) t(x) WHERE text IS NOT NULL),
c AS (SELECT token,
    $cCols
  FROM tok GROUP BY 1),
t AS (SELECT
    $tCols
  FROM c),
pt AS (SELECT c.*,
    $pCols
  FROM c CROSS JOIN t),
d AS (SELECT
    $dCols
  FROM pt)
SELECT * FROM ($rows) u ORDER BY split_a, split_b"""
  }

  /** Zipf-fit twin (E76): identical top-k (freq DESC, token ASC), ranks
    * from a window over those k rows, OLS moments via ROUND(·,12) →
    * DECIMAL(38,12) sums, the same closed-form slope/intercept/r2. */
  val zipfFit: String = {
    def dsum(e: String, name: String) =
      s"CAST(SUM(CAST(ROUND($e, 12) AS DECIMAL(38,12))) AS DOUBLE) AS $name"
    s"""WITH f AS (SELECT t.x AS token, CAST(COUNT(*) AS BIGINT) AS freq
  FROM documents, UNNEST($wsToksLowerSql) t(x) GROUP BY 1
  ORDER BY freq DESC, token ASC LIMIT 1000),
r AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS BIGINT) AS rank, freq FROM f),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
    ${dsum("LN(rank)", "sx")},
    ${dsum("LN(freq)", "sy")},
    ${dsum("LN(rank) * LN(freq)", "sxy")},
    ${dsum("LN(rank) * LN(rank)", "sxx")},
    ${dsum("LN(freq) * LN(freq)", "syy")}
  FROM r)
SELECT n,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m"""
  }

  /** Corpus vocabulary top-100 by token frequency, (freq DESC, token ASC)
    * tie-break — twin of TextFunctions.vocabTopK. */
  val vocabTopK: String =
    s"""SELECT token, freq FROM (
  SELECT t.x AS token, COUNT(*) AS freq
  FROM documents, UNNEST($wsToksLowerSql) t(x) GROUP BY 1) q
ORDER BY freq DESC, token ASC LIMIT 100"""

  /** Stopword-vote language ID; argmax with (score desc, lang asc)
    * tie-break — lists shared with TextFunctions.Stopwords. */
  val langId: String = {
    val scores = Stopwords.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${stopList(ws)}, t))) AS s_$l"
    }.mkString(", ")
    val cases = Stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    val greatest = Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang FROM (
  SELECT doc_id, ${Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")}, GREATEST($greatest) AS m FROM (
    SELECT doc_id, $scores FROM (SELECT doc_id, $wsToksLowerSql AS toks FROM documents) a) b) c
ORDER BY doc_id"""
  }

  /** Mixture-composition twin: the split bucket algebra + the langId
    * argmax + token counts, grouped per (split, lang) — every ingredient
    * identical to its standalone oracle. */
  val mixtureStats: String = {
    val scores = Stopwords.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${stopList(ws)}, t))) AS s_$l"
    }.mkString(", ")
    val cases = Stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    val greatest = Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""WITH base AS (SELECT doc_id, $wsToksLowerSql AS toks, $sampleBucket AS b FROM documents),
sc AS (SELECT doc_id, toks, b, $scores FROM base),
pd AS (SELECT CAST(len(toks) AS BIGINT) AS ntok,
    CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END AS split,
    CASE $cases ELSE 'und' END AS lang
  FROM (SELECT *, GREATEST($greatest) AS m FROM sc) g)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
FROM pd GROUP BY split, lang ORDER BY split, lang"""
  }

  /** Polynomial rolling hash h = fold((h*31 + codepoint) mod 2^31-1) — the
    * oracle twin of the custom codegen RollingHash expression. */
  val docFingerprint: String =
    "SELECT doc_id, CAST(CASE WHEN LENGTH(text) = 0 THEN 0 ELSE " +
      "list_reduce(list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)), " +
      "(a, b) -> (a * 31 + b) % 2147483647) END AS BIGINT) AS fingerprint " +
      "FROM documents ORDER BY doc_id"

  /** Batch twin of the streaming tumbling-window profile (1h windows over
    * events; exact count + DECIMAL-quantized sum). */
  val streamingProfile: String =
    "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type, " +
      "COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2"

  /** Gap-and-islands twin of the stateful sessionization (30-minute gap,
    * epoch-microsecond timestamps). */
  val streamingSessions: String =
    """WITH d AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT user_id, ts_us, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d)
SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"""

  /** Batch sessionize twin (E108): same lag/flag/running-sum split as the
    * Spark plan, with the identical total order (ts, event_id) so
    * timestamp collisions cannot flap a boundary. SUM(...) casts back to
    * BIGINT (DuckDB widens integer SUM to HUGEINT). */
  val sessionize: String =
    """WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events),
flagged AS (
  SELECT user_id, ts_us, event_id, event_type,
    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM ordered),
numbered AS (
  SELECT user_id, ts_us, event_type,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged)
SELECT user_id, session_idx, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
  MAX(ts_us) - MIN(ts_us) AS duration_us,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM numbered GROUP BY 1, 2 ORDER BY user_id, session_idx"""

  /** As-of twin: identical strictly-prior IGNORE-NULLS window (DuckDB's
    * native ASOF JOIN would also work; the window form mirrors the Spark
    * plan exactly). Same ns→µs floor as the other event oracles. */
  val asofEnrich: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
w AS (SELECT *,
    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER win AS last_view_value,
    last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS) OVER win AS last_view_ts_us
  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, ts_us, value, last_view_value, last_view_ts_us,
  ts_us - last_view_ts_us AS gap_us
FROM w WHERE event_type = 'purchase' ORDER BY event_id"""

  /** Byte-level media features (payload = UTF-8 bytes of text). */
  val multimodalFeatures: String =
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
      "substr(sha256(text), 1, 16) AS fingerprint FROM documents ORDER BY doc_id"

  /** Whole-table twin of the merged incremental profile: the split-snapshot-
    * merge pipeline must reproduce these exact values (decimal sums are
    * order- and partition-independent). */
  val incrementalProfile: String = wrap(union(
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
  val segmentedIncrementalProfile: String = {
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

  /** Decode twin: the synthetic media corpus is a pure function of
    * doc_id/text (Multimodal.syntheticMedia), so the oracle recomputes what
    * the real BMP/WAV header parsers must read back — dimensions from the
    * constructed headers (width=id%200+1 etc.), empty bodies → checksum 0 —
    * and the raw path's byte features (ASCII text ⇒ ord == byte). */
  val multimodalDecode: String =
    """SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'bmp' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'raw' END AS kind,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 54 WHEN doc_id % 3 = 1 THEN 44 ELSE strlen(text) END AS BIGINT) AS n_bytes,
  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 200 + 1 WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000
       WHEN strlen(text) = 0 THEN 0 ELSE ord(substr(text, 1, 1)) + 1 END AS INT) AS width,
  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 100 + 1 WHEN doc_id % 3 = 1 THEN doc_id % 2 + 1
       WHEN strlen(text) = 0 THEN 0 ELSE ord(substr(text, strlen(text), 1)) + 1 END AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 <= 1 THEN 0 WHEN strlen(text) = 0 THEN 0 ELSE
       list_reduce(list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 2147483647)
       END AS BIGINT) AS checksum
FROM documents ORDER BY doc_id"""

  /** Frame-sampling twin: fixed 256-byte windows, up to 4 per document
    * (ASCII text ⇒ byte windows == character windows in DuckDB). */
  val multimodalFrames: String =
    """SELECT doc_id, CAST(i AS INT) AS frame_idx,
  CAST(strlen(substr(text, CAST(i AS INT) * 256 + 1, 256)) AS BIGINT) AS frame_bytes,
  substr(sha256(substr(text, CAST(i AS INT) * 256 + 1, 256)), 1, 16) AS frame_hash
FROM documents, UNNEST(range(0, LEAST(4, CAST(ceil(strlen(text) / 256.0) AS BIGINT)))) t(i)
ORDER BY doc_id, frame_idx"""

  /** R7: the schema relation is metadata-derived (parquet footer), so its
    * oracle is a golden VALUES literal of lineitem's declared (column,
    * catalogString) pairs — pinning exactly what `Profiler.schemaDF` must
    * read out of the footer. */
  val schemaDf: String =
    s"SELECT * FROM (VALUES $schemaValues) s(instance, type) ORDER BY instance"

  /** Schema-drift twin: golden VALUES for both schema generations (the
    * evolved side derives from the same static inventory: l_tax dropped,
    * l_linenumber widened, l_flag added), full-outer-joined with the same
    * CASE statuses. */
  val schemaDrift: String = {
    val after = types.filterNot(_._1 == "l_tax").map {
      case ("l_linenumber", _) => ("l_linenumber", "bigint")
      case other => other
    } :+ ("l_flag", "boolean")
    val afterValues = after.map { case (c, t) => s"('$c', '$t')" }.mkString(", ")
    s"""WITH a(instance, type_a) AS (VALUES $schemaValues),
b(instance, type_b) AS (VALUES $afterValues)
SELECT COALESCE(a.instance, b.instance) AS instance, type_a, type_b,
  CASE WHEN type_a IS NULL THEN 'added'
       WHEN type_b IS NULL THEN 'removed'
       WHEN type_a <> type_b THEN 'retyped'
       ELSE 'same' END AS status
FROM a FULL OUTER JOIN b ON a.instance = b.instance ORDER BY instance"""
  }

  /** R4: the Column-entity side of the entity split over a size +
    * completeness profile — exactly the per-column Completeness rows (the
    * Size row carries entity 'Dataset' and is filtered out). */
  val metricsSplit: String = wrap(perCol(profiled, "Completeness")(completenessExpr))

  /** R13 metadata-upsert round trip: the surviving seeded params are VALUES
    * literals (table params merge, so the stale table-level DQP__ key
    * survives — the reference's Glue.java:67-80 behavior; column-level
    * DQP__ keys are reset), unioned with the freshly computed
    * DQP__Size/DQP__Completeness parameter values from lineitem. */
  val metadataUpsert: String = {
    val seeded = Seq(
      "('table', 'DQP__Stale', 999.0)", "('table', 'owner', 1.5)",
      "('l_orderkey', 'note', 2.5)", "('ghost_col', 'keep', 3.5)").mkString(", ")
    val computed =
      s"SELECT 'table' AS scope, 'DQP__Size' AS key, CAST(COUNT(*) AS DOUBLE) AS value FROM $T" +:
        profiled.map(c =>
          s"SELECT '$c' AS scope, 'DQP__Completeness' AS key, CAST(${completenessExpr(c)} AS DOUBLE) AS value FROM $T")
    s"WITH seeded(scope, key, value) AS (VALUES $seeded) " +
      "SELECT scope, key, ROUND(CAST(value AS DOUBLE), 6) AS value FROM " +
      s"(SELECT * FROM seeded UNION ALL ${union(computed)}) q ORDER BY scope, key"
  }

  /** R11: global multi-key sort + limit over the flagship metrics. */
  val sortedMetricsHead: String = {
    val m = union(Seq(
      sizeSelect,
      perCol(profiled, "Completeness")(completenessExpr),
      perCol(numeric, "Minimum")(minimumExpr),
      perCol(numeric, "Maximum")(maximumExpr),
      perCol(text, "MaxLength")(maxLengthExpr),
      perCol(text, "MinLength")(minLengthExpr)))
    s"SELECT * FROM ($m) q ORDER BY instance, name LIMIT 100"
  }

  /** Text-normalization twin: identical decomposed combining-sequence
    * prefix (chr(769)=U+0301, chr(776)=U+0308, chr(9)=tab), then the same
    * NFC → lower → collapse-whitespace → trim pipeline (`nfc_normalize`
    * implements the same Unicode canonical composition as the engine's
    * codegen NfcNormalize expression). */
  val textNormalize: String =
    raw"""WITH r AS (SELECT doc_id,
    'Cafe' || chr(769) || '  NAI' || chr(776) || 'VE' || chr(9) || text AS raw
  FROM documents),
n AS (SELECT doc_id, raw,
    trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g')) AS norm
  FROM r)
SELECT doc_id,
  CAST(LENGTH(raw) AS BIGINT) AS n_chars_raw,
  CAST(LENGTH(norm) AS BIGINT) AS n_chars_norm,
  substr(sha256(norm), 1, 16) AS norm_fingerprint
FROM n ORDER BY doc_id"""

  /** IVF twin: the knn_assign cell structure (rank-1 centroid per vector),
    * rank-≤2 probe list per query, exact cosine only inside probed cells,
    * top-10 on (6-dp cosine DESC, id ASC) — deterministic approximation,
    * reproduced exactly. */
  val ivfTopK: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
a AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
p AS (SELECT query_id, centroid_id FROM (
  SELECT q.query_id, c.centroid_id,
    ROUND(${listDot("q.embedding", "c.embedding")} / (${listNorm("q.embedding")} * ${listNorm("c.embedding")}), 6) AS qcos
  FROM q CROSS JOIN c
  WHERE ${listNorm("q.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, centroid_id) <= 2),
s AS (SELECT p.query_id, a.neighbor_id,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM p JOIN a USING (centroid_id)
  JOIN embeddings e ON e.vec_id = a.neighbor_id
  JOIN q ON q.query_id = p.query_id
  WHERE ${listNorm("q.embedding")} * ${listNorm("e.embedding")} > 0)
SELECT query_id, neighbor_id, cos FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
ORDER BY query_id, neighbor_id"""

  /** NDCG@10 eval twin (E189): the IVF run and the brute-force top-10
    * pool nested verbatim as CTEs; the discount CASE chain interpolates
    * the SAME JVM-computed `1/log2(i+1)` doubles the Spark side embeds
    * as literals (Double.toString round-trips exactly — no runtime
    * transcendental on either engine), terms ROUND(gain·disc, 12)
    * decimal-summed, the final division 6-dp. */
  lazy val ndcgEval: String = {
    val discs = (1 to 10).map(i => i -> 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val discCase =
      s"CASE rnk ${discs.map { case (i, d) => s"WHEN $i THEN $d" }.mkString(" ")} ELSE 0.0 END"
    s"""WITH sys AS ($ivfTopK),
qr0 AS ($annCosineTopK),
qr AS (SELECT query_id AS q, neighbor_id AS i,
    GREATEST(CAST(cos AS DOUBLE), 0.0) AS rel FROM qr0),
sysr AS (SELECT query_id AS q, neighbor_id AS i,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
  FROM sys),
d AS (SELECT sysr.q, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
    SUM(CAST(ROUND(COALESCE(qr.rel, 0.0) * $discCase, 12) AS DECIMAL(38,12))) AS dcg
  FROM sysr LEFT JOIN qr ON qr.q = sysr.q AND qr.i = sysr.i
  WHERE rnk <= 10 GROUP BY sysr.q),
ir AS (SELECT q, i, rel,
    ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, i) AS rnk FROM qr),
idl AS (SELECT q, SUM(CAST(ROUND(rel * $discCase, 12) AS DECIMAL(38,12))) AS idcg
  FROM ir WHERE rnk <= 10 GROUP BY q)
SELECT d.q AS query_id, n_retrieved,
  ROUND(CAST(dcg AS DOUBLE), 6) AS dcg,
  ROUND(CAST(idcg AS DOUBLE), 6) AS idcg,
  CASE WHEN idcg > 0 THEN
    ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) END AS ndcg
FROM d JOIN idl ON idl.q = d.q ORDER BY query_id"""
  }

  /** ANN recall-curve twin (E194): IVF + brute-force runs nested
    * verbatim, row_number rankings over the 6-dp scores, per-(query, k)
    * integer intersection counts on a query×k grid, 12-dp decimal means
    * per k. */
  lazy val recallCurve: String =
    s"""WITH sys0 AS ($ivfTopK),
ex0 AS ($annCosineTopK),
sy AS (SELECT query_id AS q, neighbor_id AS i,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rs FROM sys0),
ex AS (SELECT query_id AS q, neighbor_id AS i,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS re FROM ex0),
m AS (SELECT sy.q, sy.rs, ex.re FROM sy JOIN ex ON ex.q = sy.q AND ex.i = sy.i),
ks AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS ne, unnest(range(1, 11)) AS k
  FROM ex GROUP BY q),
cnt AS (SELECT ks.q, ks.k, ks.ne, COUNT(m.rs) AS c FROM ks
  LEFT JOIN m ON m.q = ks.q AND m.rs <= ks.k AND m.re <= ks.k GROUP BY 1, 2, 3),
r AS (SELECT q, k,
    CAST(ROUND(CAST(c AS DOUBLE) / CAST(LEAST(k, ne) AS DOUBLE), 12) AS DECIMAL(38,12)) AS r
  FROM cnt)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_queries,
  ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_recall,
  ROUND(CAST(MIN(r) AS DOUBLE), 6) AS min_recall
FROM r GROUP BY k ORDER BY k"""

  /** kNN-probe twin (E199): leave-one-out brute-force top-10 on the 6-dp
    * cosine, majority vote with (count DESC, label ASC) tie-break. */
  lazy val knnLabelEval: String =
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
nn AS (SELECT query_id, neighbor_id FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.vec_id
    AND ${listNorm("q.embedding")} * ${listNorm("e.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10),
v AS (SELECT nn.query_id, CAST(l.label AS BIGINT) AS lbl, COUNT(*) AS c
  FROM nn JOIN embeddings l ON l.vec_id = nn.neighbor_id GROUP BY 1, 2),
p AS (SELECT query_id, lbl AS pred_label, CAST(c AS BIGINT) AS n_votes FROM v
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, lbl) = 1)
SELECT p.query_id, CAST(t.label AS BIGINT) AS true_label, p.pred_label,
  p.n_votes, (p.pred_label = CAST(t.label AS BIGINT)) AS correct
FROM p JOIN embeddings t ON t.vec_id = p.query_id ORDER BY p.query_id"""

  /** Cluster-purity twin (E200): the nearest-centroid assignment CTEs
    * (the E158 argmax form), per-(cluster, label) counts, majority with
    * (count DESC, label ASC) tie-break, 6-dp purity ratio. */
  lazy val clusterPurity: String =
    s"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
c AS (SELECT vec_id AS centroid_id, embedding AS ce FROM e WHERE vec_id % 83 = 0),
a AS (SELECT vec_id, centroid_id FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.ce")} / (${listNorm("e.embedding")} * ${listNorm("c.ce")}), 6) AS cos,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      ROUND(${listDot("e.embedding", "c.ce")} / (${listNorm("e.embedding")} * ${listNorm("c.ce")}), 6) DESC,
      c.centroid_id) AS rn
  FROM e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.ce")} > 0) t WHERE rn = 1),
v AS (SELECT a.centroid_id, CAST(l.label AS BIGINT) AS lbl, COUNT(*) AS c
  FROM a JOIN e l ON l.vec_id = a.vec_id GROUP BY 1, 2),
s AS (SELECT centroid_id, CAST(SUM(c) AS BIGINT) AS n_members FROM v GROUP BY 1),
m AS (SELECT centroid_id, lbl AS majority_label, CAST(c AS BIGINT) AS n_majority FROM v
  QUALIFY ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY c DESC, lbl) = 1)
SELECT s.centroid_id, s.n_members, m.majority_label, m.n_majority,
  ROUND(CAST(m.n_majority AS DOUBLE) / CAST(s.n_members AS DOUBLE), 6) AS purity
FROM s JOIN m USING (centroid_id) ORDER BY s.centroid_id"""

  /** Simplified-silhouette twin (E201): one 6-dp cosine relation, own
    * argmax (cos DESC, centroid id) and runner-up read off it, the
    * (b−a)/max(a,b) score with the a=b→0 convention, decimal-summed
    * cluster means. */
  lazy val silhouette: String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
c AS (SELECT vec_id AS centroid_id, embedding AS ce FROM e WHERE vec_id % 83 = 0),
sc AS (SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.ce")} / (${listNorm("e.embedding")} * ${listNorm("c.ce")}), 6) AS cos
  FROM e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.ce")} > 0),
own AS (SELECT vec_id, centroid_id AS own, (1.0 - cos) AS a FROM sc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
sec AS (SELECT s.vec_id, (1.0 - MAX(s.cos)) AS b
  FROM sc s JOIN own o ON o.vec_id = s.vec_id AND s.centroid_id <> o.own
  GROUP BY 1),
ps AS (SELECT o.own,
    CASE WHEN GREATEST(a, b) > 0 THEN ROUND((b - a) / GREATEST(a, b), 6)
         ELSE 0.0 END AS s
  FROM own o JOIN sec USING (vec_id))
SELECT own AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
  ROUND(CAST(SUM(CAST(ROUND(s, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette,
  ROUND(MIN(s), 6) AS min_silhouette
FROM ps GROUP BY 1 ORDER BY 1"""

  /** MMR diversified re-rank twin (E193): the brute-force pool nested
    * verbatim, pool-pairwise 6-dp cosines, then the greedy selection
    * replayed as chained (rem, max-sim, pick, union) CTE blocks — the
    * E182 chained-replay pattern; λ and (1−λ) interpolate the SAME JVM
    * doubles the Spark side uses as literals; multi-referenced CTEs
    * AS MATERIALIZED (single-ref CTEs inline → exponential re-expansion
    * with chain depth). */
  lazy val mmrDiversify: String = {
    val l = 0.7
    val oml = 1.0 - l
    val steps = (2 to 5).map { t =>
      s"""rem$t AS MATERIALIZED (SELECT p.q, p.i, p.rel FROM cand p
  WHERE NOT EXISTS (SELECT 1 FROM all${t - 1} s WHERE s.q = p.q AND s.i = p.i)),
ms$t AS (SELECT r.q, r.i, MAX(sim) AS ms FROM rem$t r
  JOIN sims ON sims.q = r.q AND sims.ia = r.i
  JOIN all${t - 1} s ON s.q = sims.q AND s.i = sims.ib GROUP BY 1, 2),
pick$t AS (SELECT q, i FROM (
    SELECT r.q, r.i, ROUND($l * r.rel - $oml * COALESCE(ms, 0.0), 6) AS m
    FROM rem$t r LEFT JOIN ms$t USING (q, i)) z
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q ORDER BY m DESC, i) = 1),
all$t AS MATERIALIZED (SELECT q, i, rank FROM all${t - 1}
  UNION ALL SELECT q, i, $t FROM pick$t)"""
    }.mkString(",\n")
    s"""WITH pool AS ($annCosineTopK),
cand AS MATERIALIZED (SELECT query_id AS q, neighbor_id AS i, CAST(cos AS DOUBLE) AS rel FROM pool),
sims AS MATERIALIZED (SELECT a.q, a.i AS ia, b.i AS ib,
    ROUND(${listDot("ea.embedding", "eb.embedding")} / (${listNorm("ea.embedding")} * ${listNorm("eb.embedding")}), 6) AS sim
  FROM cand a JOIN cand b ON a.q = b.q AND a.i <> b.i
  JOIN embeddings ea ON ea.vec_id = a.i
  JOIN embeddings eb ON eb.vec_id = b.i
  WHERE ${listNorm("ea.embedding")} * ${listNorm("eb.embedding")} > 0),
all1 AS MATERIALIZED (SELECT q, i, 1 AS rank FROM cand
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, i) = 1),
$steps
SELECT a.q AS query_id, a.i AS neighbor_id, a.rank, ROUND(c.rel, 6) AS rel
FROM all5 a JOIN cand c ON c.q = a.q AND c.i = a.i
ORDER BY query_id, rank"""
  }

  /** Int8 scalar-quantization twin: same symmetric scale (max|x|/127),
    * same explicit half-up code law sign(x)*floor(|x|/scale + 0.5), same
    * left-fold residual MSE (list_reduce ≡ Spark aggregate from 0.0). */
  val embeddingQuantize: String =
    """WITH b AS (SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE)))) AS amax,
    len(embedding) AS nd
  FROM embeddings),
s AS (SELECT vec_id, embedding, nd, amax, amax / 127.0 AS scale FROM b),
cd AS (SELECT vec_id, embedding, nd, amax, scale,
    list_transform(embedding,
      x -> CAST(SIGN(CAST(x AS DOUBLE)) * FLOOR(ABS(CAST(x AS DOUBLE)) / scale + 0.5) AS INTEGER)) AS codes
  FROM s)
SELECT vec_id,
  CAST(nd AS INT) AS n_dims,
  ROUND(CASE WHEN amax > 0 THEN scale END, 6) AS scale,
  CASE WHEN amax > 0 THEN CAST(list_sum(codes) AS BIGINT) END AS code_sum,
  CASE WHEN amax > 0 THEN list_min(codes) END AS code_min,
  CASE WHEN amax > 0 THEN list_max(codes) END AS code_max,
  ROUND(CASE WHEN amax > 0 THEN
    list_reduce(list_transform(list_zip(embedding, codes),
      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale)),
      (acc, v) -> acc + v) / nd END, 6) AS mse
FROM cd ORDER BY vec_id"""

  /** Budget-selection twin: the text_quality composite (same CASE guards,
    * 6-dp rounding pins the ranking across engines), ranked (score DESC,
    * doc_id), inclusive running token sum capped at the budget. */
  val budgetSelect: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH q AS (
  SELECT doc_id, ws_tokens AS n_tokens,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM (SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) t),
c AS (SELECT doc_id, score, n_tokens,
    CAST(SUM(n_tokens) OVER (ORDER BY score DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM q WHERE score IS NOT NULL)
SELECT doc_id, score, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 20000 ORDER BY doc_id"""
  }

  /** Corpus bigram top-50 — the vocabTopK ranking rule over the
    * repetition-metrics positional bigram generator. */
  val bigramTopK: String =
    s"""SELECT bigram, freq FROM (
  SELECT w[i] || ' ' || w[i + 1] AS bigram, COUNT(*) AS freq
  FROM (SELECT $wsToksLowerSql AS w FROM documents), UNNEST(range(1, len(w))) s(i)
  GROUP BY 1) q
ORDER BY freq DESC, bigram ASC LIMIT 50"""

  /** Filter-funnel twin: cumulative-conjunction survivor counts; every
    * stage predicate reuses the standalone oracle's expression (length,
    * token count, langId argmax, quality composite). */
  val filterFunnel: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    val scores = Stopwords.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${stopList(ws)}, t))) AS s_$l"
    }.mkString(", ")
    val cases = Stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    val greatest = Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""WITH base AS (SELECT doc_id, text, $wsToksLowerSql AS toks,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
g AS (SELECT *, GREATEST($greatest) AS m FROM (SELECT *, $scores FROM base) sc),
f AS (SELECT
    n_chars > 0 AS p1,
    ws_tokens >= 10 AS p2,
    (CASE $cases ELSE 'und' END) <> 'und' AS p3,
    (ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6)) >= 0.45 AS p4
  FROM g)
SELECT 0 AS stage, 'total' AS filter_name, COUNT(*) AS survivors FROM f
UNION ALL SELECT 1, 'has_text', COUNT(CASE WHEN p1 THEN 1 END) FROM f
UNION ALL SELECT 2, 'min_tokens_10', COUNT(CASE WHEN p1 AND p2 THEN 1 END) FROM f
UNION ALL SELECT 3, 'lang_known', COUNT(CASE WHEN p1 AND p2 AND p3 THEN 1 END) FROM f
UNION ALL SELECT 4, 'quality_045', COUNT(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 END) FROM f
ORDER BY stage"""
  }

  /** Deterministic-shuffle twin: the sampling hash bucket mod 16 as the
    * shard, position by ROW_NUMBER in (bucket, doc_id) order. */
  val corpusShuffle: String =
    s"""WITH b AS (SELECT doc_id, $sampleBucket AS bkt,
    sha256(CAST(doc_id AS VARCHAR) || 'graft') AS hx FROM documents)
SELECT doc_id, CAST(bkt % 16 AS INT) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY bkt % 16 ORDER BY hx, doc_id) AS BIGINT) AS pos
FROM b ORDER BY doc_id"""

  /** Centroid-update twin: the knn_assign rank-1 assignment, per-(cell,
    * dim) sums of DECIMAL(38,12)-quantized addends (the lm_quality
    * contract: round the double to 12 places, then cast — identical in
    * both engines), ONE double division at the end. */
  val centroidUpdate: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
a AS (SELECT vec_id, centroid_id FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
x AS (SELECT a.centroid_id,
    CAST(generate_subscripts(e.embedding, 1) - 1 AS INT) AS dim,
    unnest(e.embedding) AS v
  FROM embeddings e JOIN a ON e.vec_id = a.vec_id)
SELECT centroid_id, dim,
  ROUND(CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE), 12) AS DECIMAL(38,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean,
  CAST(COUNT(*) AS BIGINT) AS n
FROM x GROUP BY centroid_id, dim ORDER BY centroid_id, dim"""

  /** Winnowing twin: the same packed `hash·2²⁰ + (2²⁰−1−pos)` keys (inner
    * rolling hash = the doc_fingerprint fold over the k-gram's codepoints),
    * window minima via list_min, DISTINCT selected pairs. */
  val winnowFingerprint: String =
    raw"""WITH kg AS (SELECT doc_id,
  CASE WHEN LENGTH(text) >= 8 THEN
    list_transform(range(1, LENGTH(text) - 8 + 2), i ->
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(substr(text, CAST(i AS INT), 8), ''), c -> CAST(ord(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 2147483647) * 1048576 + (1048575 - i))
  ELSE CAST([] AS BIGINT[]) END AS keys
  FROM documents),
sel AS (SELECT DISTINCT doc_id, enc FROM (
  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(keys) - 3, 1) + 1),
    j -> list_min(keys[j : j + 3]))) AS enc
  FROM kg WHERE len(keys) >= 1) t)
SELECT doc_id, 1048575 - (enc % 1048576) AS pos, enc // 1048576 AS hash
FROM sel ORDER BY doc_id, pos"""

  /** Winnow-near-dup twin (E73): the same fingerprint CTE collapsed to
    * DISTINCT (doc, hash), stop-fingerprints (doc-freq > the ABSOLUTE
    * boilerplate cap 32 = Dedup.DefaultHotFingerprintCap; r10, was the
    * corpus-relative 2% whose Σ df² stays quadratic in N) removed from
    * both sides, exact Jaccard over the surviving sets via one
    * shared-hash self-join. */
  val winnowNearDup: String =
    raw"""WITH kg AS (SELECT doc_id,
  CASE WHEN LENGTH(text) >= 8 THEN
    list_transform(range(1, LENGTH(text) - 8 + 2), i ->
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(substr(text, CAST(i AS INT), 8), ''), c -> CAST(ord(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 2147483647) * 1048576 + (1048575 - i))
  ELSE CAST([] AS BIGINT[]) END AS keys
  FROM documents),
fp AS (SELECT DISTINCT doc_id, enc // 1048576 AS hash FROM (
  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(keys) - 3, 1) + 1),
    j -> list_min(keys[j : j + 3]))) AS enc
  FROM kg WHERE len(keys) >= 1) t),
ok AS (SELECT hash FROM fp GROUP BY hash HAVING COUNT(*) <= 32),
kept AS (SELECT f.doc_id, f.hash FROM fp f JOIN ok USING (hash)),
sz AS (SELECT doc_id, COUNT(*) AS nf FROM kept GROUP BY doc_id),
p AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS c
  FROM kept x JOIN kept y USING (hash) WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, j AS jaccard FROM (
  SELECT id_a, id_b,
    ROUND(CAST(c AS DOUBLE) / (sa.nf + sb.nf - c), 6) AS j
  FROM p JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b) q
WHERE j >= 0.5 ORDER BY id_a, id_b"""

  /** Longest common prefix of two strings, O(len): zip the codepoint
    * lists, position of the first mismatch (list_zip pads the shorter
    * side with NULL, which IS DISTINCT FROM any char — so prefix
    * relationships terminate correctly); `NULLIF(·,0)` because DuckDB's
    * list_position returns 0, not NULL, when nothing matches (equal
    * strings), and the COALESCE arm then yields the full common length.
    * The naive per-length generate_series probe is O(len²) per
    * candidate — measured unusable even at sf0.01. */
  private def lcp(x: String, y: String): String =
    s"COALESCE(NULLIF(list_position(list_transform(list_zip(" +
      s"string_split($x,''), string_split($y,'')), " +
      s"p -> p[1] IS DISTINCT FROM p[2]), true), 0), " +
      s"LEAST(LENGTH($x), LENGTH($y)) + 1) - 1"

  /** Exact-substring-duplicate twin (E156): the same winnowing anchor
    * sites (positions KEPT, unlike the near-dup twin's distinct sets),
    * the same ABSOLUTE occurrence cap 32, candidate pairs via the shared-
    * hash self-join, and the maximal extension recomputed as two
    * longest-common-prefix scans — right = lcp of the suffixes at the
    * anchors (a verbatim anchor means lcp ≥ 8; a 31-adic hash collision
    * means lcp < 8 and the candidate drops, exactly the Spark kernel's
    * −1), left = lcp of the REVERSED prefixes. Per pair the lexicographic
    * (len, start_a, start_b) max, ties impossible to flap because the
    * order is total over distinct spans. */
  private lazy val substringSpansCte: String = {
    val right = lcp(
      "substr(da.text, CAST(pos_a AS INT))",
      "substr(db.text, CAST(pos_b AS INT))")
    val left = lcp(
      "reverse(substr(da.text, 1, CAST(pos_a AS INT) - 1))",
      "reverse(substr(db.text, 1, CAST(pos_b AS INT) - 1))")
    raw"""WITH kg AS (SELECT doc_id,
  CASE WHEN LENGTH(text) >= 8 THEN
    list_transform(range(1, LENGTH(text) - 8 + 2), i ->
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(substr(text, CAST(i AS INT), 8), ''), c -> CAST(ord(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 2147483647) * 1048576 + (1048575 - i))
  ELSE CAST([] AS BIGINT[]) END AS keys
  FROM documents),
sel AS (SELECT DISTINCT doc_id, enc FROM (
  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(keys) - 3, 1) + 1),
    j -> list_min(keys[j : j + 3]))) AS enc
  FROM kg WHERE len(keys) >= 1) t),
fp AS (SELECT doc_id AS id, 1048575 - (enc % 1048576) AS pos, enc // 1048576 AS hash FROM sel),
ok AS (SELECT hash FROM fp GROUP BY hash HAVING COUNT(*) <= 32),
kept AS (SELECT f.id, f.pos, f.hash FROM fp f JOIN ok USING (hash)),
cand AS (SELECT a.id AS id_a, a.pos AS pos_a, b.id AS id_b, b.pos AS pos_b
  FROM kept a JOIN kept b USING (hash) WHERE a.id < b.id),
ext AS (SELECT id_a, id_b, pos_a, pos_b, $right AS r, $left AS l
  FROM cand JOIN documents da ON da.doc_id = id_a
            JOIN documents db ON db.doc_id = id_b),
spans AS (SELECT DISTINCT id_a, id_b,
    pos_a - l AS start_a, pos_b - l AS start_b, l + r AS len
  FROM ext WHERE r >= 8)"""
  }

  lazy val substringDup: String =
    raw"""$substringSpansCte,
best AS (SELECT id_a, id_b, start_a, start_b, len,
    ROW_NUMBER() OVER (PARTITION BY id_a, id_b
      ORDER BY len DESC, start_a DESC, start_b DESC) AS rn,
    COUNT(*) OVER (PARTITION BY id_a, id_b) AS n_spans
  FROM spans)
SELECT id_a, id_b, CAST(len AS BIGINT) AS overlap_len,
  CAST(start_a AS BIGINT) AS start_a, CAST(start_b AS BIGINT) AS start_b,
  CAST(n_spans AS BIGINT) AS n_spans
FROM best WHERE rn = 1 AND len >= 30 ORDER BY id_a, id_b"""

  /** Coverage twin (E156's per-document readout): both interval sides of
    * every ≥30-char span, DISTINCT, merged by the gap-and-islands pattern
    * (the sessionize contract — running MAX(end) over the same
    * (start, end) order), covered = Σ island widths, fraction over the
    * document's LENGTH. */
  lazy val substringDupCoverage: String =
    raw"""$substringSpansCte,
ivals AS (SELECT DISTINCT id, s, e FROM (
  SELECT id_a AS id, start_a AS s, start_a + len AS e FROM spans WHERE len >= 30
  UNION ALL
  SELECT id_b, start_b, start_b + len FROM spans WHERE len >= 30) u),
flagged AS (SELECT id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR s > MAX(e) OVER (PARTITION BY id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS brk
  FROM ivals),
isl AS (SELECT id, s, e, SUM(brk) OVER (PARTITION BY id ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flagged),
cov AS (SELECT id, g, MIN(s) AS s0, MAX(e) AS e1 FROM isl GROUP BY 1, 2),
agg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_islands,
    CAST(SUM(e1 - s0) AS BIGINT) AS covered_chars
  FROM cov GROUP BY 1)
SELECT a.id AS doc_id, n_islands, covered_chars,
  ROUND(covered_chars * 1.0 / LENGTH(d.text), 6) AS dup_char_fraction
FROM agg a JOIN documents d ON d.doc_id = a.id ORDER BY doc_id"""

  /** Intra-document longest-repeated-substring twin (E162): the same
    * anchor relation SELF-paired within a document (same hash, pos1 <
    * pos2, per-(doc,hash) site cap 32), both lcp extensions over the
    * same text at the two anchors. */
  /** Shared CTE chain for the intra-document repeat twins (E162/E188):
    * the anchor relation self-paired within a document, both lcp
    * extensions, the decoded maximal span relation. */
  private lazy val selfRepeatSpansCte: String = {
    val right = lcp(
      "substr(d.text, CAST(p1 AS INT))",
      "substr(d.text, CAST(p2 AS INT))")
    val left = lcp(
      "reverse(substr(d.text, 1, CAST(p1 AS INT) - 1))",
      "reverse(substr(d.text, 1, CAST(p2 AS INT) - 1))")
    raw"""kg AS (SELECT doc_id,
  CASE WHEN LENGTH(text) >= 8 THEN
    list_transform(range(1, LENGTH(text) - 8 + 2), i ->
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(substr(text, CAST(i AS INT), 8), ''), c -> CAST(ord(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 2147483647) * 1048576 + (1048575 - i))
  ELSE CAST([] AS BIGINT[]) END AS keys
  FROM documents),
sel AS (SELECT DISTINCT doc_id, enc FROM (
  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(keys) - 3, 1) + 1),
    j -> list_min(keys[j : j + 3]))) AS enc
  FROM kg WHERE len(keys) >= 1) t),
fp AS (SELECT doc_id AS id, 1048575 - (enc % 1048576) AS pos, enc // 1048576 AS hash FROM sel),
ok AS (SELECT id, hash FROM fp GROUP BY id, hash HAVING COUNT(*) <= 32),
kept AS (SELECT f.id, f.pos, f.hash FROM fp f JOIN ok USING (id, hash)),
cand AS (SELECT a.id, a.pos AS p1, b.pos AS p2
  FROM kept a JOIN kept b USING (id, hash) WHERE a.pos < b.pos),
ext AS (SELECT id, p1, p2, $right AS r, $left AS l
  FROM cand JOIN documents d ON d.doc_id = id),
spans AS (SELECT DISTINCT id, p1 - l AS s1, p2 - l AS s2, l + r AS len
  FROM ext WHERE r >= 8)"""
  }

  lazy val selfRepeat: String =
    raw"""WITH $selfRepeatSpansCte,
best AS (SELECT id, s1, s2, len,
    ROW_NUMBER() OVER (PARTITION BY id
      ORDER BY len DESC, s1 DESC, s2 DESC) AS rn,
    COUNT(*) OVER (PARTITION BY id) AS n_repeat_spans
  FROM spans)
SELECT id AS doc_id, CAST(len AS BIGINT) AS repeat_len,
  CAST(s1 AS BIGINT) AS start_1, CAST(s2 AS BIGINT) AS start_2,
  CAST(n_repeat_spans AS BIGINT) AS n_repeat_spans
FROM best WHERE rn = 1 AND len >= 20 ORDER BY doc_id"""

  /** Intra-document repetition-removal twin (E188): the E162 span CTEs
    * verbatim, cut intervals taken from the LATER occurrence of every
    * ≥20-char repeat (keep-earliest), the shared interval-cut body over
    * ALL documents. */
  lazy val selfRepeatExecute: String =
    raw"""WITH $selfRepeatSpansCte,
ivals AS (SELECT DISTINCT id, s2 AS s, s2 + len AS e
  FROM spans WHERE len >= 20),
${cutIntervalsSql("TRUE")}"""

  /** Cross-table contamination twin (E161): the same winnowing anchors
    * built per SIDE (corpus = doc_id % 101 <> 0, eval = % 101 = 0), the
    * occurrence cap counted over BOTH sides together, corpus×eval
    * candidates (no self pairs by construction), the same lcp-based
    * maximal extension. */
  lazy val substringContamination: String =
    raw"""$contaminationSpansCte,
best AS (SELECT corpus_id, eval_id, start_corpus, start_eval, len,
    ROW_NUMBER() OVER (PARTITION BY corpus_id, eval_id
      ORDER BY len DESC, start_corpus DESC, start_eval DESC) AS rn,
    COUNT(*) OVER (PARTITION BY corpus_id, eval_id) AS n_spans
  FROM spans)
SELECT corpus_id, eval_id, CAST(len AS BIGINT) AS overlap_len,
  CAST(start_corpus AS BIGINT) AS start_corpus,
  CAST(start_eval AS BIGINT) AS start_eval,
  CAST(n_spans AS BIGINT) AS n_spans
FROM best WHERE rn = 1 AND len >= 30 ORDER BY corpus_id, eval_id"""

  private lazy val contaminationSpansCte: String = {
    def side(tag: String, where: String) =
      raw"""kg$tag AS (SELECT doc_id,
  CASE WHEN LENGTH(text) >= 8 THEN
    list_transform(range(1, LENGTH(text) - 8 + 2), i ->
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(substr(text, CAST(i AS INT), 8), ''), c -> CAST(ord(c) AS BIGINT))),
        (a, b) -> (a * 31 + b) % 2147483647) * 1048576 + (1048575 - i))
  ELSE CAST([] AS BIGINT[]) END AS keys
  FROM documents WHERE $where),
sel$tag AS (SELECT DISTINCT doc_id, enc FROM (
  SELECT doc_id, unnest(list_transform(range(1, GREATEST(len(keys) - 3, 1) + 1),
    j -> list_min(keys[j : j + 3]))) AS enc
  FROM kg$tag WHERE len(keys) >= 1) t),
fp$tag AS (SELECT doc_id AS id, 1048575 - (enc % 1048576) AS pos, enc // 1048576 AS hash FROM sel$tag)"""
    val right = lcp(
      "substr(dc.text, CAST(pos_c AS INT))",
      "substr(db.text, CAST(pos_b AS INT))")
    val left = lcp(
      "reverse(substr(dc.text, 1, CAST(pos_c AS INT) - 1))",
      "reverse(substr(db.text, 1, CAST(pos_b AS INT) - 1))")
    raw"""WITH ${side("c", "doc_id % 101 <> 0")},
${side("b", "doc_id % 101 = 0")},
ok AS (SELECT hash FROM (
    SELECT hash FROM fpc UNION ALL SELECT hash FROM fpb) u
  GROUP BY hash HAVING COUNT(*) <= 32),
kc AS (SELECT f.id, f.pos, f.hash FROM fpc f JOIN ok USING (hash)),
kb AS (SELECT f.id, f.pos, f.hash FROM fpb f JOIN ok USING (hash)),
cand AS (SELECT c.id AS corpus_id, c.pos AS pos_c, b.id AS eval_id, b.pos AS pos_b
  FROM kc c JOIN kb b USING (hash)),
ext AS (SELECT corpus_id, eval_id, pos_c, pos_b, $right AS r, $left AS l
  FROM cand JOIN documents dc ON dc.doc_id = corpus_id
            JOIN documents db ON db.doc_id = eval_id),
spans AS (SELECT DISTINCT corpus_id, eval_id,
    pos_c - l AS start_corpus, pos_b - l AS start_eval, l + r AS len
  FROM ext WHERE r >= 8)"""
  }

  /** Shared interval-cut twin body: merge `ivals(id, s, e)` by
    * gap-and-islands, rebuild each flagged document's text from the
    * complement segments (`string_agg` ordered by segment start, the
    * tail segment carried as `ee IS NULL`), and emit the executor
    * readout for every document of `docFilter` — sha256 of the rebuilt
    * string is the full-hash handle matching Spark's `sha2(·, 256)`. */
  private def cutIntervalsSql(docFilter: String): String =
    raw"""flagged AS (SELECT id, s, e,
    CASE WHEN MAX(e) OVER (PARTITION BY id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR s > MAX(e) OVER (PARTITION BY id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    THEN 1 ELSE 0 END AS brk
  FROM ivals),
isl AS (SELECT id, s, e, SUM(brk) OVER (PARTITION BY id ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g FROM flagged),
cov AS (SELECT id, g, MIN(s) AS s0, MAX(e) AS e1 FROM isl GROUP BY 1, 2),
segs AS (
  SELECT id, COALESCE(LAG(e1) OVER (PARTITION BY id ORDER BY s0), 1) AS ss,
    s0 AS ee FROM cov
  UNION ALL
  SELECT id, MAX(e1) AS ss, NULL AS ee FROM cov GROUP BY id),
ctext AS (SELECT s.id,
    string_agg(CASE WHEN ee IS NULL THEN substr(d.text, CAST(ss AS INT))
      ELSE substr(d.text, CAST(ss AS INT), CAST(ee - ss AS INT)) END,
      '' ORDER BY ss) AS clean,
    COUNT(*) - 1 AS n_isl
  FROM segs s JOIN documents d ON d.doc_id = s.id GROUP BY s.id)
SELECT d.doc_id, CAST(LENGTH(d.text) AS BIGINT) AS orig_len,
  CAST(LENGTH(COALESCE(c.clean, d.text)) AS BIGINT) AS clean_len,
  CAST(COALESCE(c.n_isl, 0) AS BIGINT) AS n_cut_spans,
  substr(sha256(COALESCE(c.clean, d.text)), 1, 16) AS clean_sha
FROM documents d LEFT JOIN ctext c ON c.id = d.doc_id
WHERE $docFilter ORDER BY d.doc_id"""

  /** Decontamination-executor twin (E169): the contamination span CTE
    * verbatim, corpus-side intervals of every ≥30-char leak, and the
    * shared interval-cut body over the corpus slice. */
  lazy val decontamExecute: String =
    raw"""$contaminationSpansCte,
ivals AS (SELECT DISTINCT corpus_id AS id, start_corpus AS s,
    start_corpus + len AS e FROM spans WHERE len >= 30),
${cutIntervalsSql("d.doc_id % 101 <> 0")}"""

  /** Self-dedup-executor twin (E170): the substring-dup span CTE
    * verbatim, cut intervals taken from the LARGER doc id of every
    * ≥30-char cross-document span (keep-first), the shared cut body
    * over ALL documents. */
  lazy val substringDupExecute: String =
    raw"""$substringSpansCte,
ivals AS (SELECT DISTINCT id_b AS id, start_b AS s, start_b + len AS e
  FROM spans WHERE len >= 30),
${cutIntervalsSql("TRUE")}"""

  /** DSIR Gumbel top-k selection twin (E157's action half): the weight
    * subquery verbatim, the engine's sha256 sampling bucket as the
    * uniform (mid-bucket, never 0/1), `−LN(−LN u)` quantized ROUND(·,12)
    * before the sum and ROUND(·,6) at the key — both engines rank
    * identical doubles; top-100, best first, doc_id tie-break. */
  lazy val dsirSelect: String =
    s"""SELECT doc_id, log_weight,
  ROUND(log_weight + ROUND(-LN(-LN(($sampleBucket + 0.5) / 10000)), 12), 6) AS select_key
FROM ($dsirWeights) t
ORDER BY select_key DESC, doc_id LIMIT 100"""

  /** SemDeDup twin (E158): the same nearest-centroid assignment as the
    * centroid-update twin (6-dp cosine, QUALIFY argmax with centroid-id
    * tie-break), within-cluster pairwise 6-dp cosine, and the same
    * pairwise-loser rule — the HIGHER rounded centroid-cosine member of
    * every duplicate pair is removed (ties remove the larger id). */
  /** Shared CTE chain for the SemDeDup twins (E158/E186): assignment
    * (argmax 6-dp centroid cosine), within-cluster pairs, removal set. */
  private lazy val semDedupCtes: String =
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
c AS (SELECT vec_id AS centroid_id, embedding AS ce FROM e WHERE vec_id % 83 = 0),
a AS (SELECT vec_id, centroid_id, cos FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.ce")} / (${listNorm("e.embedding")} * ${listNorm("c.ce")}), 6) AS cos,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      ROUND(${listDot("e.embedding", "c.ce")} / (${listNorm("e.embedding")} * ${listNorm("c.ce")}), 6) DESC,
      c.centroid_id) AS rn
  FROM e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.ce")} > 0) t WHERE rn = 1),
m AS (SELECT a.vec_id, a.centroid_id, a.cos, e.embedding FROM a JOIN e USING (vec_id)),
p AS (SELECT x.vec_id AS id_a, x.cos AS ca, y.vec_id AS id_b, y.cos AS cb,
    ROUND(${listDot("x.embedding", "y.embedding")} / (${listNorm("x.embedding")} * ${listNorm("y.embedding")}), 6) AS pcos
  FROM m x JOIN m y ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
  WHERE ${listNorm("x.embedding")} * ${listNorm("y.embedding")} > 0),
r AS (SELECT DISTINCT CASE WHEN ca > cb THEN id_a WHEN ca < cb THEN id_b
    ELSE GREATEST(id_a, id_b) END AS vec_id
  FROM p WHERE pcos >= 0.35)"""

  lazy val semDedup: String =
    s"""WITH $semDedupCtes
SELECT a.vec_id, a.centroid_id, a.cos AS centroid_cos,
  (r.vec_id IS NOT NULL) AS removed
FROM a LEFT JOIN r USING (vec_id) ORDER BY a.vec_id"""

  /** SemDeDup-executor twin (E186): the verdict CTEs verbatim; the kept
    * corpus is embeddings minus the removal set — unassigned vectors
    * (null/zero-norm: no direction, no duplicate pair) survive by
    * construction; per kept vector the dimension count and 6-dp norm
    * are the content witness. */
  lazy val semDedupExecute: String =
    s"""WITH $semDedupCtes
SELECT e.vec_id, CAST(len(e.embedding) AS BIGINT) AS n_dims,
  ROUND(${listNorm("e.embedding")}, 6) AS norm
FROM e
WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.vec_id = e.vec_id)
ORDER BY e.vec_id"""

  /** Referential-integrity twin: per-key child counts, NOT EXISTS
    * orphans, the same containment division + ROUND(·,6). */
  val referentialIntegrity: String = {
    def rel(child: String, ck: String, parent: String, pk: String) = {
      val name = s"$child.$ck->$parent.$pk"
      s"""SELECT '$name' AS relation, n_rows, n_null, n_keys, n_orphan_keys, n_orphan_rows,
  CASE WHEN n_rows > n_null THEN ROUND((n_rows - n_null - n_orphan_rows) * 1.0 / (n_rows - n_null), 6) END AS containment
FROM (
  SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_rows,
    CAST(COALESCE(SUM(CASE WHEN k IS NULL THEN cnt END), 0) AS BIGINT) AS n_null,
    CAST(COUNT(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT) AS n_keys
  FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $child GROUP BY 1) kc) tot,
(
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_keys,
    CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_orphan_rows
  FROM (SELECT $ck AS k, COUNT(*) AS cnt FROM $child GROUP BY 1) kc
  WHERE k IS NOT NULL AND NOT EXISTS (
    SELECT 1 FROM $parent p WHERE p.$pk = kc.k)) orph"""
    }
    s"""SELECT * FROM (
${rel("lineitem", "l_orderkey", "orders", "o_orderkey")}
UNION ALL
${rel("orders", "o_custkey", "customer", "c_custkey")}) u ORDER BY relation"""
  }

  /** Candidate-key twin: per-combo DISTINCT counts over fully-non-null
    * tuples (the multi-arg count_distinct semantics), same distinctness
    * division + ROUND(·,6), same is_key rule. */
  val candidateKeys: String = {
    def combo(cols: Seq[String]) = {
      val nn = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
      val anyN = cols.map(c => s"$c IS NULL").mkString(" OR ")
      val list = cols.mkString(", ")
      s"""SELECT '${cols.mkString(",")}' AS key_cols,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT $list FROM orders WHERE $nn) x) AS n_distinct,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders WHERE $anyN) AS n_with_null"""
    }
    val combos = Seq(Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderstatus"),
      Seq("o_custkey", "o_orderdate"))
    s"""SELECT key_cols, n_rows, n_distinct, n_with_null,
  CASE WHEN n_rows > 0 THEN ROUND(n_distinct * 1.0 / n_rows, 6) END AS distinctness,
  (n_with_null = 0 AND n_distinct = n_rows AND n_rows > 0) AS is_key
FROM (${combos.map(combo).mkString("\nUNION ALL\n")}) u ORDER BY key_cols"""
  }

  /** Per-group exact-quantile twin (E82): one GROUP BY with
    * QUANTILE_CONT per percentile — the interpolation contract already
    * hash-proven whole-table by `quantiles_exact`. */
  def groupedQuantiles(
      groupCol: String, valueCol: String, ps: Seq[Double],
      from: String): String = {
    val qs = ps.map(p =>
      s"ROUND(QUANTILE_CONT($valueCol, $p), 6) AS p${(p * 100).round}")
      .mkString(", ")
    s"SELECT $groupCol, CAST(COUNT($valueCol) AS BIGINT) AS n, $qs " +
      s"FROM $from GROUP BY $groupCol ORDER BY $groupCol"
  }

  /** Pattern-match compliance twin (E85): same unanchored regexp_matches
    * search, per-spec COUNT CASE slots in one CTE, UNION ALL unpivot. */
  def patternMatch(
      specs: Seq[(String, String, String)], from: String): String = {
    val slots = specs.zipWithIndex.flatMap { case ((_, c, re), i) =>
      Seq(
        s"CAST(COUNT($c) AS BIGINT) AS nv_$i",
        s"CAST(COUNT(CASE WHEN regexp_matches($c, '${re.replace("'", "''")}') THEN 1 END) AS BIGINT) AS nm_$i")
    }
    val rows = specs.zipWithIndex.map { case ((name, c, re), i) =>
      s"SELECT '$name' AS check_name, '$c' AS instance, " +
        s"'${re.replace("'", "''")}' AS pattern, nv_$i AS n_values, " +
        s"nm_$i AS n_matched, CASE WHEN nv_$i = 0 THEN NULL ELSE " +
        s"ROUND(CAST(nm_$i AS DOUBLE) / CAST(nv_$i AS DOUBLE), 6) END " +
        s"AS match_ratio FROM g"
    }
    s"WITH g AS (SELECT ${slots.mkString(", ")} FROM $from)\n" +
      s"SELECT * FROM (\n${rows.mkString("\nUNION ALL\n")}) u " +
      "ORDER BY check_name, instance"
  }

  /** Partitioned-profile twin (E92): the staged layout re-derives the
    * partition column as doc_id % 4, so the oracle groups the SOURCE by
    * the same expression. */
  val partitionedProfile: String =
    raw"""SELECT doc_id % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(text) AS BIGINT) AS n_with_text,
  CAST(SUM(COALESCE(len($wsToksSql), 0)) AS BIGINT) AS n_tokens
FROM documents GROUP BY 1 ORDER BY bucket"""

  /** Fuzzy-match twin (E101): same dirty-variant derivation, prefix-block
    * equi-join, DuckDB's classic levenshtein (identical to Spark's). */
  val fuzzyMatch: String =
    raw"""WITH dirty AS (
  SELECT c_custkey AS left_id, substring(c_name, 1, length(c_name) - 1) AS lk
  FROM customer WHERE c_custkey % 20 = 0),
clean AS (SELECT c_custkey AS right_id, c_name AS rk FROM customer)
SELECT d.left_id, c.right_id, CAST(levenshtein(d.lk, c.rk) AS INT) AS dist
FROM dirty d JOIN clean c
  ON lower(substring(d.lk, 1, 12)) = lower(substring(c.rk, 1, 12))
WHERE levenshtein(d.lk, c.rk) <= 1
ORDER BY left_id, right_id"""

  /** Quantile-bucket twin (E88): the n−1 boundaries as one CTE row,
    * ROUND(·,6) quantized on BOTH engines before the comparison chain. */
  def quantileBuckets(valueCol: String, nBuckets: Int, from: String): String = {
    val qs = (1 until nBuckets).map(i =>
      s"ROUND(QUANTILE_CONT($valueCol, ${i.toDouble / nBuckets}), 6) AS q$i")
      .mkString(", ")
    val chain = (1 until nBuckets)
      .map(i => s"(CASE WHEN $valueCol > q$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH q AS (SELECT $qs FROM $from)
SELECT doc_id, $valueCol,
  CASE WHEN $valueCol IS NULL THEN NULL ELSE CAST($chain AS INT) END AS bucket
FROM $from, q ORDER BY doc_id"""
  }

  /** Effective-tokens twin (E89): GROUP BY the text itself (nulls group
    * together = the sentinel-hash cluster), COALESCE null token counts
    * to 0, single-row reduction with the same guarded ratio. */
  val effectiveTokens: String =
    raw"""WITH t AS (SELECT text, COALESCE(len($wsToksSql), 0) AS nt FROM documents),
cl AS (SELECT CAST(COUNT(*) AS BIGINT) AS c, MIN(nt) AS nt FROM t GROUP BY text),
g AS (SELECT CAST(SUM(c) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
             CAST(SUM(nt * c) AS BIGINT) AS raw_tokens, CAST(SUM(nt) AS BIGINT) AS effective_tokens FROM cl)
SELECT n_docs, n_unique_docs, raw_tokens, effective_tokens,
  CASE WHEN raw_tokens = 0 THEN NULL
       ELSE ROUND(1.0 - CAST(effective_tokens AS DOUBLE) / CAST(raw_tokens AS DOUBLE), 6) END AS dup_token_ratio
FROM g"""

  /** Corpus-cube twin (E90): GROUP BY CUBE with GROUPING() flags; the
    * ORDER BY (flags first) never compares a subtotal null against a
    * real value, so both engines' null-ordering conventions agree. */
  val corpusCube: String =
    raw"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(nt) AS BIGINT) AS n_tokens,
  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
  CAST(GROUPING(source) AS BIGINT) AS g_source
FROM (SELECT lang, source, COALESCE(len($wsToksSql), 0) AS nt FROM documents) t
GROUP BY CUBE (lang, source)
ORDER BY g_lang, g_source, lang, source"""

  /** Snapshot-diff twin (E87): same deterministic before/after variants,
    * FULL OUTER JOIN on the key, IS DISTINCT FROM value comparison (the
    * Spark side compares SHA-256 digests of the same cast-to-string
    * values — equal by injectivity of the double/string rendering). */
  val snapshotDiff: String =
    """WITH b AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s
  FROM orders WHERE o_orderkey % 10 <> 3),
a AS (SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice + 1 ELSE o_totalprice END AS p,
             o_orderstatus AS s
  FROM orders WHERE o_orderkey % 10 <> 7)
SELECT COALESCE(b.k, a.k) AS o_orderkey,
  CASE WHEN b.k IS NULL THEN 'added'
       WHEN a.k IS NULL THEN 'removed'
       WHEN b.p IS DISTINCT FROM a.p OR b.s IS DISTINCT FROM a.s THEN 'changed'
       ELSE 'unchanged' END AS status
FROM b FULL OUTER JOIN a ON b.k = a.k
ORDER BY o_orderkey"""

  /** Mutual-information twin (E80): per pair, joint-count CTE over
    * complete rows, marginals as windows over the joint relation, the
    * (c/n)·ln((n·c)/(cx·cy)) term in all-double algebra, ROUND(·,12) →
    * DECIMAL(38,12) sums, final ROUND(·,6) — Spark's exact order. */
  def mutualInfo(pairs: Seq[(String, String)], from: String = T): String = {
    val selects = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(SUM(c) AS BIGINT) AS n_joint,
  ROUND(CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * LN((CAST(n AS DOUBLE) * CAST(c AS DOUBLE)) / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS mi
FROM (
  SELECT c, SUM(c) OVER (PARTITION BY x) AS cx, SUM(c) OVER (PARTITION BY y) AS cy, SUM(c) OVER () AS n
  FROM (SELECT CAST($a AS VARCHAR) AS x, CAST($b AS VARCHAR) AS y, COUNT(*) AS c
        FROM $from WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2) j) m"""
    }
    selects.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** Inferred-type histogram twin (E81): the same derived string columns,
    * anchored-RE2 classification CASE slots in one grouped CTE, per-column
    * UNION ALL unpivot with the identical promotion rule. */
  val inferredTypes: String = {
    val cols = Seq("id_str", "bal_str", "pos_str", "seg_null", "mixed")
    val b = "^(true|false)$"
    val i = "^[-+]?[0-9]+$"
    val f = "^[-+]?([0-9]*\\.[0-9]+|[0-9]+\\.[0-9]*)([eE][-+]?[0-9]+)?$"
    def cnt(c: String, cond: String, as: String) =
      s"CAST(COUNT(CASE WHEN $cond THEN 1 END) AS BIGINT) AS $as"
    val slots = cols.flatMap { c =>
      Seq(
        cnt(c, s"regexp_matches($c, '$b')", s"b_$c"),
        cnt(c, s"regexp_matches($c, '$i')", s"i_$c"),
        cnt(c, s"regexp_matches($c, '$f')", s"f_$c"),
        cnt(c, s"$c IS NOT NULL AND NOT regexp_matches($c, '$b') AND NOT " +
          s"regexp_matches($c, '$i') AND NOT regexp_matches($c, '$f')",
          s"s_$c"),
        cnt(c, s"$c IS NULL", s"u_$c"))
    }
    val rows = cols.map { c =>
      val nn = s"(b_$c + i_$c + f_$c + s_$c)"
      s"""SELECT '$c' AS instance,
  CASE WHEN $nn = 0 THEN 'Unknown'
       WHEN b_$c = $nn THEN 'Boolean'
       WHEN i_$c = $nn THEN 'Integral'
       WHEN i_$c + f_$c = $nn THEN 'Fractional'
       ELSE 'String' END AS inferred_type,
  n_rows, b_$c AS n_boolean, i_$c AS n_integral, f_$c AS n_fractional,
  s_$c AS n_string, u_$c AS n_null FROM g"""
    }
    s"""WITH src AS (
  SELECT CAST(c_custkey AS VARCHAR) AS id_str,
         CAST(c_acctbal AS VARCHAR) AS bal_str,
         CAST(c_acctbal > 0 AS VARCHAR) AS pos_str,
         CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg_null,
         CASE WHEN c_custkey % 3 = 0 THEN CAST(c_custkey AS VARCHAR) ELSE c_mktsegment END AS mixed
  FROM customer),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, ${slots.mkString(", ")} FROM src)
SELECT * FROM (
${rows.mkString("\nUNION ALL\n")}) u ORDER BY instance"""
  }

  /** Chi-square twin (E99): the E80 joint/marginal CTE, expected counts
    * in the same all-double order, the present-cell term minus its
    * absent-cell correction (closed form `+ n`), decSum(38,12). */
  def chiSquare(pairs: Seq[(String, String)], from: String = T): String = {
    val selects = pairs.map { case (a, b) =>
      val e = "(CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)) / CAST(n AS DOUBLE)"
      s"""SELECT col_a, col_b, n_joint, dof, ROUND(chi2_raw, 6) AS chi2,
  CASE WHEN mind <= 0 THEN NULL
       ELSE ROUND(SQRT(chi2_raw / (CAST(n_joint AS DOUBLE) * CAST(mind AS DOUBLE))), 6) END AS cramers_v
FROM (
SELECT '$a' AS col_a, '$b' AS col_b, CAST(SUM(c) AS BIGINT) AS n_joint,
  CASE WHEN SUM(c) IS NULL THEN NULL ELSE
    CAST((COUNT(DISTINCT x) - 1) * (COUNT(DISTINCT y) - 1) AS BIGINT) END AS dof,
  CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) - e) * (CAST(c AS DOUBLE) - e) / e - e, 12) AS DECIMAL(38,12))) AS DOUBLE) + CAST(MAX(n) AS DOUBLE) AS chi2_raw,
  LEAST(COUNT(DISTINCT x), COUNT(DISTINCT y)) - 1 AS mind
FROM (
  SELECT c, x, y, $e AS e, n
  FROM (SELECT x, y, c, SUM(c) OVER (PARTITION BY x) AS cx, SUM(c) OVER (PARTITION BY y) AS cy, SUM(c) OVER () AS n
        FROM (SELECT CAST($a AS VARCHAR) AS x, CAST($b AS VARCHAR) AS y, COUNT(*) AS c
              FROM $from WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2) j) w) m) g"""
    }
    selects.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** Theil's-U twin (E105): the E80 joint CTE, marginal-entropy CTEs with
    * ROUND(·,12) → DECIMAL(38,12) c·ln(c) sums, RAW mi/h quotient
    * rounded at 6 — the Spark expression order verbatim. */
  def theilsU(pairs: Seq[(String, String)], from: String = T): String = {
    val selects = pairs.map { case (a, b) =>
      def hSql(key: String) =
        s"""SELECT LN(CAST(SUM(cm) AS DOUBLE)) -
      CAST(SUM(CAST(ROUND(CAST(cm AS DOUBLE) * LN(CAST(cm AS DOUBLE)), 12) AS DECIMAL(38,12))) AS DOUBLE) / CAST(SUM(cm) AS DOUBLE) AS h
    FROM (SELECT $key, SUM(c) AS cm FROM j GROUP BY 1) m"""
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n_joint,
  ROUND(hxv, 6) AS h_a, ROUND(hyv, 6) AS h_b,
  CASE WHEN hxv > 0 THEN ROUND(mi_raw / hxv, 6) END AS u_ab,
  CASE WHEN hyv > 0 THEN ROUND(mi_raw / hyv, 6) END AS u_ba
FROM (
  WITH j AS (SELECT CAST($a AS VARCHAR) AS x, CAST($b AS VARCHAR) AS y, COUNT(*) AS c
             FROM $from WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2)
  SELECT
    (SELECT CAST(SUM(c) AS BIGINT) FROM j) AS n_joint,
    (SELECT CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * LN((CAST(n AS DOUBLE) * CAST(c AS DOUBLE)) / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 12) AS DECIMAL(38,12))) AS DOUBLE)
     FROM (SELECT c, SUM(c) OVER (PARTITION BY x) AS cx, SUM(c) OVER (PARTITION BY y) AS cy, SUM(c) OVER () AS n FROM j) w) AS mi_raw,
    (SELECT h FROM (${hSql("x")}) hx0) AS hxv,
    (SELECT h FROM (${hSql("y")}) hy0) AS hyv
) q"""
    }
    selects.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** Segmented-completeness twin (E79): one grouped CTE of per-column
    * non-null counts, unpivoted per column, same ROUND(·,6) division. */
  val segmentedCompleteness: String = {
    val cols = Seq("event_id", "ts", "user_id", "value", "props")
    val nn = cols.map(c => s"CAST(COUNT($c) AS BIGINT) AS nn_$c").mkString(", ")
    val rows = cols.map(c =>
      s"SELECT segment, '$c' AS instance, n_rows, n_rows - nn_$c AS n_null, " +
        s"ROUND(nn_$c * 1.0 / n_rows, 6) AS completeness FROM g")
      .mkString("\nUNION ALL\n")
    s"""WITH g AS (
  SELECT CAST(event_type AS VARCHAR) AS segment, CAST(COUNT(*) AS BIGINT) AS n_rows, $nn
  FROM events GROUP BY 1)
SELECT * FROM ($rows) u ORDER BY segment, instance"""
  }

  /** Key-skew twin: frequency relation + single-row reduction; hottest key
    * = MIN key among max-frequency keys (the struct-argmin rule). */
  val keySkew: String =
    """WITH c AS (SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS cnt FROM orders GROUP BY 1),
m AS (SELECT MAX(cnt) AS mx FROM c)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MIN(CASE WHEN cnt = mx THEN k END) AS VARCHAR) AS hot_key, CAST(mx AS BIGINT) AS hot_freq,
  CAST(COUNT(CASE WHEN cnt = 1 THEN 1 END) AS BIGINT) AS keys_f1,
  CAST(COUNT(CASE WHEN cnt BETWEEN 2 AND 9 THEN 1 END) AS BIGINT) AS keys_f2_9,
  CAST(COUNT(CASE WHEN cnt BETWEEN 10 AND 99 THEN 1 END) AS BIGINT) AS keys_f10_99,
  CAST(COUNT(CASE WHEN cnt >= 100 THEN 1 END) AS BIGINT) AS keys_f100p
FROM c, m GROUP BY mx"""

  /** URL-canonicalization twin: identical rendered messy URL, the literal
    * same Java/RE2-portable patterns, same per-domain ROW_NUMBER cap. */
  val urlNormalize: String = {
    val dom = raw"regexp_extract(regexp_replace(host, ':[0-9]+$$', ''), '([^.]+\.[^.]+)$$', 1)"
    raw"""WITH u AS (SELECT doc_id,
    'HTTPS://WWW.' || UPPER(source) || '.CoM' || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END || '/Docs/' || CAST(doc_id AS VARCHAR) || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END || CASE WHEN doc_id % 5 = 0 THEN '#Frag' ELSE '' END AS raw
  FROM documents),
n AS (SELECT doc_id, regexp_replace(raw, '#.*$$', '') AS nf FROM u),
h AS (SELECT doc_id, nf,
    regexp_replace(regexp_replace(lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':(443|80)$$', ''), '^www\.', '') AS host
  FROM n)
SELECT doc_id,
  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' || host || regexp_replace(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?].*)?$$', 1), '/$$', '') AS url_norm,
  $dom AS domain,
  CAST(ROW_NUMBER() OVER (PARTITION BY $dom ORDER BY doc_id) AS BIGINT) AS domain_rank,
  (ROW_NUMBER() OVER (PARTITION BY $dom ORDER BY doc_id)) <= 20 AS kept
FROM h ORDER BY doc_id"""
  }

  /** Strict-order funnel twin: each stage's anchor is the earliest
    * qualifying event strictly after the previous stage's anchor. Same
    * ns→µs floor as the other event oracles. */
  val eventFunnel: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts_us > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY e.user_id)
SELECT 1 AS stage, 'signup' AS event_type, (SELECT COUNT(*) FROM s1) AS n_users
UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
ORDER BY stage"""

  /** Time-to-convert twin (E102): the eventFunnel anchor CTEs, per
    * transition the (t_next − t_prev)/1e6 delta in the same double
    * order, COUNT + QUANTILE_CONT. */
  val timeToConvert: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
s1 AS (SELECT user_id, MIN(ts_us) AS t FROM e WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts_us > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t FROM e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY e.user_id),
t12 AS (SELECT CAST(s2.t - s1.t AS DOUBLE) / 1000000.0 AS d FROM s1 JOIN s2 USING (user_id)),
t23 AS (SELECT CAST(s3.t - s2.t AS DOUBLE) / 1000000.0 AS d FROM s2 JOIN s3 USING (user_id))
SELECT 'signup->view' AS transition, CAST(COUNT(*) AS BIGINT) AS n_users,
  ROUND((ARRAY_AGG(d ORDER BY d))[CAST(CEIL(0.5 * COUNT(*)) AS INT)], 6) AS p50_s,
  ROUND((ARRAY_AGG(d ORDER BY d))[CAST(CEIL(0.9 * COUNT(*)) AS INT)], 6) AS p90_s FROM t12
UNION ALL
SELECT 'view->purchase', CAST(COUNT(*) AS BIGINT),
  ROUND((ARRAY_AGG(d ORDER BY d))[CAST(CEIL(0.5 * COUNT(*)) AS INT)], 6),
  ROUND((ARRAY_AGG(d ORDER BY d))[CAST(CEIL(0.9 * COUNT(*)) AS INT)], 6) FROM t23
ORDER BY transition"""

  /** Cohort-retention twin: epoch-day cohorts via integer division of the
    * microsecond timestamp, distinct (user, cohort, offset) triples. */
  val cohortRetention: String =
    """WITH ev AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT u, MIN(day) AS cohort_day FROM ev GROUP BY 1),
t AS (SELECT DISTINCT ev.u, c.cohort_day, ev.day - c.cohort_day AS day_offset
  FROM ev JOIN c USING (u) WHERE ev.day - c.cohort_day <= 7)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM t GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  /** PSI histogram-drift twin: identical combined-range bucket math
    * (numericHistogram formula), eps-clamped shares, per-bin term rounded
    * to 12 places and summed as DECIMAL(38,12). */
  val histogramDrift: String = {
    val sides = numeric.map(c =>
      s"SELECT '$c' AS instance, CAST($c AS DOUBLE) AS v, l_orderkey % 2 AS snap FROM $T WHERE $c IS NOT NULL")
    s"""WITH st AS (${sides.mkString(" UNION ALL ")}),
mm AS (SELECT instance, MIN(v) AS mn, MAX(v) AS mx FROM st GROUP BY 1),
bk AS (SELECT instance, snap,
    CASE WHEN mx > mn
      THEN LEAST(CAST(FLOOR((v - mn) / ((mx - mn) / CAST(10 AS DOUBLE))) AS BIGINT), 9)
      ELSE 0 END AS bucket
  FROM st JOIN mm USING (instance)),
cnts AS (SELECT instance, snap, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2, 3),
tots AS (SELECT instance,
    COUNT(CASE WHEN snap = 0 THEN 1 END) AS tot_a,
    COUNT(CASE WHEN snap = 1 THEN 1 END) AS tot_b
  FROM bk GROUP BY 1),
grid AS (SELECT instance, i AS bucket FROM mm, UNNEST(range(0, 10)) s(i)),
sh AS (SELECT g.instance,
    GREATEST(CAST(COALESCE(ca.cnt, 0) AS DOUBLE) / CAST(t.tot_a AS DOUBLE), CAST(1e-6 AS DOUBLE)) AS pa,
    GREATEST(CAST(COALESCE(cb.cnt, 0) AS DOUBLE) / CAST(t.tot_b AS DOUBLE), CAST(1e-6 AS DOUBLE)) AS pb
  FROM grid g
  LEFT JOIN cnts ca ON ca.instance = g.instance AND ca.bucket = g.bucket AND ca.snap = 0
  LEFT JOIN cnts cb ON cb.instance = g.instance AND cb.bucket = g.bucket AND cb.snap = 1
  JOIN tots t ON t.instance = g.instance)
SELECT instance,
  ROUND(CAST(SUM(CAST(ROUND((pa - pb) * LN(pa / pb), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) AS psi,
  ROUND(CAST(SUM(CAST(ROUND((pa - pb) * LN(pa / pb), 12) AS DECIMAL(38,12))) AS DOUBLE), 6) > CAST(0.2 AS DOUBLE) AS drifted
FROM sh GROUP BY instance ORDER BY instance"""
  }

  /** Embedding-corpus QA twin: same norm fold, same round-then-cast
    * DECIMAL(38,12) mean contract. */
  val embeddingStats: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(COUNT(*) - COUNT(nrm) AS BIGINT) AS null_vec_count,
  CAST(MIN(nd) AS INT) AS dims_min, CAST(MAX(nd) AS INT) AS dims_max,
  CAST(COUNT(CASE WHEN nrm = 0 THEN 1 END) AS BIGINT) AS zero_norm_count,
  ROUND(MIN(nrm), 6) AS norm_min, ROUND(MAX(nrm), 6) AS norm_max,
  ROUND(CAST(SUM(CAST(ROUND(nrm, 12) AS DECIMAL(38,12))) AS DOUBLE) / CAST(COUNT(nrm) AS DOUBLE), 6) AS norm_mean
FROM (SELECT len(embedding) AS nd, ${listNorm("embedding")} AS nrm FROM embeddings) t"""

  /** Sequence-length-histogram twin: the numericHistogram bucket math over
    * the per-doc whitespace token count. */
  val seqLengthHistogram: String =
    s"""WITH v AS (SELECT CAST(len($wsToksSql) AS BIGINT) AS x FROM documents),
s AS (SELECT CAST(MIN(x) AS DOUBLE) AS mn, CAST(MAX(x) AS DOUBLE) AS mx FROM v),
b AS (SELECT CASE WHEN mx > mn
        THEN LEAST(CAST(FLOOR((CAST(x AS DOUBLE) - mn) / ((mx - mn) / CAST(10 AS DOUBLE))) AS BIGINT), 9)
        ELSE 0 END AS bucket, mn, mx
      FROM v, s WHERE x IS NOT NULL)
SELECT bucket,
  ROUND(mn + bucket * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS lo,
  ROUND(mn + (bucket + 1) * ((mx - mn) / CAST(10 AS DOUBLE)), 6) AS hi,
  COUNT(*) AS cnt
FROM b GROUP BY bucket, mn, mx ORDER BY bucket"""

  /** Constraint-suggestion twin: identical 6-dp-rounded per-column
    * metrics, identical rule set (bare SQL decimals CAST to DOUBLE — a
    * DuckDB bare 1.0 is DECIMAL). */
  val constraintSuggest: String = {
    val rows = profiled.map { c =>
      val mn =
        if (numeric.contains(c)) s"ROUND(${minimumExpr(c)}, 6)"
        else "CAST(NULL AS DOUBLE)"
      s"SELECT '$c' AS instance, ROUND(CAST(${completenessExpr(c)} AS DOUBLE), 6) AS comp, " +
        s"ROUND(CAST(${distinctnessExpr(c)} AS DOUBLE), 6) AS dist, $mn AS mn FROM $T"
    }
    s"""WITH m AS (${rows.mkString(" UNION ALL ")})
SELECT instance, rule, threshold FROM (
  SELECT instance, 'is_complete' AS rule, CAST(1.0 AS DOUBLE) AS threshold FROM m WHERE comp = 1.0
  UNION ALL SELECT instance, 'has_completeness_ge', FLOOR(comp * 100) / 100 FROM m WHERE comp > 0.0 AND comp < 1.0
  UNION ALL SELECT instance, 'is_unique', CAST(1.0 AS DOUBLE) FROM m WHERE dist = 1.0
  UNION ALL SELECT instance, 'non_negative', CAST(0.0 AS DOUBLE) FROM m WHERE mn >= 0) q
ORDER BY instance, rule"""
  }

  /** Tokenizer-application twin: vocab id = rank in the vocabTopK order,
    * OOV = 0, sequence fingerprint via ORDER BY pos string_agg (the
    * array_sort(collect_list(struct)) order on the Spark side). */
  val tokenizeIds: String =
    s"""WITH words AS (SELECT doc_id, $wsToksLowerSql AS w FROM documents),
tok AS (SELECT doc_id, i AS pos, w[i] AS t FROM words, UNNEST(range(1, len(w) + 1)) s(i)),
vc AS (SELECT t.x AS token, COUNT(*) AS freq FROM documents, UNNEST($wsToksLowerSql) t(x) GROUP BY 1),
vocab AS (SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS BIGINT) AS tok_id
  FROM (SELECT token, freq FROM vc ORDER BY freq DESC, token ASC LIMIT 1000) v),
j AS (SELECT doc_id, pos, COALESCE(tok_id, 0) AS tid FROM tok LEFT JOIN vocab ON t = token),
g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(COUNT(CASE WHEN tid = 0 THEN 1 END) AS BIGINT) AS oov_count,
    CAST(SUM(tid) AS BIGINT) AS ids_sum,
    substr(sha256(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos)), 1, 16) AS ids_sha
  FROM j GROUP BY 1)
SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens, COALESCE(oov_count, 0) AS oov_count,
  COALESCE(ids_sum, 0) AS ids_sum, COALESCE(ids_sha, substr(sha256(''), 1, 16)) AS ids_sha
FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id ORDER BY d.doc_id"""

  /** Metric-anomaly twin: per-snapshot metrics from the same grouped scan
    * expressions, then the identical fixed-order double assembly — history
    * mean (m0+m1+m2)/3.0, population stddev via (v−h)·(v−h) squares, z on
    * the 6-dp rounding both engines share. */
  val metricAnomaly: String = {
    val ms = Seq(
      "Mean_l_extendedprice" -> s"${decSum("l_extendedprice")} / COUNT(l_extendedprice)",
      "Size" -> "CAST(COUNT(*) AS DOUBLE)",
      "Sum_l_quantity" -> decSum("l_quantity"))
    val sCols = ms.zipWithIndex.map { case ((_, e), i) => s"$e AS m$i" }.mkString(", ")
    val pCols = ms.indices.flatMap(i =>
      (0 to 3).map(b => s"MAX(CASE WHEN snapshot = $b THEN m$i END) AS m${i}_$b"))
      .mkString(", ")
    val tCols = ms.indices.map(i =>
      s"(m${i}_0 + m${i}_1 + m${i}_2) / 3.0 AS h$i").mkString(", ")
    val uCols = ms.indices.map(i =>
      s"SQRT((((m${i}_0 - h$i) * (m${i}_0 - h$i)) + ((m${i}_1 - h$i) * (m${i}_1 - h$i)) + ((m${i}_2 - h$i) * (m${i}_2 - h$i))) / 3.0) AS sd$i")
      .mkString(", ")
    val sels = ms.zipWithIndex.map { case ((n, _), i) =>
      s"SELECT '$n' AS name, ROUND(m${i}_3, 6) AS current, ROUND(h$i, 6) AS hist_mean, " +
        s"ROUND(sd$i, 6) AS hist_stddev, " +
        s"CASE WHEN sd$i > 0 THEN ROUND((m${i}_3 - h$i) / sd$i, 6) END AS z, " +
        s"CASE WHEN sd$i > 0 THEN ABS(ROUND((m${i}_3 - h$i) / sd$i, 6)) > 3.0 ELSE FALSE END AS is_anomaly FROM u"
    }
    s"""WITH s AS (SELECT l_orderkey % 4 AS snapshot, $sCols FROM $T GROUP BY 1),
p AS (SELECT $pCols FROM s),
t AS (SELECT *, $tCols FROM p),
u AS (SELECT *, $uCols FROM t)
${sels.mkString(" UNION ALL ")} ORDER BY name"""
  }

  /** Cluster-representative twin: the recursive-CTE transitive closure of
    * the Jaccard pair graph + the text_quality composite, rank 1 per
    * cluster on (quality DESC, doc_id). */
  val dedupClusterBest: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH RECURSIVE $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION SELECT id_b, id_a FROM jpairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
cl AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
q AS (SELECT doc_id,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS quality
  FROM (SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) t)
SELECT cl.doc_id, cl.cluster_id, q.quality,
  (ROW_NUMBER() OVER (PARTITION BY cl.cluster_id ORDER BY q.quality DESC, cl.doc_id) = 1) AS keep
FROM cl JOIN q ON cl.doc_id = q.doc_id ORDER BY cl.doc_id"""
  }

  /** Static column inventory of EVERY testdata table (TESTDATA.md schemas):
    * the Text+Numeric columns the profiler's battery covers. Skipped
    * classes are absent from BOTH sides: embeddings' float array and every
    * timestamp column (`events.ts` is TIMESTAMP(MICROS, NTZ) — class
    * Skipped per reference parity, like lineitem/orders' date columns). */
  private val allTablesProfiled: Seq[(String, Seq[String])] = Seq(
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
  val AllTables: Seq[String] = allTablesProfiled.map(_._1)

  /** Golden twin of the approx-sketch accuracy audit: the Spark side emits
    * deterministic booleans (HLL within 3x rsd of exact, percentile_approx
    * inside the exact envelope at p ± 2/accuracy), so the oracle pins them
    * as an all-true VALUES list — any sketch regression hash-fails. */
  val approxErrorAudit: String = {
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
  val profileAllTables: String = {
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
  private def allTrue(properties: Seq[String]): String =
    s"SELECT * FROM (VALUES ${properties.sorted.map(p => s"('$p', true)").mkString(", ")}) " +
      "AS t(property, ok) ORDER BY property"

  val minhashAudit: String =
    allTrue(Seq("pairs_subset_of_exact", "threshold_and_ordering"))

  /** E205 cross-batch incremental dedup audit: signature-store
    * mergeability (union of per-sub-batch states ≡ one-pass state),
    * detection invariance under store composition, exact-stage parity
    * with E39, and planted byte-identical cross-batch copies caught by
    * both stages at est_jaccard = 1. */
  val dedupIncrementalLshAudit: String = allTrue(Seq(
    "detection_state_invariant", "exact_parity_with_incremental_exact",
    "planted_cross_dups_caught", "state_merge_equals_whole"))

  /** E206 image near-dup audit: uncapped banded pairs ≡ brute-force
    * pairwise scan (pigeonhole completeness is unconditional),
    * byte-identical images pair at hamming 0, pairs canonical. */
  val imageNearDupAudit: String = allTrue(Seq(
    "canonical_pairs", "equals_bruteforce", "identical_twins_hamming_zero"))

  /** E207 audio near-dup audit: the image properties verbatim. */
  val audioNearDupAudit: String = allTrue(Seq(
    "canonical_pairs", "equals_bruteforce", "identical_twins_hamming_zero"))

  /** E208 image-dedup executor audit: larger-id drop-rule soundness. */
  val imageDedupExecuteAudit: String = allTrue(Seq(
    "every_cluster_keeps_min_id", "idempotent_on_kept_corpus",
    "removals_are_exactly_pair_targets"))

  /** E219 audio-dedup executor audit: the image properties verbatim
    * (VERDICT r12 task 4 — the one no-oracle key without a twin). */
  val audioDedupExecuteAudit: String = allTrue(Seq(
    "every_cluster_keeps_min_id", "idempotent_on_kept_corpus",
    "removals_are_exactly_pair_targets"))

  /** E221 persisted-IVF-index audit: artifact-served search ≡ in-plan
    * recompute (ivf_topk and the ANN hard-negative miner), split-build
    * + batch append ≡ whole build, row-count sidecars correct. */
  val ivfFromIndexAudit: String = allTrue(Seq(
    "append_equals_whole", "artifact_equals_inplan",
    "hard_negatives_from_index_parity", "meta_counts_match"))

  /** E222 incremental image-dedup audit: store-backed detection ≡
    * whole-corpus detection on the cross-cut pairs, parquet artifact ≡
    * in-memory state, two appends ≡ one write, planted re-ingests
    * caught by both stages. */
  val imageIncrementalDedupAudit: String = allTrue(Seq(
    "artifact_equals_inmemory", "cross_pairs_equal_whole_corpus",
    "planted_reingests_caught", "split_append_equals_whole"))

  /** E222 audio face: the image properties verbatim over the
    * envelope-hash store. */
  val audioIncrementalDedupAudit: String = imageIncrementalDedupAudit

  /** E209 k-means trajectory twin: the %83 init coordinates, then per
    * iteration (assemble centroid arrays ordered by dim → 6-dp cosine
    * argmax assignment with centroid-id tie-break → decimal-quantized
    * coordinate means), each step a MATERIALIZED CTE — the same
    * step-replay pattern as the logreg/PCA/Group-DRO training oracles. */
  lazy val kmeansTrain: String = {
    def one(t: Int): String = {
      val prev = if (t == 1) "c0" else s"c${t - 1}"
      s"""ca$t AS MATERIALIZED (SELECT centroid_id, list(m ORDER BY dim) AS c FROM $prev GROUP BY centroid_id),
a$t AS MATERIALIZED (SELECT vec_id, centroid_id, cos FROM (
  SELECT e.vec_id, ca$t.centroid_id,
    ROUND(${listDot("e.v", s"ca$t.c")} / (e.nv * ${listNorm(s"ca$t.c")}), 6) AS cos
  FROM e CROSS JOIN ca$t
  WHERE e.nv * ${listNorm(s"ca$t.c")} > 0) x
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
s$t AS (SELECT $t AS iter, centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
    ROUND(CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 6) AS mean_cos
  FROM a$t GROUP BY centroid_id),
c$t AS MATERIALIZED (SELECT a$t.centroid_id, ex.dim,
    ROUND(CAST(SUM(CAST(ROUND(ex.x, 12) AS DECIMAL(38,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS m
  FROM ex JOIN a$t USING (vec_id) GROUP BY a$t.centroid_id, ex.dim)"""
    }
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS v, ${listNorm("embedding")} AS nv
  FROM embeddings WHERE ${listNorm("embedding")} > 0),
ex AS MATERIALIZED (SELECT vec_id, CAST(generate_subscripts(v, 1) - 1 AS INT) AS dim,
    CAST(unnest(v) AS DOUBLE) AS x FROM e),
c0 AS (SELECT vec_id AS centroid_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
    CAST(unnest(embedding) AS DOUBLE) AS m FROM embeddings WHERE vec_id % 83 = 0),
${one(1)},
${one(2)},
${one(3)}
SELECT iter, centroid_id, n_members, mean_cos FROM (
  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
ORDER BY iter, centroid_id"""
  }

  /** E210 temperature-mix twin: EXP(α·LN(c)) scores (the LN/EXP parity
    * contract — no POWER), 6-dp rounded, normalized by their EXACT
    * DECIMAL(38,6) sum; proportional weight, boost ratio and
    * FLOOR(target·w) allocations off the rounded columns. */
  def temperatureMixSql(alpha: Double, targetTotal: Long): String =
    s"""WITH c AS (SELECT CAST(lang AS VARCHAR) AS domain, COUNT(*) AS cnt FROM documents WHERE lang IS NOT NULL GROUP BY 1),
s AS (SELECT domain, CAST(cnt AS BIGINT) AS n_docs,
    ROUND(EXP($alpha * LN(CAST(cnt AS DOUBLE))), 6) AS score FROM c),
t AS (SELECT SUM(CAST(score AS DECIMAL(38,6))) AS z, SUM(n_docs) AS nt FROM s),
w AS (SELECT domain, n_docs,
    ROUND(CAST(score AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
    ROUND(CAST(n_docs AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS prop_weight
  FROM s, t)
SELECT domain, n_docs, weight, prop_weight,
  ROUND(weight / prop_weight, 6) AS boost,
  CAST(FLOOR($targetTotal * weight) AS BIGINT) AS target_n
FROM w ORDER BY domain"""

  lazy val temperatureMix: String = temperatureMixSql(0.3, 10000L)

  /** E211 streaming-vs-batch parity audit: streaming exact rows and near
    * pairs must equal the batch incremental operator bit-for-bit. */
  val streamingStateDedupAudit: String = allTrue(Seq(
    "exact_rows_equal_batch", "near_pairs_equal_batch"))

  /** E213 twin: the knn_assign rank-1 assignment, per-cluster exact
    * decimal mean/second-moment, σ from the positive-variance guard,
    * z from the same double expression; the outlier flag compares the
    * ROUNDED z (mirroring the engine column). */
  lazy val embeddingOutliers: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
a AS (SELECT vec_id, centroid_id, cos FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
st AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(ROUND(cos, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu,
    CAST(SUM(CAST(ROUND(cos * cos, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS m2
  FROM a GROUP BY 1),
s2 AS (SELECT centroid_id, n, mu,
    CASE WHEN m2 - mu * mu > 0 THEN SQRT(m2 - mu * mu) END AS sigma FROM st)
SELECT a.vec_id, a.centroid_id, a.cos, s2.n AS cluster_n,
  ROUND(mu, 6) AS cluster_mean,
  ROUND((a.cos - mu) / sigma, 6) AS z,
  COALESCE(ROUND((a.cos - mu) / sigma, 6) < -3.0, false) AS is_outlier
FROM a JOIN s2 USING (centroid_id) ORDER BY a.vec_id"""

  /** E220 twin: the two-batch store with re-ingested copies, min-id
    * representative + copy count per distinct content. */
  val dedupStateCompact: String =
    """WITH base AS (SELECT doc_id, COALESCE(text, 'null') AS t FROM documents),
off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
allr AS (
  SELECT doc_id, t FROM base
  UNION ALL
  SELECT doc_id + (SELECT o FROM off) AS doc_id, t FROM base
  WHERE doc_id < 400 AND doc_id % 5 = 0)
SELECT CAST(MIN(doc_id) AS BIGINT) AS id, sha256(t) AS content_hash,
  CAST(COUNT(*) AS BIGINT) AS n_copies
FROM allr GROUP BY t ORDER BY id"""

  /** E220 compaction audit: detection-flag invariance, one row per
    * distinct content, absorbed-copy mass preserved. */
  val dedupStateCompactAudit: String = allTrue(Seq(
    "copy_mass_preserved", "detection_flags_invariant",
    "one_row_per_distinct_content"))

  /** E215 calibration audit: pair mass preserved by the decile rollup,
    * exact values ≡ the n-gram Jaccard relation, estimates in [0,1]. */
  val minhashCalibrationAudit: String = allTrue(Seq(
    "est_exact_in_unit_range", "exact_matches_ngram_jaccard",
    "rollup_preserves_pair_mass"))

  /** E216 twin: per-day volumes, integer day ages against the max day,
    * EXP decay weights (the LN/EXP parity contract), 6-dp products. */
  val freshnessWeights: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1),
m AS (SELECT MAX(day) AS newest FROM d),
w AS (SELECT CAST(day AS VARCHAR) AS day, n_events,
    CAST(date_diff('day', day, newest) AS BIGINT) AS age_days FROM d, m),
x AS (SELECT day, n_events, age_days,
    ROUND(EXP(-CAST(age_days AS DOUBLE) / 30.0), 6) AS weight FROM w)
SELECT day, n_events, age_days, weight,
  ROUND(CAST(n_events AS DOUBLE) * weight, 6) AS effective_n
FROM x ORDER BY day"""

  /** E217 twin: the shared-shingle Jaccard chain, top-20 by (J desc, id
    * tie-break), shared shingles per selected pair re-derived from the
    * shingle relation, sorted, first five '|'-joined. */
  val dupPairExplain: String =
    s"""WITH $jaccardCtes,
top AS (SELECT id_a, id_b, jaccard FROM jpairs
  ORDER BY jaccard DESC, id_a, id_b LIMIT 20),
shr AS (SELECT t.id_a, t.id_b, t.jaccard, a.s
  FROM top t JOIN sh a ON a.doc_id = t.id_a
  JOIN sh b ON b.doc_id = t.id_b AND b.s = a.s)
SELECT id_a, id_b, jaccard,
  CAST(COUNT(*) AS BIGINT) AS n_shared,
  array_to_string((list_sort(list(s)))[1:5], '|') AS shared_sample
FROM shr GROUP BY id_a, id_b, jaccard ORDER BY id_a, id_b"""

  /** E218 twin: the planted-boilerplate corpus, first content occurrence
    * by (batch, id), per-batch dup counts and 6-dp rate. */
  val dedupRateByBatch: String =
    """WITH d AS (SELECT doc_id, doc_id // 50 AS batch,
    CASE WHEN doc_id % 7 = 0
      THEN 'shared boilerplate ' || CAST(doc_id % 3 AS VARCHAR)
      ELSE COALESCE(text, 'null') END AS t
  FROM documents),
f AS (SELECT t, batch AS fb, doc_id AS fi FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY t ORDER BY batch, doc_id) = 1),
j AS (SELECT d.batch,
    CASE WHEN d.batch > f.fb OR (d.batch = f.fb AND d.doc_id > f.fi)
      THEN 1 ELSE 0 END AS is_dup
  FROM d JOIN f ON f.t = d.t)
SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(is_dup) AS BIGINT) AS n_dups,
  ROUND(CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
FROM j GROUP BY batch ORDER BY batch"""

  /** E214 twin: DISTINCT (content, source) relation self-joined on the
    * content (DuckDB compares the text directly — equality structure is
    * what the matrix counts), per-source totals, 6-dp content Jaccard. */
  val crossDedupMatrix: String =
    """WITH d AS (SELECT CASE WHEN doc_id % 7 = 0
      THEN 'shared boilerplate ' || CAST(doc_id % 3 AS VARCHAR)
      ELSE text END AS text, source FROM documents),
hg AS (SELECT DISTINCT COALESCE(text, 'null') AS h, CAST(source AS VARCHAR) AS g
  FROM d WHERE source IS NOT NULL),
t AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM hg GROUP BY 1),
m AS (SELECT a.g AS source_a, b.g AS source_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM hg a JOIN hg b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2)
SELECT source_a, source_b, ta.n AS n_a, tb.n AS n_b, n_shared,
  ROUND(CAST(n_shared AS DOUBLE) / CAST(ta.n + tb.n - n_shared AS DOUBLE), 6) AS content_jaccard
FROM m JOIN t ta ON ta.g = source_a JOIN t tb ON tb.g = source_b
ORDER BY source_a, source_b"""

  /** E212 curriculum twin (lazy: wsToksSql initializes later in this
    * object): the text_quality score expression verbatim, a
    * per-distinct-score token rollup with an ordered window (score
    * DESC), a per-score partitioned within-window (id ASC), integer
    * floor division for the epoch. */
  lazy val curriculumEpochs: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH q AS (SELECT doc_id AS id,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score,
    ws_tokens AS n_tokens
  FROM (
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) r),
f AS (SELECT * FROM q WHERE score IS NOT NULL),
h AS (SELECT score, CAST(SUM(n_tokens) AS BIGINT) AS cell_toks FROM f GROUP BY 1),
o AS (SELECT score,
    CAST(SUM(cell_toks) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - cell_toks AS better_toks
  FROM h),
w AS (SELECT id, score, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY score ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS within
  FROM f)
SELECT w.id, w.score, w.n_tokens,
  (o.better_toks + w.within) AS cum_before,
  CAST((o.better_toks + w.within) // 20000 AS BIGINT) AS epoch
FROM w JOIN o USING (score) ORDER BY id"""
  }

  /** E203 recall-curve audit: per-band caught ⊆ exact, the J = 1 band
    * deterministically fully caught, every LSH pair in exactly one
    * band. */
  val lshRecallAudit: String =
    allTrue(Seq("caught_subset_per_band", "perfect_band_fully_caught",
      "total_caught_equals_lsh_pairs"))

  /** E195 cluster audit: canonical min-id labels, LSH components refine
    * the exact components (verified pairs ⊆ exact pairs ⇒ each LSH
    * cluster lies inside ONE exact cluster), keep-one yield bounded by
    * the exact graph's. */
  val minhashClustersAudit: String =
    allTrue(Seq("cluster_label_is_min_id", "clusters_refine_exact",
      "yield_at_most_exact"))

  /** E185 executor audit: sound removals, corpus partition, identical
    * docs caught deterministically (J=1 ⇒ identical band hashes). */
  val minhashDedupExecuteAudit: String =
    allTrue(Seq("identical_pairs_always_caught",
      "kept_plus_removed_partitions_corpus", "removed_subset_of_exact"))

  /** E163 approximate-overlap audit: the three HLL estimates within the
    * standard-error bound of their exact twins, the inclusion–exclusion
    * overlap within the summed bound, containments consistent. */
  val approxOverlapAudit: String = allTrue(Seq(
    "containments_consistent", "n_a_within_bound", "n_b_within_bound",
    "n_union_within_bound", "overlap_within_summed_bound"))

  /** E163 persisted-state audit (r11): the state-based overlap must be
    * bit-identical to the direct sketch computation, and split states
    * must union losslessly to the whole-table state. */
  val approxOverlapStatesAudit: String = allTrue(Seq(
    "estimates_match_rescan", "overlap_nonnegative",
    "split_merge_lossless"))

  /** E164 in-engine logistic-regression training twin (r11) — the BPE
    * replay pattern applied to model training: six chained CTE steps,
    * each computing the decimal-quantized gradient term sums, the
    * pre-update softplus log-loss and the z≥0 accuracy with the previous
    * step's weights, then the 6-dp weight update. Feature quantization
    * (6 dp) keeps the logit a fixed-order double expression both engines
    * evaluate identically; gradient/log-loss terms round to
    * DECIMAL(38,6) before summing (a last-ulp exp/ln disagreement is six
    * orders below the grain). */
  lazy val qualityLogreg: String =
    s"""WITH ${logregCtes()}
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
UNION ALL SELECT * FROM r6 ORDER BY iter"""

  /** Calibration-table twin (E175): the textQuality score expression,
    * the fixed logistic `σ(8·(q − 0.5))` rounded to 6 dp (the shared
    * bucketing double), the ×10 floor buckets, DECIMAL(38,6) mean and
    * exact positive fraction. */
  lazy val calibrationTable: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT lang, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
s AS (SELECT ROUND(1.0/(1.0+EXP(-(8.0 * (score - 0.5)))), 6) AS p,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM (
    SELECT lang,
      ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
    FROM b) q
  WHERE score IS NOT NULL)
SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS mean_p,
  ROUND(CAST(COUNT(CASE WHEN y = 1.0 THEN 1 END) AS DOUBLE) / COUNT(*), 6) AS frac_pos
FROM s GROUP BY 1 ORDER BY bucket"""
  }

  /** The quality-score label (E180): the proven E9 score twin at 6 dp,
    * thresholded at 0.5 — "reference-like" membership. */
  private val qualityLabelYSql: String =
    "CASE WHEN ROUND(0.4 * LEAST(ws_tokens / 100.0, 1.0) + " +
      "0.3 * (1.0 - punct * 1.0 / n_chars) + " +
      "0.3 * (stop_hits * 1.0 / ws_tokens), 6) >= 0.5 " +
      "THEN 1.0 ELSE 0.0 END"

  /** Naive-Bayes filter twin (E196): the E157 hashed unigram+bigram
    * feature stream, the E180 reference-quality label, per-bucket class
    * counts + Laplace log-ratios (ROUND 12, decimal-summed), the prior
    * quantized the same way, keep on the EXACT decimal log-odds. */
  lazy val naiveBayesFilter: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    raw"""WITH words AS (SELECT doc_id, $wsToksLowerSql AS w FROM documents),
pre AS (SELECT doc_id,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
lab AS (SELECT doc_id, ($qualityLabelYSql) = 1.0 AS is_t FROM pre),
tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM words),
feats AS (
  SELECT doc_id, t AS f FROM tok
  UNION ALL
  SELECT a.doc_id, a.t || ' ' || b.t AS f
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
fb AS (SELECT f.doc_id, l.is_t,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(f.f, ''), c -> CAST(ord(c) AS BIGINT))),
      (a, b) -> (a * 31 + b) % 2147483647) % 64 AS bucket
  FROM feats f JOIN lab l USING (doc_id)),
hist AS (SELECT bucket,
    SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS c1,
    SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS c0
  FROM fb GROUP BY 1),
tot AS (SELECT SUM(c1) AS t1, SUM(c0) AS t0 FROM hist),
lr AS (SELECT bucket,
    CAST(ROUND(LN(CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 64 AS DOUBLE))
             - LN(CAST(c0 + 1 AS DOUBLE) / CAST(t0 + 64 AS DOUBLE)), 12)
      AS DECIMAL(38,12)) AS lr
  FROM hist, tot),
pri AS (SELECT CAST(ROUND(LN(
      CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) + 1 AS DOUBLE) /
      CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) + 1 AS DOUBLE)), 12)
    AS DECIMAL(38,12)) AS prior FROM lab),
pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, SUM(lr) AS s
  FROM fb JOIN lr USING (bucket) GROUP BY 1)
SELECT d.doc_id, COALESCE(n_feats, 0) AS n_feats,
  ROUND(CAST(COALESCE(s, 0) + prior AS DOUBLE), 6) AS log_odds,
  (COALESCE(s, 0) + prior) >= 0 AS keep
FROM documents d LEFT JOIN pd USING (doc_id), pri ORDER BY d.doc_id"""
  }

  /** Composite quality-gate twin (E198): the three verdict statements
    * nested verbatim, composed by an id-keyed join with the identical
    * conjunction. */
  lazy val qualityGate: String =
    s"""WITH g AS ($gopherRules),
b AS ($ccnetBuckets),
nb AS ($naiveBayesFilter)
SELECT d.doc_id, g.keep AS rules_ok,
  COALESCE(b.bucket, 'none') AS bucket,
  nb.keep AS nb_ok, nb.log_odds,
  (g.keep AND nb.keep AND COALESCE(b.bucket, 'none') <> 'tail'
    AND COALESCE(b.bucket, 'none') <> 'none') AS keep,
  sha256(d.text) AS text_sha, CAST(LENGTH(d.text) AS BIGINT) AS n_chars
FROM documents d
JOIN g ON g.doc_id = d.doc_id
LEFT JOIN b ON b.doc_id = d.doc_id
JOIN nb ON nb.doc_id = d.doc_id
ORDER BY d.doc_id"""

  /** The E164 training chain: quantized feature relation `f`, zero
    * weights `w0`, and six chained (gradient, update, readout) CTE
    * triples ending at `w6`/`r6`. `lr` is the interpolated learning
    * rate (both engines update `w ← ROUND(w − lr·g, 6)`); `ySql` the
    * 0.0/1.0 label expression over the pre-feature relation (default:
    * is-English — E180 swaps in the reference-quality label); `fromSql`
    * the source relation (E183 trains over the deduped CTE). Kept to
    * six steps: DuckDB inlines single-referenced CTEs, so a much deeper
    * chain (each step referencing the prior several times) explodes the
    * expression tree exponentially — measured unusable at 30 steps. */
  private def logregCtes(
      lr: String = "1.0",
      ySql: String = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
      fromSql: String = "documents"): String = {
    val en = stopList(graft.functions.TextFunctions.Stopwords
      .collectFirst { case ("en", w) => w }.get)
    def zed = "(w0 + w1*x1 + w2*x2 + w3*x3)"
    def p = s"(1.0/(1.0+EXP(-$zed)))"
    def gTerm(x: String) =
      s"ROUND(CAST(SUM(CAST(ROUND(($p - y) * $x, 6) AS DECIMAL(38,6))) " +
        s"AS DOUBLE)/COUNT(*), 6)"
    val llTerm =
      s"ROUND(CAST(SUM(CAST(ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * $zed)), 6) " +
        s"AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*), 6)"
    val accTerm =
      s"ROUND(CAST(COUNT(CASE WHEN ($zed >= 0) = (y = 1.0) THEN 1 END) " +
        s"AS DOUBLE)/COUNT(*), 6)"
    val steps = (1 to 6).map { k =>
      s"""g$k AS (
  SELECT ${gTerm("1.0")} AS g0, ${gTerm("x1")} AS g1,
    ${gTerm("x2")} AS g2, ${gTerm("x3")} AS g3,
    $llTerm AS ll, $accTerm AS acc
  FROM f, w${k - 1}),
w$k AS (
  SELECT ROUND(w0 - $lr*g0, 6) AS w0, ROUND(w1 - $lr*g1, 6) AS w1,
    ROUND(w2 - $lr*g2, 6) AS w2, ROUND(w3 - $lr*g3, 6) AS w3
  FROM w${k - 1}, g$k),
r$k AS (
  SELECT CAST($k AS BIGINT) AS iter, w.w0, w.w1, w.w2, w.w3,
    g.ll AS mean_logloss, g.acc AS accuracy
  FROM w$k w, g$k g)"""
    }.mkString(",\n")
    raw"""f AS (
  SELECT doc_id,
    ROUND(LEAST(CAST(ws_tokens AS DOUBLE)/100.0, 1.0), 6) AS x1,
    ROUND(CAST(punct AS DOUBLE)/n_chars, 6) AS x2,
    ROUND(CAST(stop_hits AS DOUBLE)/ws_tokens, 6) AS x3,
    $ySql AS y
  FROM (
    SELECT doc_id, lang, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '${graft.functions.TextFunctions.PunctPattern}')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM $fromSql) i
  WHERE n_chars > 0 AND ws_tokens > 0),
w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
  CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
$steps"""
  }

  /** E183 end-to-end curation twin — the whole pipeline replayed in one
    * statement: E2's jaccard pair CTEs → NOT EXISTS anti join (the E181
    * larger-id rule) → the FULL training chain over the deduped
    * relation (reference-quality label, lr 8) → logit-threshold keep →
    * the E21 split bounds and E176 shard/fingerprint algebra rolled up
    * per (split, shard) with the commutative bit_xor digest. */
  lazy val corpusCurate: String =
    s"""WITH $jaccardCtes,
corpus2 AS MATERIALIZED (
  SELECT d.* FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM jpairs p WHERE p.id_b = d.doc_id)),
${logregCtes(lr = "8.0", ySql = qualityLabelYSql, fromSql = "corpus2")},
scored AS (SELECT doc_id, (w0 + w1*x1 + w2*x2 + w3*x3) AS z FROM f, w6),
kept AS (
  SELECT c.doc_id, c.text,
    ('0x' || substr(sha256(CAST(c.doc_id AS VARCHAR) || 'graft'), 1, 8))::BIGINT % 10000 AS b,
    ('0x' || substr(sha256(CAST(c.doc_id AS VARCHAR) || 'shard'), 1, 8))::BIGINT % 10000 % 8 AS shard,
    ('0x' || substr(sha256(CAST(c.doc_id AS VARCHAR) || ':' || c.text), 1, 15))::BIGINT AS fp
  FROM corpus2 c JOIN scored s ON c.doc_id = s.doc_id WHERE s.z >= 0)
SELECT CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END AS split,
  shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
  bit_xor(fp) AS digest
FROM kept GROUP BY 1, 2 ORDER BY split, shard"""

  /** E180 quality-filter executor twin: replay the full training chain
    * under the reference-quality label at lr 8 (the executor's training
    * configuration), score every feature-valid document with the FINAL
    * weights (the identical fixed-order logit), keep z ≥ 0 (the
    * logit-threshold convention — no transcendental at the boundary)
    * and pin the kept text by sha256. */
  lazy val qualityFilterExecute: String =
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)},
scored AS (
  SELECT doc_id, (w0 + w1*x1 + w2*x2 + w3*x3) AS z FROM f, w6)
SELECT s.doc_id, ROUND(s.z, 6) AS score, sha256(d.text) AS text_sha
FROM scored s JOIN documents d USING (doc_id)
WHERE s.z >= 0 ORDER BY s.doc_id"""

  /** E181 Jaccard-dedup executor twin: the E2 pair relation's larger ids
    * are the removal set (`id_a < id_b` by construction, so a doc is
    * removed iff it appears as some pair's id_b); the kept corpus
    * returns sha256-pinned with its char length. */
  lazy val jaccardDedupExecute: String =
    s"""WITH $jaccardCtes
SELECT d.doc_id, sha256(d.text) AS text_sha,
  CAST(LENGTH(d.text) AS BIGINT) AS n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM jpairs p WHERE p.id_b = d.doc_id)
ORDER BY d.doc_id"""

  /** E182 Group-DRO training twin — the E164 replay pattern with a
    * per-domain axis: each of six steps is (a$k) the per-domain decimal
    * gradient/loss/accuracy sums under the previous weights, (m$k) 6-dp
    * per-domain means, (qr$k/qd$k/q$k) the multiplicative mixture-weight
    * update `ROUND(q·e^{η·ℓ}, 6)` normalized by the EXACT decimal sum of
    * the 6-dp raw weights, (g$k) the q-weighted gradient as
    * DECIMAL(38,12) sums of `ROUND(q·gm, 12)` terms, and (w$k) the 6-dp
    * weight step. The heavy per-domain aggregates are AS MATERIALIZED:
    * DuckDB inlines single-reference CTEs, and the multi-reference
    * chain otherwise re-expands exponentially with depth. */
  lazy val groupDroTrain: String =
    s"""WITH ${groupDroCtes()}
SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
UNION ALL SELECT * FROM r6 ORDER BY iter, domain"""

  /** E184 DoReMi-selection twin: the E182 chain grouped by language,
    * then the learned q6 turned into integer keep-bounds
    * `ROUND(10000·q/q_max)` and replayed as the deterministic E20
    * hash-bucket coin per document. */
  lazy val doremiSelect: String =
    s"""WITH ${groupDroCtes(grpSql = "lang")},
sel AS (
  SELECT d.doc_id, d.lang AS domain,
    CAST(ROUND(10000 * q.q / (SELECT MAX(q) FROM q6)) AS BIGINT) AS bound
  FROM documents d JOIN q6 q ON d.lang = q.grp)
SELECT doc_id, domain, bound FROM sel
WHERE ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'doremi'), 1, 8))::BIGINT % 10000 < bound
ORDER BY doc_id"""

  private def groupDroCtes(grpSql: String = "source"): String = {
    val en = stopList(graft.functions.TextFunctions.Stopwords
      .collectFirst { case ("en", w) => w }.get)
    def zed = "(w0 + w1*x1 + w2*x2 + w3*x3)"
    def p = s"(1.0/(1.0+EXP(-$zed)))"
    def sTerm(x: String) =
      s"SUM(CAST(ROUND(($p - y) * $x, 6) AS DECIMAL(38,6)))"
    val sllTerm =
      s"SUM(CAST(ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * $zed)), 6) " +
        "AS DECIMAL(38,6)))"
    val hitsTerm =
      s"COUNT(CASE WHEN ($zed >= 0) = (y = 1.0) THEN 1 END)"
    val steps = (1 to 6).map { k =>
      s"""a$k AS MATERIALIZED (
  SELECT grp, COUNT(*) AS n, ${sTerm("1.0")} AS s0, ${sTerm("x1")} AS s1,
    ${sTerm("x2")} AS s2, ${sTerm("x3")} AS s3,
    $sllTerm AS sll, $hitsTerm AS hits
  FROM fg, w${k - 1} GROUP BY grp),
m$k AS (
  SELECT grp, n,
    ROUND(CAST(s0 AS DOUBLE)/n, 6) AS gm0, ROUND(CAST(s1 AS DOUBLE)/n, 6) AS gm1,
    ROUND(CAST(s2 AS DOUBLE)/n, 6) AS gm2, ROUND(CAST(s3 AS DOUBLE)/n, 6) AS gm3,
    ROUND(CAST(sll AS DOUBLE)/n, 6) AS ml,
    ROUND(CAST(hits AS DOUBLE)/n, 6) AS acc
  FROM a$k),
qr$k AS MATERIALIZED (
  SELECT m.grp, m.n, m.ml, m.acc, m.gm0, m.gm1, m.gm2, m.gm3,
    ROUND(q.q * EXP(0.5 * m.ml), 6) AS qraw
  FROM m$k m JOIN q${k - 1} q ON m.grp = q.grp),
q$k AS MATERIALIZED (
  SELECT grp, n, ml, acc, gm0, gm1, gm2, gm3,
    ROUND(qraw / (SELECT CAST(SUM(CAST(qraw AS DECIMAL(38,6))) AS DOUBLE)
                  FROM qr$k), 6) AS q
  FROM qr$k),
w$k AS MATERIALIZED (
  SELECT ROUND(w.w0 - 1.0*g.g0, 6) AS w0, ROUND(w.w1 - 1.0*g.g1, 6) AS w1,
    ROUND(w.w2 - 1.0*g.g2, 6) AS w2, ROUND(w.w3 - 1.0*g.g3, 6) AS w3
  FROM w${k - 1} w, (
    SELECT CAST(SUM(CAST(ROUND(q*gm0, 12) AS DECIMAL(38,12))) AS DOUBLE) AS g0,
      CAST(SUM(CAST(ROUND(q*gm1, 12) AS DECIMAL(38,12))) AS DOUBLE) AS g1,
      CAST(SUM(CAST(ROUND(q*gm2, 12) AS DECIMAL(38,12))) AS DOUBLE) AS g2,
      CAST(SUM(CAST(ROUND(q*gm3, 12) AS DECIMAL(38,12))) AS DOUBLE) AS g3
    FROM q$k) g),
r$k AS (
  SELECT CAST($k AS BIGINT) AS iter, q.grp AS domain, q.n, q.ml AS mean_loss,
    q.acc AS accuracy, q.q, w.w0, w.w1, w.w2, w.w3
  FROM q$k q, w$k w)"""
    }.mkString(",\n")
    raw"""fg AS MATERIALIZED (
  SELECT grp,
    ROUND(LEAST(CAST(ws_tokens AS DOUBLE)/100.0, 1.0), 6) AS x1,
    ROUND(CAST(punct AS DOUBLE)/n_chars, 6) AS x2,
    ROUND(CAST(stop_hits AS DOUBLE)/ws_tokens, 6) AS x3,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM (
    SELECT $grpSql AS grp, lang, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '${graft.functions.TextFunctions.PunctPattern}')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) i
  WHERE n_chars > 0 AND ws_tokens > 0),
q0 AS (
  SELECT grp, ROUND(1.0 / (SELECT COUNT(DISTINCT grp) FROM fg), 6) AS q
  FROM (SELECT DISTINCT grp FROM fg)),
w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
  CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
$steps"""
  }

  /** E165 deterministic JL projection twin (r11): the identical sha256
    * sign matrix regenerated in SQL, the identical left-to-right fold
    * (list_reduce; Spark's fold starts 0.0 + x₁ = x₁), 1/√16 scale. */
  val embeddingProject: String =
    """WITH s AS (
  SELECT j, list(CASE WHEN substr(sha256('jl:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1) < '8' THEN 1.0 ELSE -1.0 END ORDER BY i) AS sv
  FROM range(64) t1(i) CROSS JOIN range(16) t2(j) GROUP BY j)
SELECT vec_id, CAST(j AS BIGINT) AS dim,
  ROUND(list_reduce(list_transform(list_zip(embedding, sv), z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b) / 4.0, 6) AS value
FROM embeddings CROSS JOIN s
ORDER BY vec_id, dim"""

  /** E166 UniMax waterfilling twin (r11): the driver recursion replayed
    * as a recursive CTE — visit domains by (count asc, domain asc), each
    * takes min(count, remaining // domains_left), integer end-to-end. */
  val unimaxMix: String =
    """WITH RECURSIVE d AS (
  SELECT lang AS domain, CAST(COUNT(*) AS BIGINT) AS c,
    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*), lang) AS BIGINT) AS rn,
    CAST(COUNT(*) OVER () AS BIGINT) AS k
  FROM documents WHERE lang IS NOT NULL GROUP BY lang),
w AS (
  SELECT CAST(0 AS BIGINT) AS rn, CAST(400 AS BIGINT) AS remaining,
    CAST(NULL AS VARCHAR) AS domain, CAST(NULL AS BIGINT) AS c,
    CAST(NULL AS BIGINT) AS allocated
  UNION ALL
  SELECT d.rn,
    w.remaining - LEAST(d.c, w.remaining // (d.k - d.rn + 1)),
    d.domain, d.c, LEAST(d.c, w.remaining // (d.k - d.rn + 1))
  FROM w JOIN d ON d.rn = w.rn + 1)
SELECT domain, c AS n_docs, allocated, (allocated = c) AS saturated
FROM w WHERE rn > 0 ORDER BY domain"""

  /** E167 path templating twin (r11): per-(depth, segment) support,
    * generalize below-threshold segments to '*', census the templates. */
  val pathTemplates: String =
    """WITH uu AS (
  SELECT doc_id AS id,
    '/' || source || '/' || lang || '/b' || CAST(doc_id % 50 AS VARCHAR) || '/page-' || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
sp AS (SELECT id, string_split(regexp_replace(url, '^/', ''), '/') AS parts FROM uu),
s AS (SELECT id, unnest(parts) AS seg, unnest(range(1, len(parts) + 1)) AS pos FROM sp),
k AS (SELECT pos, seg FROM s GROUP BY pos, seg HAVING COUNT(*) >= 20),
g AS (
  SELECT s.id, s.pos,
    CASE WHEN k.seg IS NOT NULL THEN s.seg ELSE '*' END AS gs
  FROM s LEFT JOIN k ON s.pos = k.pos AND s.seg = k.seg),
t2 AS (SELECT id, '/' || string_agg(gs, '/' ORDER BY pos) AS template FROM g GROUP BY id)
SELECT template, CAST(COUNT(*) AS BIGINT) AS n_urls
FROM t2 GROUP BY template ORDER BY n_urls DESC, template"""

  /** E168 hard-negative mining twin (r11): brute-force cosine with the
    * label-inequality predicate before the per-query top-k. */
  val hardNegatives: String =
    s"""WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 97 = 0 AND label IS NOT NULL)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos FROM (
  SELECT q.vec_id AS query_id, q.label AS query_label,
    e.vec_id AS neighbor_id, e.label AS neighbor_label,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM q CROSS JOIN embeddings e
  WHERE e.label IS NOT NULL AND e.label <> q.label) t
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
ORDER BY query_id, neighbor_id"""

  /** E204 ANN hard-negative twin: the ivf_topk cell structure over the
    * LABELED corpus (nulls out before assignment), rank-≤2 probe list,
    * label-inequality cut BEFORE the per-query top-10 heap — the whole
    * deterministic pipeline replayed, so the ANN form carries a FULL
    * hash oracle unlike typical path-dependent ANN. */
  val hardNegativesAnn: String =
    s"""WITH el AS (SELECT vec_id, embedding, label FROM embeddings WHERE label IS NOT NULL),
c AS (SELECT vec_id AS centroid_id, embedding FROM el WHERE vec_id % 83 = 0),
a AS (SELECT vec_id AS neighbor_id, centroid_id FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM el e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
q AS (SELECT vec_id AS query_id, embedding, label AS query_label FROM el WHERE vec_id % 97 = 0),
p AS (SELECT query_id, centroid_id FROM (
  SELECT q.query_id, c.centroid_id,
    ROUND(${listDot("q.embedding", "c.embedding")} / (${listNorm("q.embedding")} * ${listNorm("c.embedding")}), 6) AS qcos
  FROM q CROSS JOIN c
  WHERE ${listNorm("q.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY qcos DESC, centroid_id) <= 2),
s AS (SELECT p.query_id, q.query_label, a.neighbor_id, e.label AS neighbor_label,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM p JOIN a USING (centroid_id)
  JOIN el e ON e.vec_id = a.neighbor_id
  JOIN q ON q.query_id = p.query_id
  WHERE e.label <> q.query_label
    AND ${listNorm("q.embedding")} * ${listNorm("e.embedding")} > 0)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
ORDER BY query_id, neighbor_id"""

  /** E204 audit: the planted-twin capture guarantee, label disjointness
    * and exact cosine recompute — engine-side booleans, all-true. */
  val hardNegativesAnnAudit: String = allTrue(Seq(
    "cos_exact_recompute", "labels_disjoint", "planted_twin_caught"))

  /** E119/E126 approximate event-stat audits (r11): scalars must equal
    * the exact one-pass recount; each KLL quantile's exact rank interval
    * must overlap [p−3ε, p+3ε]. */
  val interarrivalStatsAudit: String = allTrue(Seq(
    "p25", "p50", "p75", "p95", "scalars"))
  val sessionStatsAudit: String = allTrue(Seq("p50", "p90", "scalars"))

  /** E102 approximate time-to-convert audit (r11): per transition, the
    * converter count must equal the exact count and each grouped-KLL
    * quantile must satisfy the 3ε rank interval. */
  val timeToConvertAudit: String =
    "SELECT * FROM (VALUES ('signup->view', true, true, true), " +
      "('view->purchase', true, true, true)) " +
      "AS t(transition, n_ok, p50_ok, p90_ok) ORDER BY transition"

  /** E103 approximate-Spearman audit (r8): the KLL-CDF rank path must
    * land within 0.02 of the exact global-order-window twin on both a
    * correlated and a near-independent pair, with identical
    * complete-case counts. */
  val spearmanAudit: String = allTrue(Seq(
    "counts_match", "independent_within_bound", "monotone_near_one",
    "monotone_within_bound", "rho_in_unit", "ties_within_bound"))

  /** E82 approximate grouped-quantiles audit (r8): the per-group KLL
    * battery must satisfy the per-(group, p) rank bound against the
    * data, carry the exact twin's group/count relation, and be monotone
    * in p within every group. */
  val groupedQuantilesAudit: String = allTrue(Seq(
    "all_quantiles_within_rank_bound", "groups_and_counts_match_exact",
    "monotone_within_group"))

  /** Misra-Gries guarantees (E91) as an all-true golden oracle — the
    * estimates themselves are partitioning-dependent (no hash oracle,
    * like ApproxCountDistinct), the guarantees are exact. */
  val heavyHittersAudit: String =
    allTrue(Seq("est_subset_of_vocab", "est_never_over",
      "no_missed_heavy_hitter", "undercount_bounded", "total_mass_bounded"))

  val simhashAudit: String = allTrue(Seq("pairs_equal_bruteforce"))

  /** RRF twin (E113): the three rank CTEs under the identical
    * (key DESC NULLS LAST, doc_id ASC) total orders, addends quantized
    * ROUND(·,12)→DECIMAL(38,12) before the sum, fused order on the
    * exact decimal score. */
  lazy val rrfFuse: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH s AS (
  SELECT doc_id,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM (
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) q),
rq AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC NULLS LAST, doc_id ASC) AS rank FROM s),
rl AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY n_chars DESC NULLS LAST, doc_id ASC) AS rank FROM documents),
rt AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY CAST(len($wsToksSql) AS BIGINT) DESC NULLS LAST, doc_id ASC) AS rank FROM documents),
u AS (
  SELECT doc_id, CAST(ROUND(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank), 12) AS DECIMAL(38,12)) AS a FROM rq
  UNION ALL SELECT doc_id, CAST(ROUND(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank), 12) AS DECIMAL(38,12)) FROM rl
  UNION ALL SELECT doc_id, CAST(ROUND(CAST(1.0 AS DOUBLE) / (CAST(60.0 AS DOUBLE) + rank), 12) AS DECIMAL(38,12)) FROM rt),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists, SUM(a) AS sc FROM u GROUP BY 1)
SELECT doc_id AS id, n_lists, ROUND(CAST(sc AS DOUBLE), 6) AS rrf_score
FROM agg ORDER BY sc DESC, doc_id ASC LIMIT 30"""
  }

  /** PMI-collocation twin (E112): same bigram construction as
    * bigramTopK, marginals/total as exact integer sums over the cells
    * relation, identical double algebra (n·c then cx·cy, one divide,
    * LN, round 6) and the same rounded-pmi/bigram-ASC frontier. */
  val collocationsPmi: String =
    s"""WITH pairs AS (
  SELECT w[i] AS x, w[i + 1] AS y
  FROM (SELECT $wsToksLowerSql AS w FROM documents), UNNEST(range(1, len(w))) s(i)),
cells AS (SELECT x, y, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
margx AS (SELECT x, SUM(c) AS cx FROM cells GROUP BY 1),
margy AS (SELECT y, SUM(c) AS cy FROM cells GROUP BY 1),
tot AS (SELECT SUM(c) AS n FROM cells)
SELECT x || ' ' || y AS bigram, CAST(c AS BIGINT) AS freq,
  ROUND(LN(CAST(n AS DOUBLE) * CAST(c AS DOUBLE) /
    (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6) AS pmi
FROM cells JOIN margx USING (x) JOIN margy USING (y) CROSS JOIN tot
WHERE c >= 5
ORDER BY pmi DESC, bigram ASC LIMIT 50"""

  /** Rolling-volume twin (E115): same integer day numbers, RANGE frame,
    * and fixed-order n·days/total double ratio. */
  val rollingDailyVolume: String =
    """WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
r AS (
  SELECT day_num, n_events,
    CAST(SUM(n_events) OVER w AS BIGINT) AS window_events,
    CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
  FROM daily
  WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT STRFTIME(make_timestamp(day_num * 86400000000), '%Y-%m-%d') AS day,
  n_events, window_events, days_in_window,
  ROUND(CAST(n_events AS DOUBLE) * CAST(days_in_window AS DOUBLE) /
    CAST(window_events AS DOUBLE), 6) AS vs_trend
FROM r ORDER BY day"""

  /** Transition-entropy twin (E111): same lag pairs under the identical
    * total order, same ROUND(c·LN(c),12)→DECIMAL(38,12) quantized
    * entropy sum as the F2/E105 contract. */
  val transitionEntropy: String =
    """WITH ordered AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events),
cells AS (SELECT prev_type, event_type AS cur, COUNT(*) AS c
  FROM ordered WHERE prev_type IS NOT NULL GROUP BY 1, 2),
agg AS (SELECT prev_type, CAST(SUM(c) AS BIGINT) AS n_transitions,
  CAST(COUNT(*) AS BIGINT) AS n_next,
  SUM(CAST(ROUND(c * LN(c), 12) AS DECIMAL(38,12))) AS tsum
  FROM cells GROUP BY 1)
SELECT prev_type, n_transitions, n_next,
  ROUND(LN(n_transitions) - CAST(tsum AS DOUBLE) / n_transitions, 6) AS h_next
FROM agg ORDER BY prev_type"""

  /** FD-discovery twin (E110): same explode→cells→per-LHS-best→per-pair
    * cascade, integer g3 algebra to the final rounded double ratio. */
  def functionalDeps(table: String, pairs: Seq[(String, String)]): String = {
    val flat = pairs.zipWithIndex.map { case ((l, r), i) =>
      s"SELECT $i AS pid, CAST($l AS VARCHAR) AS lhs, CAST($r AS VARCHAR) AS rhs FROM $table"
    }.mkString("\n  UNION ALL ")
    val cases = pairs.zipWithIndex
      .map { case ((l, r), i) => s"WHEN $i THEN '$l->$r'" }.mkString(" ")
    s"""WITH flat AS (
  $flat),
cells AS (SELECT pid, lhs, rhs, COUNT(*) AS c FROM flat GROUP BY 1, 2, 3),
per_lhs AS (SELECT pid, lhs, SUM(c) AS lc, MAX(c) AS best FROM cells GROUP BY 1, 2),
agg AS (SELECT pid, CAST(SUM(lc) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_lhs,
  CAST(SUM(best) AS BIGINT) AS n_conforming FROM per_lhs GROUP BY 1)
SELECT CASE pid $cases END AS fd, n_rows, n_lhs,
  n_rows - n_conforming AS violations,
  ROUND(CAST(n_conforming AS DOUBLE) / n_rows, 6) AS fd_ratio
FROM agg ORDER BY fd"""
  }

  /** E109 bound audit: the KLL-sketch D̂ stays within 3× the combined
    * normalized rank error of the exact E98 D, on both a same-distribution
    * and a disjoint-support pair. */
  val ksDriftAudit: String = allTrue(Seq(
    "same_within_3eps", "shift_within_3eps", "d_in_unit",
    "counts_exact", "shift_detected"))

  val deflateAudit: String =
    allTrue(Seq("bounds_hold", "deterministic", "doubling_compresses"))

  val annLshAudit: String =
    allTrue(Seq("cos_exact_recompute", "rank_dominance", "ranks_in_bruteforce"))

  /** E114 approx audit: per numeric column, the sketch median/MAD land
    * at exact rank 0.5±3ε and the CDF-lookup tail counts stay within
    * 3ε·n of exact counts below/above the same fences. */
  val madOutliersAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true, true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, med_rank_ok, mad_rank_ok, below_ok, above_ok) " +
      "ORDER BY instance"
  }

  /** E96 approx audit: sketch quartiles at exact rank 0.25/0.75 ± 3ε,
    * CDF-lookup tail counts within 3ε·n of exact at the same fences. */
  val iqrOutliersAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true, true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, q1_rank_ok, q3_rank_ok, below_ok, above_ok) " +
      "ORDER BY instance"
  }

  /** Parquet-layout audit: per table, Σ footer rows == the engine's own
    * COUNT(*) and the file/row-group structure is sane. */
  val parquetLayoutAudit: String = {
    val rows = AllTables.sorted.map(t => s"('$t', true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(\"table\", rows_match, layout_sane) ORDER BY \"table\""
  }

  /** Z-order audit: single-sort is sharp on its column / blind on the
    * other; the Morton layout bounds both and ≥halves the blind one. */
  val zorderAudit: String =
    "SELECT true AS linear_sharp_on_a, true AS linear_blind_on_b, " +
      "true AS zorder_improves_b, true AS zorder_bounds_both"

  /** Z-order PRUNE audit (r10): identical filter results, strictly
    * fewer candidate row groups under z-order, at-most-half read, span
    * arithmetic sane. */
  val zorderPruneAudit: String =
    "SELECT true AS results_equal, true AS zorder_skips_more, " +
      "true AS zorder_prunes_half, true AS bounds_sane"

  /** 3-dim z-order audit (r10): single sort blind on both non-sort
    * columns; the 3-dim curve bounds and improves all three. */
  val zorder3Audit: String =
    "SELECT true AS linear_blind_on_others, " +
      "true AS zorder_bounds_all_three, true AS zorder_improves_others"

  /** Compaction-plan audit: full coverage, one bin for the staged
    * fragmented layout, no overfill, run-to-run determinism. */
  val compactionAudit: String =
    "SELECT true AS coverage, true AS single_bin, " +
      "true AS fill_ok, true AS deterministic"

  /** Compaction-EXECUTE audit (r10): one merged file per bin, per-bin
    * and total row preservation, byte tolerance, keep files never
    * rewritten, source layout byte-identical. */
  val compactionExecuteAudit: String =
    "SELECT true AS one_file_per_bin, true AS rows_preserved, " +
      "true AS bytes_sane, true AS keep_untouched, " +
      "true AS source_untouched"

  /** E70 approx audit: each sketch clip bound at its target rank ± 3ε. */
  val winsorizedStatsAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, lo_rank_ok, hi_rank_ok) ORDER BY instance"
  }

  /** KLL rank-interval audit rows mirror approxErrorAudit' shape: one
    * boolean per (numeric column, quantile). */
  val kllRankAudit: String = {
    val rows = Lineitem.numeric.flatMap(c =>
      (1 to 10).map(i => s"('$c', 'ApproxQuantiles-${i / 10.0}', true)"))
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) AS t(instance, name, within_bound) " +
      "ORDER BY instance, name"
  }

  val sinkRoundtripAudit: String =
    allTrue(Seq("partition_values", "row_count", "rows_roundtrip"))

  val bucketJoinAudit: String =
    allTrue(Seq("equals_plain_join", "no_exchange_in_plan"))

  val saltedJoinAudit: String = allTrue(Seq("equals_plain_join"))

  /** E118 timestamp-profile twin: one aggregate pass over epoch_us(ts);
    * calendar fields via the same integer `// 86400000000` day algebra
    * and strftime rendering as the daily suite. */
  val tsProfile: String =
    """WITH e AS (SELECT epoch_us(ts) AS us FROM events),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(COUNT(us) AS BIGINT) AS n_present,
  MIN(us) AS min_us, MAX(us) AS max_us,
  CAST(COUNT(DISTINCT us) AS BIGINT) AS n_distinct,
  CAST(COUNT(DISTINCT us // 86400000000) AS BIGINT) AS n_days FROM e)
SELECT n_rows, n_present,
  ROUND(CAST(n_present AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS completeness,
  min_us, max_us, n_distinct, n_days,
  CAST((max_us // 86400000000) - (min_us // 86400000000) + 1 AS BIGINT) AS span_days,
  STRFTIME(make_timestamp(min_us), '%Y-%m-%d') AS min_day,
  STRFTIME(make_timestamp(max_us), '%Y-%m-%d') AS max_day
FROM a"""

  /** E119 inter-arrival twin: identical per-user lag under the
    * (ts_us, event_id) total order, integer gap sums, the proven
    * QUANTILE_CONT ↔ percentile contract, µs→s via one double division
    * chain mirrored from the Spark select. */
  val interarrivalStats: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
g AS (SELECT user_id,
  ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap_us FROM e)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
  ROUND(CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS mean_gap_s,
  ROUND(CAST(QUANTILE_CONT(CAST(gap_us AS DOUBLE), 0.25) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p25_s,
  ROUND(CAST(QUANTILE_CONT(CAST(gap_us AS DOUBLE), 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p50_s,
  ROUND(CAST(QUANTILE_CONT(CAST(gap_us AS DOUBLE), 0.75) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p75_s,
  ROUND(CAST(QUANTILE_CONT(CAST(gap_us AS DOUBLE), 0.95) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p95_s
FROM g WHERE gap_us IS NOT NULL"""

  /** E120 hour-of-week twin: pure integer epoch algebra — weekday
    * (day_num + 4) mod 7 with 0 = Sunday, hour (us // 3600000000) mod
    * 24 — no timezone, no locale. */
  val hourlyActivity: String =
    """WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events)
SELECT CAST(((us // 86400000000) + 4) % 7 AS BIGINT) AS dow,
  CAST((us // 3600000000) % 24 AS BIGINT) AS hour,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1, 2 ORDER BY dow, hour"""

  /** E121 CUSUM twin: deviations quantized ROUND(·,6)→DECIMAL(38,6)
    * BEFORE the running sum (exact prefixes, engine-portable), extremum
    * flag compared on the exact decimal. */
  val volumeCusum: String =
    """WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS day_num, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
s AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nd FROM d),
c AS (
  SELECT day_num, n_events,
    SUM(CAST(ROUND(CAST(n_events AS DOUBLE) - CAST(tot AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS DECIMAL(38,6)))
      OVER (ORDER BY day_num ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM d, s),
p AS (SELECT MAX(ABS(cusum)) AS peak FROM c)
SELECT STRFTIME(make_timestamp(day_num * 86400000000), '%Y-%m-%d') AS day,
  n_events, ROUND(CAST(cusum AS DOUBLE), 6) AS cusum,
  CAST(ABS(cusum) = peak AS INT) AS is_changepoint
FROM c, p ORDER BY day"""

  /** E126 session-stats twin: the sessionize CTE chain reduced to one
    * row; exact duration quantiles under the proven contract. */
  val sessionStats: String =
    """WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events),
flagged AS (
  SELECT user_id, ts_us, event_id, event_type,
    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM ordered),
numbered AS (
  SELECT user_id, ts_us, event_type,
    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM flagged),
sess AS (
  SELECT user_id, session_idx,
    MAX(ts_us) - MIN(ts_us) AS duration_us,
    CAST(COUNT(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_event,
  ROUND(CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_events,
  ROUND(CAST(SUM(duration_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS mean_duration_s,
  ROUND(CAST(QUANTILE_CONT(CAST(duration_us AS DOUBLE), 0.5) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p50_duration_s,
  ROUND(CAST(QUANTILE_CONT(CAST(duration_us AS DOUBLE), 0.9) AS DOUBLE) / CAST(1000000 AS DOUBLE), 6) AS p90_duration_s
FROM sess"""

  /** E122 association-rules twin: distinct (user, type) basket relation,
    * undirected pair counts emitted in both directions, fixed-order
    * double ratio algebra (c·n / (c_a·c_b), each factor cast once). */
  val assocRules: String =
    """WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events WHERE event_type IS NOT NULL),
nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n FROM ut),
m AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY 1),
p AS (SELECT a.t AS x, b.t AS y, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2),
d AS (SELECT x AS antecedent, y AS consequent, n_both FROM p
  UNION ALL SELECT y, x, n_both FROM p)
SELECT d.antecedent, d.consequent, d.n_both, ma.c AS n_ante, mc.c AS n_cons,
  ROUND(CAST(d.n_both AS DOUBLE) / CAST(nu.n AS DOUBLE), 6) AS support,
  ROUND(CAST(d.n_both AS DOUBLE) / CAST(ma.c AS DOUBLE), 6) AS confidence,
  ROUND(CAST(d.n_both AS DOUBLE) * CAST(nu.n AS DOUBLE) /
    (CAST(ma.c AS DOUBLE) * CAST(mc.c AS DOUBLE)), 6) AS lift
FROM d JOIN m ma ON d.antecedent = ma.t JOIN m mc ON d.consequent = mc.t, nu
WHERE d.n_both >= 1
ORDER BY antecedent, consequent"""

  /** E123 document-frequency twin: per-doc DISTINCT token sets before
    * the unnest (df counts documents, never instances), broadcast doc
    * total, (df DESC, token ASC) frontier. */
  val docFrequency: String =
    s"""WITH tok AS (SELECT t.x AS token FROM documents, UNNEST(list_distinct($wsToksLowerSql)) t(x)),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY 1)
SELECT token, df,
  ROUND(CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS df_ratio,
  CAST(ROUND(CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) >= CAST(0.4 AS DOUBLE) AS INT) AS is_stopword
FROM f, n ORDER BY df DESC, token ASC LIMIT 50"""

  /** E125 tokenizer-fertility twin: same whitespace + BPE-ish counters
    * as the tokenCount twin, grouped by language; ratios as single late
    * double divisions over exact integer sums. */
  val tokenizerFertility: String =
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len($wsToksSql)) AS BIGINT) AS n_ws_tokens,
  CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS BIGINT) AS n_bpeish_tokens,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
  CAST(SUM(STRLEN(text)) AS BIGINT) AS n_bytes,
  ROUND(CAST(SUM(LENGTH(text)) AS DOUBLE) / CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE), 6) AS chars_per_token,
  ROUND(CAST(SUM(STRLEN(text)) AS DOUBLE) / CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE), 6) AS bytes_per_token,
  ROUND(CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE) / CAST(SUM(len($wsToksSql)) AS DOUBLE), 6) AS fertility_vs_ws
FROM documents GROUP BY lang ORDER BY lang"""

  /** E127 per-type daily burst twin: exact BIGINT count/square sums per
    * type, then the identical fixed-order double mean/σ/z algebra; the
    * burst flag compares the UNROUNDED z like the Spark expression. */
  val typeBurst: String = {
    val mean = "CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE)"
    val varp = s"CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE) - ($mean) * ($mean)"
    val z = s"(CAST(n_events AS DOUBLE) - $mean) / SQRT($varp)"
    s"""WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day_num, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(n_events) AS BIGINT) AS s1,
  CAST(SUM(n_events * n_events) AS BIGINT) AS s2 FROM daily GROUP BY 1)
SELECT daily.event_type,
  STRFTIME(make_timestamp(day_num * 86400000000), '%Y-%m-%d') AS day,
  n_events,
  ROUND($mean, 6) AS mean_daily,
  CASE WHEN $varp > 0 THEN ROUND($z, 6) END AS z,
  CASE WHEN $varp > 0 THEN CAST(ABS($z) >= CAST(2 AS DOUBLE) AS INT) ELSE 0 END AS is_burst
FROM daily JOIN m USING (event_type)
ORDER BY event_type, day"""
  }

  /** E132 user-activity-histogram twin: bucket = bit length of the
    * per-user event count (LENGTH(bin(n)) − 1) — pure integer algebra. */
  val userActivityHistogram: String =
    """WITH pu AS (SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total FROM pu),
h AS (SELECT CAST(LENGTH(bin(n)) - 1 AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(n) AS BIGINT) AS n_events, MIN(n) AS min_events, MAX(n) AS max_events
  FROM pu GROUP BY 1)
SELECT bucket, n_users, n_events, min_events, max_events,
  ROUND(CAST(n_users AS DOUBLE) / CAST(n_users_total AS DOUBLE), 6) AS users_share
FROM h, t ORDER BY bucket"""

  /** E128 containment twin: the jaccard CTE shapes with the intersection
    * relation directed both ways and divided by the SUBSET side's size. */
  val ngramContainment: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
d AS (SELECT id_a AS id_sub, id_b AS id_super, c FROM inter
  UNION ALL SELECT id_b, id_a, c FROM inter)
SELECT id_sub, id_super, c AS n_shared,
  ROUND(CAST(c AS DOUBLE) / CAST(sz.n AS DOUBLE), 6) AS containment
FROM d JOIN sizes sz ON sz.doc_id = id_sub
WHERE ROUND(CAST(c AS DOUBLE) / CAST(sz.n AS DOUBLE), 6) >= CAST(0.5 AS DOUBLE)
ORDER BY id_sub, id_super"""

  /** r8 shared-shingle family rollup twin: each family's full report
    * (the five standalone oracles, verbatim) reduced to its row count
    * and DECIMAL(38,6)-quantized score sum — the order-independent
    * content handle the engine's one-staged-relation run emits. */
  def dedupFamilyRollup(
      containment: String, degrees: String, histogram: String,
      jaccard: String, novelty: String): String = {
    def one(family: String, inner: String, sumExpr: String) =
      s"SELECT '$family' AS family, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"CAST(ROUND(COALESCE($sumExpr, 0), 6) AS DOUBLE) AS check_sum " +
        s"FROM ($inner) t"
    Seq(
      one("containment", containment, "SUM(CAST(containment AS DECIMAL(38,6)))"),
      one("degrees", degrees, "SUM(CAST(degree * n_nodes AS DECIMAL(38,6)))"),
      one("histogram", histogram, "SUM(CAST(n_pairs AS DECIMAL(38,6)))"),
      one("jaccard", jaccard, "SUM(CAST(jaccard AS DECIMAL(38,6)))"),
      one("novelty", novelty, "SUM(CAST(novelty AS DECIMAL(38,6)))"))
      .map(s => s"($s)")
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY family")
  }

  /** E129 novelty twin: the shared distinct-shingle relation joined to
    * its own corpus document frequency; unique = df 1. */
  val ngramNovelty: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
freq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1)
SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
  CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS BIGINT) AS n_unique,
  ROUND(CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM sh JOIN freq ON sh.s = freq.s GROUP BY 1 ORDER BY doc_id"""

  /** E130 per-dimension embedding twin: 1-indexed list subscripts over a
    * 0-based range (UNNEST WITH ORDINALITY is unavailable), float→double
    * widening exact, means on the DECIMAL(38,12) addend contract. */
  val embeddingDimStats: String =
    """WITH v AS (
  SELECT i AS dim, CAST(e[i + 1] AS DOUBLE) AS x
  FROM (SELECT embedding AS e FROM embeddings) q, UNNEST(range(len(e))) t(i))
SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(x), 6) AS mean,
  ROUND(MIN(x), 6) AS min_x,
  ROUND(MAX(x), 6) AS max_x,
  CAST(COUNT(CASE WHEN x = 0 THEN 1 END) AS BIGINT) AS n_zero
FROM v GROUP BY dim ORDER BY dim"""

  /** E131 score-percentile twin: the textQuality score expression
    * verbatim, then the built-in PERCENT_RANK — whose (rank−1)/(n−1)
    * RANK-ties definition is exactly the distinct-score-histogram
    * formulation the Spark side computes without a global window. */
  val scorePercentile: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
q AS (
  SELECT doc_id,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM b),
s AS (SELECT doc_id, score FROM q WHERE score IS NOT NULL)
SELECT doc_id, score, ROUND(PERCENT_RANK() OVER (ORDER BY score), 6) AS percentile
FROM s ORDER BY doc_id"""
  }

  /** E133 join-cardinality twin: per-side (key, count) relations, exact
    * BIGINT fan-out algebra, the identical relationship CASE. */
  val joinCardinality: String =
    """WITH l AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
r AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS matched_keys,
  CAST(COALESCE(SUM(CAST(l.c AS DECIMAL(38,0)) * r.c), 0) AS DOUBLE) AS est_join_rows,
  CAST(COALESCE(MAX(l.c), 0) AS BIGINT) AS max_fanout_left,
  CAST(COALESCE(MAX(r.c), 0) AS BIGINT) AS max_fanout_right
  FROM l JOIN r ON l.k = r.k),
lt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM lineitem),
rt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM orders),
dl AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_left FROM l),
dr AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_right FROM r)
SELECT n_left, n_right, d_left, d_right, matched_keys, est_join_rows,
  max_fanout_left, max_fanout_right,
  CASE WHEN matched_keys = 0 THEN 'disjoint'
    WHEN max_fanout_left = 1 AND max_fanout_right = 1 THEN '1:1'
    WHEN max_fanout_left = 1 THEN '1:N'
    WHEN max_fanout_right = 1 THEN 'N:1'
    ELSE 'M:N' END AS relationship
FROM m, lt, rt, dl, dr"""

  /** E134 declared-vs-detected confusion twin: the langId argmax inlined
    * (the mixtureStats pattern), cells + per-declared window share. */
  val langAgreement: String = {
    val scores = Stopwords.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${stopList(ws)}, t))) AS s_$l"
    }.mkString(", ")
    val cases = Stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    val greatest = Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""WITH det AS (
  SELECT declared, CASE $cases ELSE 'und' END AS detected FROM (
    SELECT declared, ${Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")}, GREATEST($greatest) AS m FROM (
      SELECT lang AS declared, $scores FROM (SELECT lang, $wsToksLowerSql AS toks FROM documents) a) b) c),
cells AS (SELECT declared, detected, CAST(COUNT(*) AS BIGINT) AS n_docs FROM det GROUP BY 1, 2),
tot AS (SELECT declared, CAST(SUM(n_docs) AS BIGINT) AS n_declared FROM cells GROUP BY 1)
SELECT cells.declared, detected, n_docs,
  ROUND(CAST(n_docs AS DOUBLE) / CAST(n_declared AS DOUBLE), 6) AS share_of_declared,
  CAST(cells.declared = detected AS INT) AS is_match
FROM cells JOIN tot ON cells.declared = tot.declared
ORDER BY cells.declared, detected"""
  }

  /** E135 threshold-sweep twin: the jaccard pair algebra at the 0.1
    * floor, collapsed to floor(10·J) bands. */
  val jaccardHistogram: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jp AS (SELECT ROUND(CAST(c AS DOUBLE) / CAST(na.n + nb.n - c AS DOUBLE), 6) AS j
  FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b)
SELECT CAST(FLOOR(j * 10) AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(MIN(j), 6) AS min_jaccard, ROUND(MAX(j), 6) AS max_jaccard
FROM jp WHERE j >= CAST(0.1 AS DOUBLE) GROUP BY 1 ORDER BY bucket"""

  /** E136 table-digest twin: per-column sha256 with the E1 null
    * sentinel, '|'-joined, row digest = first 15 sha256 hex chars as a
    * 60-bit BIGINT, XOR-reduced. */
  val tableDigest: String = {
    def digestOf(table: String, cols: Seq[String]): String = {
      val enc = cols
        .map(c => s"COALESCE(sha256(CAST($c AS VARCHAR)), 'null')")
        .mkString(" || '|' || ")
      s"SELECT '$table' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        s"COALESCE(bit_xor(('0x' || substr(sha256($enc), 1, 15))::BIGINT), 0) AS digest " +
        s"FROM $table"
    }
    Seq(
      digestOf("region", Seq("r_regionkey", "r_name")),
      digestOf("nation", Seq("n_nationkey", "n_name", "n_regionkey")),
      digestOf("customer",
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")))
      .mkString("", " UNION ALL ", " ORDER BY tbl")
  }

  /** E137 JSON key-inventory twin: json_keys unnest + broadcast row
    * total (props is non-null valid JSON in this corpus; the Spark
    * side's '<invalid>' sentinel has nothing to mark). */
  val propsKeyProfile: String =
    """WITH ks AS (SELECT unnest(json_keys(props)) AS key FROM events WHERE props IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present, n_rows,
  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS share
FROM ks, t GROUP BY key, n_rows ORDER BY key"""

  /** E138 normalized-dedup twin: the identical canonicalization chain
    * (lower → \s+ collapse with the 'g' flag → trim), grouped by the
    * normalized text itself (≡ grouping by its sha256). */
  val dedupNormalized: String =
    raw"""WITH n AS (SELECT doc_id, text,
  COALESCE(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 'null') AS nt
  FROM documents)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count,
  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw_variants
FROM n GROUP BY nt ORDER BY doc_id"""

  /** E139 decile-report twin: the scorePercentile expression feeding
    * min(⌊10·pr⌋, 9) bands with token weights joined by doc id. */
  val qualityDeciles: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
q AS (
  SELECT doc_id, ws_tokens,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM b),
p AS (
  SELECT doc_id, ws_tokens, score,
    ROUND(PERCENT_RANK() OVER (ORDER BY score), 6) AS pr
  FROM q WHERE score IS NOT NULL)
SELECT CAST(LEAST(FLOOR(pr * 10), 9) AS BIGINT) AS decile,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
  ROUND(MIN(score), 6) AS min_score, ROUND(MAX(score), 6) AS max_score
FROM p GROUP BY 1 ORDER BY decile"""
  }

  /** E140 stream-static-enrich twin: the batch equivalent of the
    * broadcast dimension join (alphabetical dense type ranks). */
  val streamingEnrich: String =
    """WITH d AS (
  SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS type_rank
  FROM (SELECT DISTINCT event_type FROM events) q)
SELECT event_id, e.event_type, type_rank
FROM events e JOIN d USING (event_type) ORDER BY event_id"""

  val partitionPruningAudit: String = allTrue(Seq(
    "multiple_partitions", "partition_filter_in_plan", "pruned_rows_match"))

  val bloomMembershipAudit: String = allTrue(Seq(
    "fpr_bounded", "no_false_negatives", "prefilter_shrinks"))

  val minhashMergeAudit: String = allTrue(Seq(
    "docs_preserved", "merge_equals_whole", "partition_independent"))

  val schemaEvolutionAudit: String = allTrue(Seq(
    "new_values_intact", "old_rows_null_new_col", "rows_preserved",
    "schema_is_superset"))

  /** E142 quality-weighted-sample twin: the sampleBucket hash against
    * round(score·10⁴) — the exact keep decision replayed. */
  val qualityWeightedSample: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
q AS (
  SELECT doc_id,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM b)
SELECT doc_id, score FROM q
WHERE score IS NOT NULL AND $sampleBucket < LEAST(GREATEST(CAST(ROUND(score * 10000) AS BIGINT), 0), 10000)
ORDER BY doc_id"""
  }

  /** E143 cluster-balance twin: the knnAssign cells reduced to the
    * quantized-entropy report; h and exp(h) from the same expression. */
  val clusterBalance: String = {
    val hExpr = "LN(CAST(n_assigned AS DOUBLE)) - CAST(tsum AS DOUBLE) / CAST(n_assigned AS DOUBLE)"
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
s AS (SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0),
a AS (SELECT vec_id, centroid_id FROM s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
cells AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS c FROM a GROUP BY 1),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters, CAST(SUM(c) AS BIGINT) AS n_assigned,
  MAX(c) AS max_cluster,
  SUM(CAST(ROUND(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)), 12) AS DECIMAL(38,12))) AS tsum
  FROM cells)
SELECT n_clusters, n_assigned, max_cluster,
  ROUND($hExpr, 6) AS entropy,
  ROUND(EXP($hExpr), 6) AS effective_clusters,
  ROUND(CAST(max_cluster AS DOUBLE) / CAST(n_assigned AS DOUBLE), 6) AS max_share
FROM g"""
  }

  /** E144 HTML-strip twin: identical deterministic render (the piiScan
    * precedent), identical tag → space → collapse → trim chain with the
    * 'g' flag. */
  val htmlStrip: String =
    raw"""WITH r AS (SELECT doc_id,
  '<html><body class="doc"><p>' || text || '</p><br/><div>footer ' || CAST(doc_id AS VARCHAR) || '</div></body></html>' AS t
  FROM documents),
c AS (SELECT doc_id, t,
  trim(regexp_replace(regexp_replace(t, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean
  FROM r)
SELECT doc_id, CAST(LENGTH(t) AS BIGINT) AS n_raw,
  CAST(LENGTH(clean) AS BIGINT) AS n_clean,
  substr(sha256(clean), 1, 16) AS clean_sha
FROM c ORDER BY doc_id"""

  /** E145 sentence-stats twin: non-blank runs between [.!?]+, exact
    * integer length sums, one late double division. */
  val sentenceStats: String =
    raw"""WITH s AS (SELECT doc_id,
  list_filter(string_split_regex(text, '[.!?]+'), x -> trim(x) <> '') AS sents
  FROM documents)
SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
  CASE WHEN len(sents) > 0 THEN
    ROUND(CAST(list_reduce(list_transform(sents, x -> CAST(LENGTH(trim(x)) AS BIGINT)), (a, b) -> a + b) AS DOUBLE) / CAST(len(sents) AS DOUBLE), 6)
  END AS mean_sentence_chars
FROM s ORDER BY doc_id"""

  /** E146 char-class twin: the same per-class regexp counters summed as
    * exact BIGINTs per language, other = remainder. */
  val charClassStats: String = {
    def cnt(p: String): String =
      s"CAST(SUM(COALESCE(len(regexp_extract_all(text, '$p')), 0)) AS BIGINT)"
    raw"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(COALESCE(LENGTH(text), 0)) AS BIGINT) AS n_chars,
  ${cnt("[A-Za-z]")} AS n_alpha,
  ${cnt("[0-9]")} AS n_digit,
  ${cnt(raw"\s")} AS n_space,
  ${cnt(PunctPattern)} AS n_punct,
  CAST(SUM(COALESCE(LENGTH(text), 0)) AS BIGINT) - ${cnt("[A-Za-z]")} - ${cnt("[0-9]")} - ${cnt(raw"\s")} - ${cnt(PunctPattern)} AS n_other,
  ROUND(CAST(${cnt("[A-Za-z]")} AS DOUBLE) / CAST(SUM(COALESCE(LENGTH(text), 0)) AS DOUBLE), 6) AS alpha_ratio,
  ROUND(CAST(CAST(SUM(COALESCE(LENGTH(text), 0)) AS BIGINT) - ${cnt("[A-Za-z]")} - ${cnt("[0-9]")} - ${cnt(raw"\s")} - ${cnt(PunctPattern)} AS DOUBLE) / CAST(SUM(COALESCE(LENGTH(text), 0)) AS DOUBLE), 6) AS other_ratio
FROM documents GROUP BY lang ORDER BY lang"""
  }

  /** E147 degree-histogram twin: the jaccard pair CTEs reduced twice
    * (pairs → per-node degree → histogram). */
  val dupGraphDegrees: String =
    s"""WITH $jaccardCtes,
d AS (SELECT id_a AS id FROM jpairs UNION ALL SELECT id_b FROM jpairs),
deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM d GROUP BY 1)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1 ORDER BY degree"""

  /** E148 effective-dims twin: per-dim decimal sums → fixed-order σ²
    * algebra → re-quantized variance sums → participation ratio. */
  val effectiveDims: String = {
    val mean = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
    val varD = s"CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - ($mean) * ($mean)"
    val pr = "(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) / CAST(sv2 AS DOUBLE)"
    s"""WITH vals AS (
  SELECT i AS dim, CAST(e[i + 1] AS DOUBLE) AS x
  FROM (SELECT embedding AS e FROM embeddings) q, UNNEST(range(len(e))) t(i)),
perdim AS (
  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS s1,
    SUM(CAST(ROUND(x * x, 12) AS DECIMAL(38,12))) AS s2
  FROM vals GROUP BY dim),
vrow AS (SELECT CAST(ROUND($varD, 12) AS DECIMAL(38,12)) AS v FROM perdim),
vv AS (SELECT v, CAST(ROUND(CAST(v AS DOUBLE) * CAST(v AS DOUBLE), 12) AS DECIMAL(38,12)) AS v2 FROM vrow),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dims, SUM(v) AS sv, SUM(v2) AS sv2 FROM vv)
SELECT n_dims, ROUND(CAST(sv AS DOUBLE), 6) AS total_variance,
  ROUND($pr, 6) AS effective_dims,
  ROUND($pr / CAST(n_dims AS DOUBLE), 6) AS dim_utilization
FROM g"""
  }

  /** E124 dedup-yield twin: the dedupClusters recursive-CTE components
    * reduced to the cluster-size histogram, corpus total as a broadcast
    * scalar. */
  val dedupYield: String =
    s"""WITH RECURSIVE $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION SELECT id_b, id_a FROM jpairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u),
clusters AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
csizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM clusters GROUP BY 1),
h AS (SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM csizes GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_total FROM documents)
SELECT cluster_size, n_clusters,
  cluster_size * n_clusters AS n_docs,
  (cluster_size - 1) * n_clusters AS n_removed, n_docs_total
FROM h, t ORDER BY cluster_size"""

  /** CCNet-bucket twin (E171): the langId argmax + textQuality score
    * (both expression-identical to their standalone oracles), the
    * per-language DISTINCT-score histogram with the strictly-better
    * running mass (DESC window, one row back), and the integer tertile
    * comparison `3·n_above < k·n_lang` — no float at the cut. */
  /** Shared CTE chain for the CCNet-bucket twins (E171/E187): the langId
    * argmax + textQuality score, the per-language DISTINCT-score
    * histogram, the strictly-better running mass. */
  private lazy val ccnetBucketsCtes: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    val scores = Stopwords.map { case (l, ws) =>
      s"len(list_filter(toks, t -> list_contains(${stopList(ws)}, t))) AS s_$l"
    }.mkString(", ")
    val cases = Stopwords.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    val greatest = Stopwords.map { case (l, _) => s"s_$l" }.mkString(", ")
    s"""base AS (
  SELECT doc_id, $wsToksLowerSql AS toks,
    CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
sc AS (SELECT doc_id, n_chars, ws_tokens, punct, stop_hits, $scores FROM base),
s AS (SELECT doc_id, lang, score FROM (
  SELECT doc_id, CASE $cases ELSE 'und' END AS lang,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM (SELECT *, GREATEST($greatest) AS m FROM sc) g) q
  WHERE score IS NOT NULL),
h AS (SELECT lang, score, COUNT(*) AS c FROM s GROUP BY 1, 2),
r AS (SELECT lang, score,
    COALESCE(SUM(c) OVER (PARTITION BY lang ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_above,
    SUM(c) OVER (PARTITION BY lang) AS n_lang
  FROM h)"""
  }

  lazy val ccnetBuckets: String =
    s"""WITH $ccnetBucketsCtes
SELECT s.doc_id, s.lang, s.score,
  CASE WHEN n_above * 3 < n_lang THEN 'head'
       WHEN n_above * 3 < n_lang * 2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM s JOIN r ON r.lang = s.lang AND r.score = s.score
ORDER BY s.doc_id"""

  /** CCNet-selection-executor twin (E187): the bucket CTEs verbatim,
    * tail dropped (documents with no score carry no bucket and are
    * dropped too — the E46 null-score convention), the kept corpus
    * sha256-pinned with its char length. */
  lazy val ccnetSelect: String =
    s"""WITH $ccnetBucketsCtes,
b AS (SELECT s.doc_id, s.lang, s.score,
    CASE WHEN n_above * 3 < n_lang THEN 'head'
         WHEN n_above * 3 < n_lang * 2 THEN 'middle'
         ELSE 'tail' END AS bucket
  FROM s JOIN r ON r.lang = s.lang AND r.score = s.score)
SELECT b.doc_id, b.lang, b.score, b.bucket,
  sha256(d.text) AS text_sha, CAST(LENGTH(d.text) AS BIGINT) AS n_chars
FROM b JOIN documents d ON d.doc_id = b.doc_id
WHERE b.bucket IN ('head', 'middle') ORDER BY b.doc_id"""

  /** Dup-graph PageRank twin (E173): the jaccard pair CTEs verbatim,
    * symmetric edges, eight chained damped iterations on the same
    * decimal-term contract — contributions ROUND(r/deg, 12) summed as
    * DECIMAL(38,12), updates ROUND((1−0.85)/N + 0.85·Σ, 12). */
  lazy val dupPagerank: String = {
    val iters = (1 to 8).map { k =>
      s"""r$k AS (SELECT e.v AS id, ROUND((1 - 0.85) / (SELECT n FROM nn) + 0.85 * CAST(SUM(CAST(ROUND(r.rank / d.deg, 12) AS DECIMAL(38,12))) AS DOUBLE), 12) AS rank
  FROM edges e JOIN r${k - 1} r ON r.id = e.u JOIN deg d ON d.u = e.u
  GROUP BY e.v)"""
    }.mkString(",\n")
    s"""WITH $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION ALL SELECT id_b, id_a FROM jpairs),
deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
r0 AS (SELECT u AS id, ROUND(1.0 / (SELECT n FROM nn), 12) AS rank FROM deg),
$iters
SELECT d.u AS doc_id, r.rank, CAST(d.deg AS BIGINT) AS degree
FROM r8 r JOIN deg d ON d.u = r.id ORDER BY doc_id"""
  }

  /** Interpolated-trigram twin (E174): tri/bi/unigram counts from the
    * positional token relation, the identical fixed-order interpolation
    * `0.6·p₃ + 0.3·p₂ + 0.1·p₁` over BIGINT counts, ROUND(LN·,12) →
    * DECIMAL(38,12) per-doc sums (the bigramLm contract). */
  val trigramLm: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM words),
big AS (SELECT a.doc_id, a.t AS b1, b.t AS b2 FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
tri AS (SELECT a.doc_id, a.t AS w1, b.t AS w2, c.t AS w3
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
tc AS (SELECT w1, w2, w3, COUNT(*) AS ct FROM tri GROUP BY 1, 2, 3),
bc AS (SELECT b1, b2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
uc AS (SELECT t, COUNT(*) AS cu FROM tok GROUP BY 1),
tot AS (SELECT COUNT(*) AS tt, COUNT(DISTINCT t) AS v FROM tok),
lp AS (SELECT tri.doc_id, CAST(ROUND(LN(
    0.6 * (CAST(tc.ct + 1 AS DOUBLE) / CAST(cb12.cb + v AS DOUBLE)) +
    0.3 * (CAST(cb23.cb + 1 AS DOUBLE) / CAST(cu2.cu + v AS DOUBLE)) +
    0.1 * (CAST(cu3.cu + 1 AS DOUBLE) / CAST(tt + v AS DOUBLE))), 12) AS DECIMAL(38,12)) AS lp
  FROM tri JOIN tc USING (w1, w2, w3)
    JOIN bc cb12 ON cb12.b1 = tri.w1 AND cb12.b2 = tri.w2
    JOIN bc cb23 ON cb23.b1 = tri.w2 AND cb23.b2 = tri.w3
    JOIN uc cu2 ON cu2.t = tri.w2
    JOIN uc cu3 ON cu3.t = tri.w3, tot),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams, SUM(lp) AS slp FROM lp GROUP BY 1)
SELECT doc_id, n_trigrams,
  ROUND(CAST(slp AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6) AS avg_logprob,
  ROUND(EXP(-(CAST(slp AS DOUBLE) / CAST(n_trigrams AS DOUBLE))), 6) AS perplexity
FROM agg ORDER BY doc_id"""

  /** Gopher-rule twin (E192): the same whitespace/line/regex primitives,
    * every rule cut replayed as the SAME integer comparison (no float at
    * any boundary), ratios 6-dp readout only. */
  lazy val gopherRules: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    raw"""WITH base AS (SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w,
    string_split(text, chr(10)) AS ls,
    CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS n_symbols
  FROM documents),
m AS (SELECT doc_id, n_symbols,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(COALESCE(list_sum(list_transform(w, t -> LENGTH(t))), 0) AS BIGINT) AS sum_word_len,
    CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_words,
    CAST(len(list_filter(w, t -> list_contains($en, t))) AS BIGINT) AS stop_hits,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(list_filter(ls, l -> starts_with(l, '-') OR starts_with(l, '*') OR starts_with(l, '•'))) AS BIGINT) AS bullet_lines,
    CAST(len(list_filter(ls, l -> ends_with(l, '...') OR ends_with(l, '…'))) AS BIGINT) AS ellipsis_lines
  FROM base)
SELECT doc_id, n_words,
  CASE WHEN n_words > 0 THEN ROUND(CAST(sum_word_len AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS mean_word_len,
  CASE WHEN n_words > 0 THEN ROUND(CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS symbol_ratio,
  ROUND(CAST(bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS bullet_line_frac,
  ROUND(CAST(ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS ellipsis_line_frac,
  CASE WHEN n_words > 0 THEN ROUND(CAST(alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE), 6) END AS alpha_word_frac,
  stop_hits,
  (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
  (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words AND n_words > 0) AS ok_mean_word_len,
  (10 * n_symbols <= n_words AND n_words > 0) AS ok_symbol_ratio,
  (10 * bullet_lines <= 9 * n_lines) AS ok_bullet_lines,
  (10 * ellipsis_lines <= 3 * n_lines) AS ok_ellipsis_lines,
  (5 * alpha_words >= 4 * n_words AND n_words > 0) AS ok_alpha_words,
  (stop_hits >= 2) AS ok_stop_hits,
  ((n_words >= 50 AND n_words <= 100000)
    AND (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words AND n_words > 0)
    AND (10 * n_symbols <= n_words AND n_words > 0)
    AND (10 * bullet_lines <= 9 * n_lines)
    AND (10 * ellipsis_lines <= 3 * n_lines)
    AND (5 * alpha_words >= 4 * n_words AND n_words > 0)
    AND (stop_hits >= 2)) AS keep
FROM m ORDER BY doc_id"""
  }

  /** Interpolated Kneser-Ney trigram twin (E191): the E174 token/bigram/
    * trigram streams verbatim, four continuation-TYPE rollups of the
    * count relations, the three-level discounted interpolation as one
    * fixed-order double expression (literal D = 0.75), `ROUND(LN p, 12)`
    * decimal-summed per doc. */
  val kneserNeyLm: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM words),
big AS (SELECT a.doc_id, a.t AS b1, b.t AS b2 FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
tri AS (SELECT a.doc_id, a.t AS w1, b.t AS w2, c.t AS w3
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
tc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM tri GROUP BY 1, 2, 3),
bc AS (SELECT b1, b2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
t12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS t12,
  CAST(SUM(c123) AS BIGINT) AS m12 FROM tc GROUP BY 1, 2),
c23 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS n23c FROM tc GROUP BY 1, 2),
cx2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ctx2 FROM tc GROUP BY 1),
t2r AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS t2 FROM c23 GROUP BY 1),
n3 AS (SELECT b2 AS w3, CAST(COUNT(*) AS BIGINT) AS n3c FROM bc GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM bc),
lp AS (SELECT tri.doc_id, CAST(ROUND(LN(
    (GREATEST(CAST(tc.c123 AS DOUBLE) - 0.75, 0.0) + 0.75 * CAST(t12.t12 AS DOUBLE) * ((GREATEST(CAST(c23.n23c AS DOUBLE) - 0.75, 0.0) + 0.75 * CAST(t2r.t2 AS DOUBLE) * (CAST(n3.n3c AS DOUBLE) / CAST(bt AS DOUBLE))) / CAST(cx2.ctx2 AS DOUBLE))) / CAST(t12.m12 AS DOUBLE)), 12) AS DECIMAL(38,12)) AS lp
  FROM tri JOIN tc USING (w1, w2, w3)
    JOIN t12 USING (w1, w2)
    JOIN c23 USING (w2, w3)
    JOIN cx2 USING (w2)
    JOIN t2r USING (w2)
    JOIN n3 ON n3.w3 = tri.w3, tot),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams, SUM(lp) AS slp FROM lp GROUP BY 1)
SELECT doc_id, n_trigrams,
  ROUND(CAST(slp AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6) AS avg_logprob,
  ROUND(EXP(-(CAST(slp AS DOUBLE) / CAST(n_trigrams AS DOUBLE))), 6) AS perplexity
FROM agg ORDER BY doc_id"""

  /** Cross-corpus Kneser-Ney twin (E197): train counts over the
    * reference slice (doc_id % 101 = 0), the score side's trigram
    * stream LEFT-joined, backoff CASEs keyed on NULLness of the train
    * counts exactly as the Spark side, OOV = no continuation mass. */
  lazy val knCrossPpl: String = {
    val p1 = "(CAST(n3.n3c AS DOUBLE) / CAST(bt AS DOUBLE))"
    val p2 = "(CASE WHEN cx2.ctx2 IS NULL THEN " + p1 +
      " ELSE (GREATEST(CAST(COALESCE(c23.n23c, 0) AS DOUBLE) - 0.75, 0.0) + " +
      s"0.75 * CAST(t2r.t2 AS DOUBLE) * $p1) / CAST(cx2.ctx2 AS DOUBLE) END)"
    val p3 = "(CASE WHEN cb12.cb IS NULL OR t12.t12 IS NULL THEN " + p2 +
      " ELSE (GREATEST(CAST(COALESCE(tc.c123, 0) AS DOUBLE) - 0.75, 0.0) + " +
      s"0.75 * CAST(t12.t12 AS DOUBLE) * $p2) / CAST(cb12.cb AS DOUBLE) END)"
    raw"""WITH twords AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents WHERE doc_id % 101 = 0),
ttok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM twords),
tbig AS (SELECT a.doc_id, a.t AS b1, b.t AS b2 FROM ttok a JOIN ttok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
ttri AS (SELECT a.doc_id, a.t AS w1, b.t AS w2, c.t AS w3
  FROM ttok a JOIN ttok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN ttok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
tc AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM ttri GROUP BY 1, 2, 3),
bc AS (SELECT b1, b2, COUNT(*) AS cb FROM tbig GROUP BY 1, 2),
t12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS t12 FROM tc GROUP BY 1, 2),
c23 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS n23c FROM tc GROUP BY 1, 2),
cx2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ctx2 FROM tc GROUP BY 1),
t2r AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS t2 FROM c23 GROUP BY 1),
n3 AS (SELECT b2 AS w3, CAST(COUNT(*) AS BIGINT) AS n3c FROM bc GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM bc),
swords AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents WHERE doc_id % 101 <> 0),
stok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM swords),
stri AS (SELECT a.doc_id, a.t AS w1, b.t AS w2, c.t AS w3
  FROM stok a JOIN stok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
              JOIN stok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
lp AS (SELECT stri.doc_id,
    (n3.n3c IS NULL) AS oov,
    CASE WHEN n3.n3c IS NOT NULL THEN
      CAST(ROUND(LN($p3), 12) AS DECIMAL(38,12)) END AS lp
  FROM stri LEFT JOIN tc USING (w1, w2, w3)
    LEFT JOIN bc cb12 ON cb12.b1 = stri.w1 AND cb12.b2 = stri.w2
    LEFT JOIN t12 USING (w1, w2)
    LEFT JOIN c23 USING (w2, w3)
    LEFT JOIN cx2 USING (w2)
    LEFT JOIN t2r USING (w2)
    LEFT JOIN n3 ON n3.w3 = stri.w3, tot),
agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
    CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
    CAST(COUNT(lp) AS BIGINT) AS n_scored, SUM(lp) AS slp
  FROM lp GROUP BY 1)
SELECT doc_id, n_trigrams, n_oov,
  ROUND(CAST(n_oov AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6) AS oov_rate,
  CASE WHEN n_scored > 0 THEN
    ROUND(CAST(slp AS DOUBLE) / CAST(n_scored AS DOUBLE), 6) END AS avg_logprob,
  CASE WHEN n_scored > 0 THEN
    ROUND(EXP(-(CAST(slp AS DOUBLE) / CAST(n_scored AS DOUBLE))), 6) END AS perplexity
FROM agg ORDER BY doc_id"""
  }

  /** Shard-manifest twin (E176): the deterministic sha256 bucket routing
    * (the hashBucket contract) folded to `% 16`, exact counts, and the
    * commutative BIGINT XOR of per-doc `sha256(id:text)[0,15]`
    * fingerprints. */
  val shardManifest: String =
    """SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
  bit_xor(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT) AS digest
FROM (SELECT *, ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'shard'), 1, 8))::BIGINT % 10000 % 16 AS shard FROM documents) q
GROUP BY shard ORDER BY shard"""

  /** PQ-encode twin (E177): per-subspace list slices, the shared
    * left-to-right zip fold for the squared distance (ROUND 6), QUALIFY
    * argmin with centroid-id tie-break, ordered code join and the
    * DECIMAL(38,6) distortion sum. */
  val embeddingPq: String =
    """WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 83 = 0 AND vec_id < 2000),
vs AS (SELECT vec_id, s, embedding[s * (len(embedding) // 8) + 1 : (s + 1) * (len(embedding) // 8)] AS v
  FROM embeddings, UNNEST(range(8)) t(s)),
cs AS (SELECT cid, s, ce[s * (len(ce) // 8) + 1 : (s + 1) * (len(ce) // 8)] AS cv
  FROM c, UNNEST(range(8)) t(s)),
d AS (SELECT vec_id, s, cid,
    ROUND(list_reduce(list_transform(list_zip(v, cv),
      z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))),
      (a, b) -> a + b), 6) AS d
  FROM vs JOIN cs USING (s)),
best AS (SELECT vec_id, s, cid, d FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1)
SELECT vec_id, string_agg(CAST(cid AS VARCHAR), '-' ORDER BY s) AS code,
  ROUND(CAST(SUM(CAST(d AS DECIMAL(38,6))) AS DOUBLE), 6) AS distortion
FROM best GROUP BY vec_id ORDER BY vec_id"""

  /** Per-domain top-k twin (E178): the textQuality score, the DESC
    * strictly-better window over the per-domain distinct-score
    * histogram, kept rows where n_better < k (ties all kept). */
  lazy val domainTopk: String = {
    val en = stopList(Stopwords.collectFirst { case ("en", w) => w }.get)
    s"""WITH b AS (
  SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '$PunctPattern')) AS BIGINT) AS punct,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
s AS (SELECT doc_id, domain, score FROM (
  SELECT doc_id, source AS domain,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS score
  FROM b) q WHERE score IS NOT NULL),
h AS (SELECT domain, score, COUNT(*) AS c FROM s GROUP BY 1, 2),
r AS (SELECT domain, score,
    COALESCE(SUM(c) OVER (PARTITION BY domain ORDER BY score DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_better
  FROM h)
SELECT s.doc_id, s.domain, s.score, CAST(r.n_better AS BIGINT) AS n_better
FROM s JOIN r ON r.domain = s.domain AND r.score = s.score
WHERE r.n_better < 20 ORDER BY s.doc_id"""
  }

  /** Char-entropy twin (E179): per-(doc, char) counts, the identical
    * `(c/n)·ln(c/n)` double terms ROUND(·,12) → DECIMAL(38,12) sums,
    * entropy = ROUND(−Σ, 6). */
  val charEntropy: String =
    """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE LENGTH(text) > 0),
cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
nn AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1),
t AS (SELECT cnt.doc_id, n,
    CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS DECIMAL(38,12)) AS t
  FROM cnt JOIN nn USING (doc_id))
SELECT doc_id, CAST(MIN(n) AS BIGINT) AS n_chars,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
  ROUND(-CAST(SUM(t) AS DOUBLE), 6) AS entropy
FROM t GROUP BY doc_id ORDER BY doc_id"""

  /** Power-iteration PCA twin (E172): the uncentered Gram matrix from
    * per-row upper-triangle products (6-dp terms, DECIMAL(38,6) sums —
    * order-free), mirrored to full symmetry, then every iteration
    * replayed as a chained (matvec, norm, normalize) CTE triple on the
    * same decimal-term contract; the start vector ROUND(1/√dim, 6). */
  def pcaPower(iterations: Int = 8): String = {
    val steps = (1 to iterations).map { k =>
      s"""w$k AS (SELECT g.i, CAST(SUM(CAST(ROUND(g.g * v.val, 6) AS DECIMAL(38,6))) AS DOUBLE) AS wv
  FROM gm g JOIN v${k - 1} v ON v.i = g.j GROUP BY 1),
n$k AS (SELECT SQRT(CAST(SUM(CAST(ROUND(wv * wv, 6) AS DECIMAL(38,6))) AS DOUBLE)) AS nrm FROM w$k),
v$k AS (SELECT i, ROUND(wv / nrm, 6) AS val FROM w$k, n$k)"""
    }.mkString(",\n")
    s"""WITH cells AS (
  SELECT t1.i AS i, t2.j AS j,
    CAST(e[t1.i + 1] AS DOUBLE) AS xi, CAST(e[t2.j + 1] AS DOUBLE) AS xj
  FROM (SELECT embedding AS e FROM embeddings WHERE embedding IS NOT NULL) q,
    UNNEST(range(len(e))) t1(i), UNNEST(range(len(e))) t2(j)
  WHERE t2.j >= t1.i),
up AS MATERIALIZED (SELECT i, j, CAST(SUM(CAST(ROUND(xi * xj, 6) AS DECIMAL(38,6))) AS DOUBLE) AS g
  FROM cells GROUP BY 1, 2),
gm AS MATERIALIZED (SELECT i, j, g FROM up UNION ALL SELECT j, i, g FROM up WHERE i <> j),
dims AS (SELECT DISTINCT i FROM gm),
v0 AS (SELECT i, ROUND(1 / SQRT((SELECT COUNT(*) FROM dims)), 6) AS val FROM dims),
$steps
SELECT CAST(i AS BIGINT) AS dim_idx, val AS loading,
  ROUND(nrm, 6) AS eigenvalue
FROM v$iterations, n$iterations ORDER BY dim_idx"""
  }
}
