package graft

/** OracleSql — Stats lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlStats { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  /** The flagship deterministic full-profile pipeline (R15): every
    * deterministic family over every applicable column, plus the schema join,
    * with entity labels. */
  /** Correlation twin: identical decimal-quantized moments and identical
    * double assembly order; the variance-product guard precedes SQRT
    * (DuckDB raises on sqrt of a negative). */
  lazy val columnCorr: String = corrSql(numeric, T)

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
  lazy val numericHistogram: String =
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

  /** E70 winsorized-stats twin: exact QUANTILE_CONT bounds (matching
    * Spark's interpolating `percentile`), explicit null-preserving
    * LEAST/GREATEST clip, decSum-quantized clipped moments. */
  private[graft] def winsorSelects(c: String, pLo: String, pHi: String): Seq[String] = {
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

  lazy val winsorizedStats: String =
    wrap(union(Lineitem.numeric.flatMap(c => winsorSelects(c, "0.01", "0.99"))))

  /** KS-drift twin (E98): pooled distinct values, conditional count
    * merge, explicit ROWS-framed cumulative window, integer counts to
    * the final double division, display-only ROUND. */
  lazy val ksDrift: String =
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

  /** E250 Mann-Whitney twin: twice the tie-averaged rank sum as exact
    * DECIMAL(38,0) integer algebra over the distinct-value relation
    * (`2·R_a = Σ ca·(2·cum − t + 1)`), tie-corrected σ², one
    * fixed-order double projection for U and z. */
  lazy val mannWhitneyDrift: String =
    raw"""WITH u AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_orderkey % 2 AS side
  FROM lineitem WHERE l_extendedprice IS NOT NULL),
m AS (SELECT v,
        CAST(COUNT(CASE WHEN side = 0 THEN 1 END) AS BIGINT) AS ca,
        CAST(COUNT(CASE WHEN side = 1 THEN 1 END) AS BIGINT) AS cb
      FROM u GROUP BY v),
c AS (SELECT v, ca, cb, ca + cb AS t,
        SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM m),
s AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
        SUM(CAST(ca * (2 * cum - t + 1) AS DECIMAL(38,0))) AS r1x2,
        SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS ties
      FROM c),
f AS (SELECT n_a, n_b,
        (CAST(r1x2 AS DOUBLE) - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0)) / 2.0 AS uu,
        CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu,
        CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * (((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) + 1.0) - CAST(ties AS DOUBLE) / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) - 1.0))) / 12.0 AS sigma2
      FROM s),
g AS (SELECT n_a, n_b, ROUND(uu, 6) AS u,
        ROUND((uu - mu) / SQRT(sigma2), 6) AS z
      FROM f)
SELECT n_a, n_b, u, z, (ABS(z) > 1.96) AS drift FROM g"""

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
  lazy val benfordDigits: String =
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
  lazy val iqrOutliers: String = {
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
  lazy val madOutliers: String = {
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

  /** PSI histogram-drift twin: identical combined-range bucket math
    * (numericHistogram formula), eps-clamped shares, per-bin term rounded
    * to 12 places and summed as DECIMAL(38,12). */
  lazy val histogramDrift: String = {
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

  /** Sequence-length-histogram twin: the numericHistogram bucket math over
    * the per-doc whitespace token count. */
  lazy val seqLengthHistogram: String =
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

  /** E103 approximate-Spearman audit (r8): the KLL-CDF rank path must
    * land within 0.02 of the exact global-order-window twin on both a
    * correlated and a near-independent pair, with identical
    * complete-case counts. */
  lazy val spearmanAudit: String = allTrue(Seq(
    "counts_match", "independent_within_bound", "monotone_near_one",
    "monotone_within_bound", "rho_in_unit", "ties_within_bound"))

  /** E82 approximate grouped-quantiles audit (r8): the per-group KLL
    * battery must satisfy the per-(group, p) rank bound against the
    * data, carry the exact twin's group/count relation, and be monotone
    * in p within every group. */
  lazy val groupedQuantilesAudit: String = allTrue(Seq(
    "all_quantiles_within_rank_bound", "groups_and_counts_match_exact",
    "monotone_within_group"))

  /** Misra-Gries guarantees (E91) as an all-true golden oracle — the
    * estimates themselves are partitioning-dependent (no hash oracle,
    * like ApproxCountDistinct), the guarantees are exact. */
  lazy val heavyHittersAudit: String =
    allTrue(Seq("est_subset_of_vocab", "est_never_over",
      "no_missed_heavy_hitter", "undercount_bounded", "total_mass_bounded"))

  /** E109 bound audit: the KLL-sketch D̂ stays within 3× the combined
    * normalized rank error of the exact E98 D, on both a same-distribution
    * and a disjoint-support pair. */
  lazy val ksDriftAudit: String = allTrue(Seq(
    "same_within_3eps", "shift_within_3eps", "d_in_unit",
    "counts_exact", "shift_detected"))

  /** E114 approx audit: per numeric column, the sketch median/MAD land
    * at exact rank 0.5±3ε and the CDF-lookup tail counts stay within
    * 3ε·n of exact counts below/above the same fences. */
  lazy val madOutliersAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true, true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, med_rank_ok, mad_rank_ok, below_ok, above_ok) " +
      "ORDER BY instance"
  }

  /** E96 approx audit: sketch quartiles at exact rank 0.25/0.75 ± 3ε,
    * CDF-lookup tail counts within 3ε·n of exact at the same fences. */
  lazy val iqrOutliersAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true, true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, q1_rank_ok, q3_rank_ok, below_ok, above_ok) " +
      "ORDER BY instance"
  }

  /** E70 approx audit: each sketch clip bound at its target rank ± 3ε. */
  lazy val winsorizedStatsAudit: String = {
    val rows = Lineitem.numeric.map(c => s"('$c', true, true)")
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) " +
      "AS t(instance, lo_rank_ok, hi_rank_ok) ORDER BY instance"
  }

  /** KLL rank-interval audit rows mirror approxErrorAudit' shape: one
    * boolean per (numeric column, quantile). */
  lazy val kllRankAudit: String = {
    val rows = Lineitem.numeric.flatMap(c =>
      (1 to 10).map(i => s"('$c', 'ApproxQuantiles-${i / 10.0}', true)"))
    s"SELECT * FROM (VALUES ${rows.mkString(", ")}) AS t(instance, name, within_bound) " +
      "ORDER BY instance, name"
  }

  /** E131 score-percentile twin: the textQuality score expression
    * verbatim, then the built-in PERCENT_RANK — whose (rank−1)/(n−1)
    * RANK-ties definition is exactly the distinct-score-histogram
    * formulation the Spark side computes without a global window. */
  lazy val scorePercentile: String = {
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
}
