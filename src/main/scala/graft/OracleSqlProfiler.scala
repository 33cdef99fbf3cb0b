package graft

/** OracleSql — Profiler lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlProfiler { this: OracleSql.type =>
  import Lineitem._

  /** Constraint-suite twin: the same metric value expressions joined to a
    * VALUES suite; status by the same CASE semantics (unknown when the
    * metric is absent). */
  lazy val constraintCheck: String = {
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

  /** Schema-drift twin: golden VALUES for both schema generations (the
    * evolved side derives from the same static inventory: l_tax dropped,
    * l_linenumber widened, l_flag added), full-outer-joined with the same
    * CASE statuses. */
  lazy val schemaDrift: String = {
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

  /** R13 metadata-upsert round trip: the surviving seeded params are VALUES
    * literals (table params merge, so the stale table-level DQP__ key
    * survives — the reference's Glue.java:67-80 behavior; column-level
    * DQP__ keys are reset), unioned with the freshly computed
    * DQP__Size/DQP__Completeness parameter values from lineitem. */
  lazy val metadataUpsert: String = {
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

  /** Referential-integrity twin: per-key child counts, NOT EXISTS
    * orphans, the same containment division + ROUND(·,6). */
  lazy val referentialIntegrity: String = {
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
  lazy val candidateKeys: String = {
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
  lazy val partitionedProfile: String =
    raw"""SELECT doc_id % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(text) AS BIGINT) AS n_with_text,
  CAST(SUM(COALESCE(len($wsToksSql), 0)) AS BIGINT) AS n_tokens
FROM documents GROUP BY 1 ORDER BY bucket"""

  /** Fuzzy-match twin (E101): same dirty-variant derivation, prefix-block
    * equi-join, DuckDB's classic levenshtein (identical to Spark's). */
  lazy val fuzzyMatch: String =
    raw"""WITH dirty AS (
  SELECT c_custkey AS left_id, substring(c_name, 1, length(c_name) - 1) AS lk
  FROM customer WHERE c_custkey % 20 = 0),
clean AS (SELECT c_custkey AS right_id, c_name AS rk FROM customer)
SELECT d.left_id, c.right_id, CAST(levenshtein(d.lk, c.rk) AS INT) AS dist
FROM dirty d JOIN clean c
  ON lower(substring(d.lk, 1, 12)) = lower(substring(c.rk, 1, 12))
WHERE levenshtein(d.lk, c.rk) <= 1
ORDER BY left_id, right_id"""

  /** E249 sorted-neighborhood twin: same clean ∪ shifted-id typo'd
    * union, per-block (rank, count) window on (lowered key, id), the
    * rank-band self-join `0 < Δrank ≤ window`, Levenshtein verdict. */
  lazy val sortedNeighborhood: String =
    raw"""WITH allr AS (
  SELECT c_custkey AS rid, c_name AS name FROM customer
  UNION ALL
  SELECT c_custkey + 1000000, substring(c_name, 1, length(c_name) - 1)
  FROM customer WHERE c_custkey % 20 = 0),
rk AS (SELECT rid AS id, lower(name) AS k,
    substring(lower(name), 1, 12) AS block
  FROM allr WHERE name IS NOT NULL),
rr AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY block ORDER BY k, id) AS BIGINT) AS rnk
  FROM rk)
SELECT a.id AS id_a, b.id AS id_b,
  CAST(levenshtein(a.k, b.k) AS INT) AS dist,
  (levenshtein(a.k, b.k) <= 1) AS matched
FROM rr a JOIN rr b ON a.block = b.block
  AND b.rnk - a.rnk > 0 AND b.rnk - a.rnk <= 3
ORDER BY id_a, id_b"""

  /** E251 Jaro-Winkler best-match twin: same dirty planting, 16-char
    * block equi-join, DuckDB's own `jaro_winkler_similarity` (the
    * independent implementation the codegen expression is pinned to),
    * window argmax (score desc, id asc), threshold verdict. */
  lazy val jwBestMatch: String =
    raw"""WITH dirty AS (
  SELECT c_custkey + 1000000 AS left_id,
    lower(substring(c_name, 1, length(c_name) - 1)) AS lk
  FROM customer WHERE c_custkey % 20 = 0),
clean AS (SELECT c_custkey AS right_id, lower(c_name) AS rk FROM customer),
cand AS (
  SELECT d.left_id, c.right_id,
    ROUND(jaro_winkler_similarity(d.lk, c.rk), 6) AS score
  FROM dirty d JOIN clean c
    ON substring(d.lk, 1, 16) = substring(c.rk, 1, 16)
  WHERE d.lk IS NOT NULL AND c.rk IS NOT NULL),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY left_id
      ORDER BY score DESC, right_id ASC) AS rn
  FROM cand)
SELECT left_id, right_id AS best_right_id, score,
  (score >= 0.9) AS accepted
FROM best WHERE rn = 1 ORDER BY left_id"""

  /** Snapshot-diff twin (E87): same deterministic before/after variants,
    * FULL OUTER JOIN on the key, IS DISTINCT FROM value comparison (the
    * Spark side compares SHA-256 digests of the same cast-to-string
    * values — equal by injectivity of the double/string rendering). */
  lazy val snapshotDiff: String =
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

  /** Inferred-type histogram twin (E81): the same derived string columns,
    * anchored-RE2 classification CASE slots in one grouped CTE, per-column
    * UNION ALL unpivot with the identical promotion rule. */
  lazy val inferredTypes: String = {
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

  /** Segmented-completeness twin (E79): one grouped CTE of per-column
    * non-null counts, unpivoted per column, same ROUND(·,6) division. */
  lazy val segmentedCompleteness: String = {
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
  lazy val keySkew: String =
    """WITH c AS (SELECT CAST(o_custkey AS BIGINT) AS k, COUNT(*) AS cnt FROM orders GROUP BY 1),
m AS (SELECT MAX(cnt) AS mx FROM c)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(MIN(CASE WHEN cnt = mx THEN k END) AS VARCHAR) AS hot_key, CAST(mx AS BIGINT) AS hot_freq,
  CAST(COUNT(CASE WHEN cnt = 1 THEN 1 END) AS BIGINT) AS keys_f1,
  CAST(COUNT(CASE WHEN cnt BETWEEN 2 AND 9 THEN 1 END) AS BIGINT) AS keys_f2_9,
  CAST(COUNT(CASE WHEN cnt BETWEEN 10 AND 99 THEN 1 END) AS BIGINT) AS keys_f10_99,
  CAST(COUNT(CASE WHEN cnt >= 100 THEN 1 END) AS BIGINT) AS keys_f100p
FROM c, m GROUP BY mx"""

  /** Constraint-suggestion twin: identical 6-dp-rounded per-column
    * metrics, identical rule set (bare SQL decimals CAST to DOUBLE — a
    * DuckDB bare 1.0 is DECIMAL). */
  lazy val constraintSuggest: String = {
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

  /** Metric-anomaly twin: per-snapshot metrics from the same grouped scan
    * expressions, then the identical fixed-order double assembly — history
    * mean (m0+m1+m2)/3.0, population stddev via (v−h)·(v−h) squares, z on
    * the 6-dp rounding both engines share. */
  lazy val metricAnomaly: String = {
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

  /** E163 approximate-overlap audit: the three HLL estimates within the
    * standard-error bound of their exact twins, the inclusion–exclusion
    * overlap within the summed bound, containments consistent. */
  lazy val approxOverlapAudit: String = allTrue(Seq(
    "containments_consistent", "n_a_within_bound", "n_b_within_bound",
    "n_union_within_bound", "overlap_within_summed_bound"))

  /** E163 persisted-state audit (r11): the state-based overlap must be
    * bit-identical to the direct sketch computation, and split states
    * must union losslessly to the whole-table state. */
  lazy val approxOverlapStatesAudit: String = allTrue(Seq(
    "estimates_match_rescan", "overlap_nonnegative",
    "split_merge_lossless"))

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

  lazy val sinkRoundtripAudit: String =
    allTrue(Seq("partition_values", "row_count", "rows_roundtrip"))

  /** E133 join-cardinality twin: per-side (key, count) relations, exact
    * BIGINT fan-out algebra, the identical relationship CASE. */
  lazy val joinCardinality: String =
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

  /** E136 table-digest twin: per-column sha256 with the E1 null
    * sentinel, '|'-joined, row digest = first 15 sha256 hex chars as a
    * 60-bit BIGINT, XOR-reduced. */
  lazy val tableDigest: String = {
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
  lazy val propsKeyProfile: String =
    """WITH ks AS (SELECT unnest(json_keys(props)) AS key FROM events WHERE props IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present, n_rows,
  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS share
FROM ks, t GROUP BY key, n_rows ORDER BY key"""

  lazy val partitionPruningAudit: String = allTrue(Seq(
    "multiple_partitions", "partition_filter_in_plan", "pruned_rows_match"))

  lazy val bloomMembershipAudit: String = allTrue(Seq(
    "fpr_bounded", "no_false_negatives", "prefilter_shrinks"))

  lazy val minhashMergeAudit: String = allTrue(Seq(
    "docs_preserved", "merge_equals_whole", "partition_independent"))

  lazy val schemaEvolutionAudit: String = allTrue(Seq(
    "new_values_intact", "old_rows_null_new_col", "rows_preserved",
    "schema_is_superset"))

  /** E241 k-anonymity twin: one aggregate over the quasi-identifier
    * pair, sensitive attribute = acctbal floored to thousands. */
  lazy val kAnonymity: String =
    """WITH cls AS (SELECT c_nationkey, c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS class_size,
    CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l_distinct
  FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT c_nationkey, c_mktsegment, class_size, l_distinct,
  (class_size >= 5) AS is_k_anonymous,
  (l_distinct >= 2) AS is_l_diverse,
  ROUND(1.0 / class_size, 6) AS reident_risk
FROM cls ORDER BY c_nationkey, c_mktsegment"""

  /** E254 t-closeness twin: same banded sensitive value, zero-filled
    * class × global-value grid, double-cast cell ratios, fixed-order
    * prefix sum per class, 6-dp |cum| quantized to DECIMAL(38,6)
    * before the per-class sum, `/(m−1)` (0 when m = 1). */
  lazy val tCloseness: String =
    """WITH base AS (SELECT c_nationkey, c_mktsegment,
    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sv
  FROM customer WHERE c_acctbal IS NOT NULL),
g AS (SELECT sv, CAST(COUNT(*) AS BIGINT) AS gc FROM base GROUP BY sv),
tot AS (SELECT CAST(SUM(gc) AS BIGINT) AS n_total,
    CAST(COUNT(*) AS BIGINT) AS m FROM g),
cls AS (SELECT c_nationkey, c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS class_size
  FROM base GROUP BY 1, 2),
cells AS (SELECT c_nationkey, c_mktsegment, sv,
    CAST(COUNT(*) AS BIGINT) AS cc
  FROM base GROUP BY 1, 2, 3),
grid AS (SELECT cls.c_nationkey, cls.c_mktsegment, cls.class_size,
    g.sv, g.gc, COALESCE(cells.cc, 0) AS cc, tot.n_total, tot.m
  FROM cls CROSS JOIN g
  LEFT JOIN cells ON cells.c_nationkey = cls.c_nationkey
    AND cells.c_mktsegment = cls.c_mktsegment AND cells.sv = g.sv
  CROSS JOIN tot),
pre AS (SELECT *,
    SUM(CAST(cc AS DOUBLE) / CAST(class_size AS DOUBLE)
      - CAST(gc AS DOUBLE) / CAST(n_total AS DOUBLE))
      OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY sv
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    ROW_NUMBER() OVER (PARTITION BY c_nationkey, c_mktsegment
      ORDER BY sv) AS vrnk
  FROM grid),
agg AS (SELECT c_nationkey, c_mktsegment, class_size, m,
    SUM(CAST(ROUND(ABS(cum), 6) AS DECIMAL(38,6))) AS emdsum
  FROM pre WHERE vrnk < m OR m = 1
  GROUP BY 1, 2, 3, 4),
f AS (SELECT c_nationkey, c_mktsegment, class_size,
    CASE WHEN m > 1
      THEN ROUND(CAST(emdsum AS DOUBLE) / CAST(m - 1 AS DOUBLE), 6)
      ELSE 0.0 END AS emd
  FROM agg)
SELECT c_nationkey, c_mktsegment, class_size, emd,
  (emd <= 0.2) AS is_t_close
FROM f ORDER BY c_nationkey, c_mktsegment"""

  /** E241 suppression-executor twin: sub-k classes get every
    * quasi-identifier replaced by '*', passing rows stringified. */
  lazy val kAnonymizeExecute: String =
    """WITH sz AS (SELECT c_nationkey, c_mktsegment,
    CAST(COUNT(*) AS BIGINT) AS class_size
  FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT
  CASE WHEN class_size < 5 THEN '*' ELSE CAST(c.c_nationkey AS VARCHAR) END AS c_nationkey,
  CASE WHEN class_size < 5 THEN '*' ELSE c.c_mktsegment END AS c_mktsegment,
  c.c_custkey, c.c_name, c.c_acctbal, class_size,
  (class_size < 5) AS suppressed
FROM customer c JOIN sz USING (c_nationkey, c_mktsegment)
ORDER BY c_custkey"""
}
