package graft

/** OracleSql — Events lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlEvents { this: OracleSql.type =>
  import Lineitem._

  /** JSON property extraction + grouped aggregate over the events stream
    * table (props is a JSON string column). */
  lazy val eventsJson: String =
    "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, " +
      "COUNT(*) AS n_events, " +
      "ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value " +
      "FROM events GROUP BY 1 ORDER BY 1"

  /** Streaming-dedup twin: the final complete-mode state equals the batch
    * group-by-content-hash dedup table. */
  lazy val streamingDedup: String =
    "SELECT MIN(doc_id) AS doc_id, sha256(text) AS content_hash, COUNT(*) AS dup_count " +
      "FROM documents GROUP BY sha256(text) ORDER BY doc_id"

  /** Batch twin of the streaming tumbling-window profile (1h windows over
    * events; exact count + DECIMAL-quantized sum). */
  lazy val streamingProfile: String =
    "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type, " +
      "COUNT(*) AS n_events, ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value " +
      "FROM events GROUP BY 1, 2 ORDER BY 1, 2"

  /** Gap-and-islands twin of the stateful sessionization (30-minute gap,
    * epoch-microsecond timestamps). */
  lazy val streamingSessions: String =
    """WITH d AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 1800000000 THEN 1 ELSE 0 END AS brk
  FROM events),
s AS (SELECT user_id, ts_us, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d)
SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n_events FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"""

  /** E233 stream-stream interval join twin: the plain batch interval
    * join — with one source file the streaming replay's append-mode
    * inner join emits exactly this relation (timestamps as integral
    * epoch micros; 120 min = 7 200 000 000 µs). */
  lazy val streamingIntervalJoin: String =
    """SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id,
  epoch_us(l.ts) AS l_us, epoch_us(r.ts) AS r_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
  AND l.event_type = 'view' AND r.event_type = 'click'
  AND epoch_us(r.ts) >= epoch_us(l.ts)
  AND epoch_us(r.ts) <= epoch_us(l.ts) + 7200000000
ORDER BY l_event_id, r_event_id"""

  /** Batch sessionize twin (E108): same lag/flag/running-sum split as the
    * Spark plan, with the identical total order (ts, event_id) so
    * timestamp collisions cannot flap a boundary. SUM(...) casts back to
    * BIGINT (DuckDB widens integer SUM to HUGEINT). */
  lazy val sessionize: String =
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
  lazy val asofEnrich: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events),
w AS (SELECT *,
    last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS) OVER win AS last_view_value,
    last_value(CASE WHEN event_type = 'view' THEN ts_us END IGNORE NULLS) OVER win AS last_view_ts_us
  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, ts_us, value, last_view_value, last_view_ts_us,
  ts_us - last_view_ts_us AS gap_us
FROM w WHERE event_type = 'purchase' ORDER BY event_id"""

  /** Strict-order funnel twin: each stage's anchor is the earliest
    * qualifying event strictly after the previous stage's anchor. Same
    * ns→µs floor as the other event oracles. */
  lazy val eventFunnel: String =
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
  lazy val timeToConvert: String =
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
  lazy val cohortRetention: String =
    """WITH ev AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT u, MIN(day) AS cohort_day FROM ev GROUP BY 1),
t AS (SELECT DISTINCT ev.u, c.cohort_day, ev.day - c.cohort_day AS day_offset
  FROM ev JOIN c USING (u) WHERE ev.day - c.cohort_day <= 7)
SELECT cohort_day, day_offset, COUNT(*) AS n_users
FROM t GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""

  /** E211 streaming-vs-batch parity audit: streaming exact rows and near
    * pairs must equal the batch incremental operator bit-for-bit. */
  lazy val streamingStateDedupAudit: String = allTrue(Seq(
    "exact_rows_equal_batch", "near_pairs_equal_batch"))

  /** E119/E126 approximate event-stat audits (r11): scalars must equal
    * the exact one-pass recount; each KLL quantile's exact rank interval
    * must overlap [p−3ε, p+3ε]. */
  lazy val interarrivalStatsAudit: String = allTrue(Seq(
    "p25", "p50", "p75", "p95", "scalars"))
  lazy val sessionStatsAudit: String = allTrue(Seq("p50", "p90", "scalars"))

  /** E102 approximate time-to-convert audit (r11): per transition, the
    * converter count must equal the exact count and each grouped-KLL
    * quantile must satisfy the 3ε rank interval. */
  lazy val timeToConvertAudit: String =
    "SELECT * FROM (VALUES ('signup->view', true, true, true), " +
      "('view->purchase', true, true, true)) " +
      "AS t(transition, n_ok, p50_ok, p90_ok) ORDER BY transition"

  /** Rolling-volume twin (E115): same integer day numbers, RANGE frame,
    * and fixed-order n·days/total double ratio. */
  lazy val rollingDailyVolume: String =
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
  lazy val transitionEntropy: String =
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

  /** E118 timestamp-profile twin: one aggregate pass over epoch_us(ts);
    * calendar fields via the same integer `// 86400000000` day algebra
    * and strftime rendering as the daily suite. */
  lazy val tsProfile: String =
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
  lazy val interarrivalStats: String =
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
  lazy val hourlyActivity: String =
    """WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events)
SELECT CAST(((us // 86400000000) + 4) % 7 AS BIGINT) AS dow,
  CAST((us // 3600000000) % 24 AS BIGINT) AS hour,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1, 2 ORDER BY dow, hour"""

  /** E121 CUSUM twin: deviations quantized ROUND(·,6)→DECIMAL(38,6)
    * BEFORE the running sum (exact prefixes, engine-portable), extremum
    * flag compared on the exact decimal. */
  lazy val volumeCusum: String =
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
  lazy val sessionStats: String =
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
  lazy val assocRules: String =
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

  /** E127 per-type daily burst twin: exact BIGINT count/square sums per
    * type, then the identical fixed-order double mean/σ/z algebra; the
    * burst flag compares the UNROUNDED z like the Spark expression. */
  lazy val typeBurst: String = {
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
  lazy val userActivityHistogram: String =
    """WITH pu AS (SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total FROM pu),
h AS (SELECT CAST(LENGTH(bin(n)) - 1 AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(n) AS BIGINT) AS n_events, MIN(n) AS min_events, MAX(n) AS max_events
  FROM pu GROUP BY 1)
SELECT bucket, n_users, n_events, min_events, max_events,
  ROUND(CAST(n_users AS DOUBLE) / CAST(n_users_total AS DOUBLE), 6) AS users_share
FROM h, t ORDER BY bucket"""

  /** E140 stream-static-enrich twin: the batch equivalent of the
    * broadcast dimension join (alphabetical dense type ranks). */
  lazy val streamingEnrich: String =
    """WITH d AS (
  SELECT event_type, CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS type_rank
  FROM (SELECT DISTINCT event_type FROM events) q)
SELECT event_id, e.event_type, type_rank
FROM events e JOIN d USING (event_type) ORDER BY event_id"""

  /** E243 SCD Type-2 twin: change rows via LAG over (ts_us, event_id)
    * order, versions numbered over the change subset, intervals closed
    * by LEAD — identical two-window algebra on epoch micros. */
  lazy val scd2History: String =
    """WITH log AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
c AS (SELECT *,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_value
  FROM log),
ch AS (SELECT user_id, ts_us, event_id, event_type FROM c
  WHERE prev_value IS NULL OR prev_value <> event_type)
SELECT user_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version,
  event_type,
  ts_us AS valid_from,
  LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
  (LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL) AS is_current
FROM ch ORDER BY user_id, version"""
}
