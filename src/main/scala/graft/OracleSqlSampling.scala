package graft

/** OracleSql — Sampling lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlSampling { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  /** Leakage-safe split twin: the dedupClusters recursive-CTE component
    * labels, split key = COALESCE(cluster canonical id, own doc_id),
    * bucketed by the shared sha256 hash into the same 90/5/5 ranges as
    * datasetSplit. */
  lazy val leakageSafeSplit: String =
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

  /** The deterministic sampling hash bucket — identical algebra to
    * Sampling.hashBucket (first 8 hex chars of sha256(key ++ salt) as an
    * unsigned int, mod 10000). */
  private[graft] lazy val sampleBucket: String =
    "(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'graft'), 1, 8))::BIGINT % 10000)"

  lazy val sampleDeterministic: String =
    s"SELECT doc_id FROM documents WHERE $sampleBucket < 1000 ORDER BY doc_id"

  /** Temperature-mixture twin (Sampling.mixtureResample, alpha = 0.5,
    * target = corpus size): per-language share smoothed by POW(·, 0.5)
    * (= correctly-rounded sqrt in both engines), quantized to
    * DECIMAL(38,6) before the exact normalizer sum — the engine's standard
    * cross-engine FP contract — then the same round(rate·10⁴) bucket bound
    * over the same sha256 bucket. */
  lazy val mixtureResample: String =
    s"""WITH counts AS (SELECT lang AS stratum, COUNT(*) AS n FROM documents WHERE lang IS NOT NULL GROUP BY lang),
tot AS (SELECT SUM(n) AS nn FROM counts),
sm AS (SELECT stratum, n, GREATEST(CAST(POW(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE), 0.5) AS DECIMAL(38,6)), CAST(0.000001 AS DECIMAL(38,6))) AS sd FROM counts, tot),
norm AS (SELECT SUM(sd) AS s FROM sm),
bounds AS (SELECT stratum,
  CAST(ROUND(LEAST(1.0, CAST(sd AS DOUBLE) / CAST(s AS DOUBLE) * (SELECT CAST(nn AS DOUBLE) FROM tot) / CAST(n AS DOUBLE)) * 10000) AS BIGINT) AS bound
  FROM sm, norm)
SELECT d.doc_id, d.lang FROM documents d JOIN bounds b ON d.lang = b.stratum
WHERE $sampleBucket < b.bound ORDER BY d.doc_id"""

  lazy val datasetSplit: String =
    s"""SELECT doc_id, CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'valid' ELSE 'test' END AS split
FROM (SELECT doc_id, $sampleBucket AS b FROM documents) q ORDER BY doc_id"""

  /** Stratified-sample twin: strata by integer-divided char length, up to
    * 10 docs per stratum in (hash bucket, doc_id) order — the same bucket
    * algebra as [[sampleDeterministic]]. */
  lazy val stratifiedSample: String =
    s"""SELECT doc_id, stratum FROM (
  SELECT doc_id, LENGTH(text) // 100 AS stratum,
    ROW_NUMBER() OVER (PARTITION BY LENGTH(text) // 100 ORDER BY $sampleBucket, doc_id) AS rn
  FROM documents) q WHERE rn <= 10 ORDER BY doc_id"""

  /** Whitespace + BPE-ish token counts per document. */
  /** Sequence-packing twin: the windowed prefix sum DuckDB can afford on
    * oracle-scale data (the Spark side computes the same prefix sum
    * distributedly — two-phase per-partition totals + offset seeding). */
  lazy val sequencePacking: String =
    s"""WITH t AS (SELECT doc_id, CAST(len($wsToksSql) AS BIGINT) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM t)
SELECT doc_id, n_tokens, cum_before // 1000 AS pack_id, cum_before FROM c ORDER BY doc_id"""

  /** Mixture-composition twin: the split bucket algebra + the langId
    * argmax + token counts, grouped per (split, lang) — every ingredient
    * identical to its standalone oracle. */
  lazy val mixtureStats: String = {
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

  /** Budget-selection twin: the text_quality composite (same CASE guards,
    * 6-dp rounding pins the ranking across engines), ranked (score DESC,
    * doc_id), inclusive running token sum capped at the budget. */
  lazy val budgetSelect: String = {
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

  /** Deterministic-shuffle twin: the sampling hash bucket mod 16 as the
    * shard, position by ROW_NUMBER in (bucket, doc_id) order. */
  lazy val corpusShuffle: String =
    s"""WITH b AS (SELECT doc_id, $sampleBucket AS bkt,
    sha256(CAST(doc_id AS VARCHAR) || 'graft') AS hx FROM documents)
SELECT doc_id, CAST(bkt % 16 AS INT) AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY bkt % 16 ORDER BY hx, doc_id) AS BIGINT) AS pos
FROM b ORDER BY doc_id"""

  /** Effective-tokens twin (E89): GROUP BY the text itself (nulls group
    * together = the sentinel-hash cluster), COALESCE null token counts
    * to 0, single-row reduction with the same guarded ratio. */
  lazy val effectiveTokens: String =
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
  lazy val corpusCube: String =
    raw"""SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(nt) AS BIGINT) AS n_tokens,
  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
  CAST(GROUPING(source) AS BIGINT) AS g_source
FROM (SELECT lang, source, COALESCE(len($wsToksSql), 0) AS nt FROM documents) t
GROUP BY CUBE (lang, source)
ORDER BY g_lang, g_source, lang, source"""

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

  /** E166 UniMax waterfilling twin (r11): the driver recursion replayed
    * as a recursive CTE — visit domains by (count asc, domain asc), each
    * takes min(count, remaining // domains_left), integer end-to-end. */
  lazy val unimaxMix: String =
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

  /** E142 quality-weighted-sample twin: the sampleBucket hash against
    * round(score·10⁴) — the exact keep decision replayed. */
  lazy val qualityWeightedSample: String = {
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

  /** Shard-manifest twin (E176): the deterministic sha256 bucket routing
    * (the hashBucket contract) folded to `% 16`, exact counts, and the
    * commutative BIGINT XOR of per-doc `sha256(id:text)[0,15]`
    * fingerprints. */
  lazy val shardManifest: String =
    """SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
  bit_xor(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT) AS digest
FROM (SELECT *, ('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || 'shard'), 1, 8))::BIGINT % 10000 % 16 AS shard FROM documents) q
GROUP BY shard ORDER BY shard"""
}
