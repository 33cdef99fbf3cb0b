package graft

/** OracleSql — Quality lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlQuality { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

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
  lazy val domainStats: String = {
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
  lazy val splitDivergence: String = {
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

  /** Filter-funnel twin: cumulative-conjunction survivor counts; every
    * stage predicate reuses the standalone oracle's expression (length,
    * token count, langId argmax, quality composite). */
  lazy val filterFunnel: String = {
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
  private[graft] lazy val qualityLabelYSql: String =
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
  private[graft] def logregCtes(
      lr: String = "1.0",
      ySql: String = "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END",
      fromSql: String = "documents",
      prefix: String = ""): String = {
    val en = stopList(graft.functions.TextFunctions.Stopwords
      .collectFirst { case ("en", w) => w }.get)
    // `prefix` namespaces every CTE (E230 composes TWO chains — main +
    // irreducible — in one statement); the default "" keeps the
    // generated SQL byte-identical to the pre-prefix form.
    val P = prefix
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
      s"""${P}g$k AS (
  SELECT ${gTerm("1.0")} AS g0, ${gTerm("x1")} AS g1,
    ${gTerm("x2")} AS g2, ${gTerm("x3")} AS g3,
    $llTerm AS ll, $accTerm AS acc
  FROM ${P}f, ${P}w${k - 1}),
${P}w$k AS (
  SELECT ROUND(w0 - $lr*g0, 6) AS w0, ROUND(w1 - $lr*g1, 6) AS w1,
    ROUND(w2 - $lr*g2, 6) AS w2, ROUND(w3 - $lr*g3, 6) AS w3
  FROM ${P}w${k - 1}, ${P}g$k),
${P}r$k AS (
  SELECT CAST($k AS BIGINT) AS iter, w.w0, w.w1, w.w2, w.w3,
    g.ll AS mean_logloss, g.acc AS accuracy
  FROM ${P}w$k w, ${P}g$k g)"""
    }.mkString(",\n")
    raw"""${P}f AS (
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
${P}w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
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

  /** E223 EL2N selection twin: replay the full E180 training chain
    * (reference-quality label, lr 8), score every feature-valid document
    * with `ROUND(|σ(z) − y|, 6)` under the FINAL weights (the identical
    * fixed-order logit; the rounding shares the gradient-term ulp
    * contract), rank over the total (el2n DESC, doc_id ASC) order,
    * top 100 hardest. */
  lazy val el2nSelect: String =
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)},
scored AS (
  SELECT doc_id,
    ROUND(ABS(1.0/(1.0+EXP(-(w0 + w1*x1 + w2*x2 + w3*x3))) - y), 6) AS el2n,
    y, ROUND(w0 + w1*x1 + w2*x2 + w3*x3, 6) AS z
  FROM f, w6)
SELECT doc_id, el2n, y, z,
  CAST(ROW_NUMBER() OVER (ORDER BY el2n DESC, doc_id) AS BIGINT) AS rank
FROM scored ORDER BY el2n DESC, doc_id LIMIT 100"""

  /** E227 example-forgetting twin: the full training chain once, the six
    * 1-row weight relations cross-joined, every per-step verdict the
    * identical fixed-order logit compared on `z ≥ 0` — flip counts and
    * correctness are pure integer algebra. */
  lazy val forgettingEvents: String = {
    def correct(t: Int): String =
      s"(((a$t.w0 + a$t.w1*x1 + a$t.w2*x2 + a$t.w3*x3) >= 0) = (y = 1.0))"
    val flips = (2 to 6)
      .map(t => s"CASE WHEN ${correct(t - 1)} AND NOT ${correct(t)} THEN 1 ELSE 0 END")
      .mkString(" + ")
    val nCorrect = (1 to 6)
      .map(t => s"CASE WHEN ${correct(t)} THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)}
SELECT doc_id,
  CAST($flips AS BIGINT) AS forgetting_events,
  CAST($nCorrect AS BIGINT) AS n_correct,
  ${correct(6)} AS final_correct, y
FROM f, w1 a1, w2 a2, w3 a3, w4 a4, w5 a5, w6 a6
ORDER BY doc_id"""
  }

  /** E230 RHO-loss selection twin: TWO full training chains in one
    * statement — the main model over the sha256-coin train split
    * (unprefixed CTEs) and the irreducible-loss model over the holdout
    * (prefix `h`) — then both 6-dp losses under the respective FINAL
    * weights, rho as the rounded difference of the rounded losses,
    * top-100 on (rho DESC, doc_id). */
  lazy val rhoLossSelect: String = {
    val coin = "('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || " +
      "'rho'), 1, 8))::BIGINT % 10000"
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql,
        fromSql = s"(SELECT * FROM documents WHERE $coin >= 2000)")},
${logregCtes(lr = "8.0", ySql = qualityLabelYSql,
        fromSql = s"(SELECT * FROM documents WHERE $coin < 2000)",
        prefix = "h")},
scored AS (
  SELECT doc_id,
    ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * (m.w0 + m.w1*x1 + m.w2*x2 + m.w3*x3))), 6) AS loss_train,
    ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * (h.w0 + h.w1*x1 + h.w2*x2 + h.w3*x3))), 6) AS loss_irr,
    y
  FROM f, w6 m, hw6 h),
sc2 AS (
  SELECT doc_id, ROUND(loss_train - loss_irr, 6) AS rho,
    loss_train, loss_irr, y
  FROM scored)
SELECT doc_id, rho, loss_train, loss_irr, y,
  CAST(ROW_NUMBER() OVER (ORDER BY rho DESC, doc_id) AS BIGINT) AS rank
FROM sc2 ORDER BY rho DESC, doc_id LIMIT 100"""
  }

  /** E231 TracIn twin: the training chain once, the six 1-row weight
    * relations cross-joined, the probe-set mean gradients (id % 97 = 0,
    * decimal-summed 6-dp terms — the E164 gradient contract) as ONE
    * 24-column aggregate, and the per-document influence as the
    * fixed-written-order sum of six 6-dp checkpoint terms. */
  lazy val tracinScores: String = {
    def z(t: Int) = s"(a$t.w0 + a$t.w1*x1 + a$t.w2*x2 + a$t.w3*x3)"
    def pt(t: Int) = s"(1.0/(1.0+EXP(-${z(t)})))"
    val xsSql = Seq("1.0", "x1", "x2", "x3")
    val pgCols = (1 to 6).flatMap { t =>
      xsSql.zipWithIndex.map { case (x, j) =>
        s"ROUND(CAST(SUM(CAST(ROUND((${pt(t)} - y) * $x, 6) AS " +
          s"DECIMAL(38,6))) AS DOUBLE)/COUNT(*), 6) AS g${t}_$j"
      }
    }.mkString(",\n    ")
    val terms = (1 to 6).map { t =>
      s"ROUND((${pt(t)} - y) * (pg.g${t}_0 + pg.g${t}_1*x1 + " +
        s"pg.g${t}_2*x2 + pg.g${t}_3*x3), 6)"
    }.mkString(" + ")
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)},
pg AS (
  SELECT $pgCols
  FROM f, w1 a1, w2 a2, w3 a3, w4 a4, w5 a5, w6 a6
  WHERE doc_id % 97 = 0)
SELECT doc_id,
  ROUND(8.0 * ($terms), 6) AS tracin,
  y, (doc_id % 97 = 0) AS is_probe
FROM f, w1 a1, w2 a2, w3 a3, w4 a4, w5 a5, w6 a6, pg
ORDER BY doc_id"""
  }

  /** E232 dataset-cartography twin: six 6-dp true-class probabilities
    * per document (σ or 1−σ, single round), fixed-order mean, deviation
    * square-sum against the ROUNDED mean, z≥0 correctness counts — the
    * same literal expression nest, layered through CTEs only so the
    * rounded mean is referenceable. */
  lazy val dataMap: String = {
    def z(t: Int) = s"(a$t.w0 + a$t.w1*x1 + a$t.w2*x2 + a$t.w3*x3)"
    // true-class probability in exact integer MICROS (the mean of six
    // 6-dp doubles lands on the 7th-digit half boundary for ~1/6 of
    // rows, where the engines' double rounding disagrees — the mean is
    // integer algebra instead: floor((2Σµ + k)/2k) = half-up of Σµ/k)
    def pc(t: Int) =
      s"CAST(ROUND((CASE WHEN y = 1.0 THEN (1.0/(1.0+EXP(-${z(t)}))) " +
        s"ELSE 1.0 - (1.0/(1.0+EXP(-${z(t)}))) END) * 1000000.0) AS BIGINT)"
    val pcsum = (1 to 6).map(t => s"p$t").mkString(" + ")
    val dev2 = (1 to 6)
      .map(t => s"((CAST(p$t AS DOUBLE)/1000000.0)-confidence)*" +
        s"((CAST(p$t AS DOUBLE)/1000000.0)-confidence)")
      .mkString(" + ")
    val ncorr = (1 to 6)
      .map(t => s"CASE WHEN (${z(t)} >= 0) = (y = 1.0) THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)},
pcs AS (
  SELECT doc_id, y,
    ${(1 to 6).map(t => s"${pc(t)} AS p$t").mkString(",\n    ")},
    CAST($ncorr AS BIGINT) AS n_corr
  FROM f, w1 a1, w2 a2, w3 a3, w4 a4, w5 a5, w6 a6),
cm AS (
  SELECT doc_id, y, p1, p2, p3, p4, p5, p6, n_corr,
    CAST(FLOOR(CAST(2*($pcsum) + 6 AS DOUBLE) / 12.0) AS BIGINT) AS conf_mu
  FROM pcs),
cm2 AS (
  SELECT *, CAST(conf_mu AS DOUBLE)/1000000.0 AS confidence FROM cm),
vm AS (
  SELECT doc_id, y, n_corr, confidence,
    ROUND(SQRT(($dev2) / 6.0), 6) AS variability
  FROM cm2)
SELECT doc_id, confidence, variability,
  ROUND(CAST(n_corr AS DOUBLE) / 6.0, 6) AS correctness,
  CASE WHEN confidence >= 0.5 AND variability < 0.2 THEN 'easy_to_learn'
    WHEN confidence < 0.5 AND variability < 0.2 THEN 'hard_to_learn'
    ELSE 'ambiguous' END AS region,
  y
FROM vm ORDER BY doc_id"""
  }

  /** E236 quality-ensemble twin: the training chain once, the E179
    * entropy CTEs, signals over the shared quantized feature relation,
    * EXACT min/max spreads in a 1-row stats CTE, min-max normalization
    * and the null-propagating 3-way mean — the identical fixed-order
    * double algebra. */
  lazy val qualityEnsemble: String =
    s"""WITH ${logregCtes(lr = "8.0", ySql = qualityLabelYSql)},
ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE LENGTH(text) > 0),
cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
nn AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1),
tt AS (SELECT cnt.doc_id, n,
    CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS DECIMAL(38,12)) AS t
  FROM cnt JOIN nn USING (doc_id)),
ent AS (SELECT doc_id, ROUND(-CAST(SUM(t) AS DOUBLE), 6) AS s_entropy
  FROM tt GROUP BY doc_id),
sc AS (SELECT f.doc_id,
    ROUND(0.4*x1 + 0.3*(1.0 - x2) + 0.3*x3, 6) AS s_heur,
    ROUND(w0 + w1*x1 + w2*x2 + w3*x3, 6) AS s_model,
    ent.s_entropy
  FROM f, w6, ent WHERE ent.doc_id = f.doc_id),
mm AS (SELECT MIN(s_heur) AS h0, MAX(s_heur) AS h1,
    MIN(s_model) AS m0, MAX(s_model) AS m1,
    MIN(s_entropy) AS e0, MAX(s_entropy) AS e1 FROM sc),
nr AS (SELECT doc_id, s_heur, s_model, s_entropy,
    CASE WHEN h1 > h0 THEN ROUND((s_heur - h0) / (h1 - h0), 6) END AS n_heur,
    CASE WHEN m1 > m0 THEN ROUND((s_model - m0) / (m1 - m0), 6) END AS n_model,
    CASE WHEN e1 > e0 THEN ROUND((s_entropy - e0) / (e1 - e0), 6) END AS n_entropy
  FROM sc, mm)
SELECT doc_id, s_heur, s_model, s_entropy, n_heur, n_model, n_entropy,
  ROUND((n_heur + n_model + n_entropy) / 3.0, 6) AS ensemble,
  (ROUND((n_heur + n_model + n_entropy) / 3.0, 6) >= 0.5) AS keep
FROM nr ORDER BY doc_id"""

  /** E237 data-recipe twin — the WHOLE four-stage recipe replayed in one
    * statement: E138's normalized-dedup survivors (min id per
    * canonicalized-text group) → the E236 ensemble over the survivors
    * (training chain prefixed `e`, entropy CTEs prefixed `e`, exact
    * min/max fusion, keep ≥ 0.5) → the E230 RHO selection over the kept
    * corpus (TWO training chains, prefixes `m`/`h`, on the sha256 'rho'
    * coin split; top-150 on (rho DESC, doc_id)) → the E46 budget pack
    * (inclusive running token sum in (ensemble DESC, doc_id) order,
    * capped at 8000). Three full training chains in one statement —
    * each references only its own prefix, so DuckDB's single-reference
    * CTE inlining stays linear (the rhoLossSelect precedent). */
  lazy val dataRecipe: String = {
    val coin = "('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || " +
      "'rho'), 1, 8))::BIGINT % 10000"
    raw"""WITH nrm AS (SELECT doc_id,
    COALESCE(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 'null') AS nt
  FROM documents),
keep0 AS (SELECT MIN(doc_id) AS doc_id FROM nrm GROUP BY nt),
dd AS MATERIALIZED (SELECT d.* FROM documents d JOIN keep0 USING (doc_id)),
${logregCtes(lr = "8.0", ySql = qualityLabelYSql, fromSql = "dd", prefix = "e")},
ech AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM dd WHERE LENGTH(text) > 0),
ecnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ech GROUP BY 1, 2),
enn AS (SELECT doc_id, SUM(c) AS n FROM ecnt GROUP BY 1),
ett AS (SELECT ecnt.doc_id, n,
    CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS DECIMAL(38,12)) AS t
  FROM ecnt JOIN enn USING (doc_id)),
eent AS (SELECT doc_id, ROUND(-CAST(SUM(t) AS DOUBLE), 6) AS s_entropy
  FROM ett GROUP BY doc_id),
esc AS (SELECT ef.doc_id,
    ROUND(0.4*x1 + 0.3*(1.0 - x2) + 0.3*x3, 6) AS s_heur,
    ROUND(w0 + w1*x1 + w2*x2 + w3*x3, 6) AS s_model,
    eent.s_entropy
  FROM ef, ew6, eent WHERE eent.doc_id = ef.doc_id),
emm AS (SELECT MIN(s_heur) AS h0, MAX(s_heur) AS h1,
    MIN(s_model) AS m0, MAX(s_model) AS m1,
    MIN(s_entropy) AS e0, MAX(s_entropy) AS e1 FROM esc),
ens2 AS (SELECT doc_id,
    ROUND(((CASE WHEN h1 > h0 THEN ROUND((s_heur - h0) / (h1 - h0), 6) END)
      + (CASE WHEN m1 > m0 THEN ROUND((s_model - m0) / (m1 - m0), 6) END)
      + (CASE WHEN e1 > e0 THEN ROUND((s_entropy - e0) / (e1 - e0), 6) END)) / 3.0, 6) AS ensemble
  FROM esc, emm),
kept AS MATERIALIZED (
  SELECT d.*, e.ensemble FROM dd d JOIN ens2 e USING (doc_id)
  WHERE e.ensemble >= 0.5),
${logregCtes(lr = "8.0", ySql = qualityLabelYSql,
        fromSql = s"(SELECT * FROM kept WHERE $coin >= 2000)", prefix = "m")},
${logregCtes(lr = "8.0", ySql = qualityLabelYSql,
        fromSql = s"(SELECT * FROM kept WHERE $coin < 2000)", prefix = "h")},
rsc AS (SELECT doc_id,
    ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * (m.w0 + m.w1*x1 + m.w2*x2 + m.w3*x3))), 6) AS loss_train,
    ROUND(LN(1.0 + EXP(-(2.0*y - 1.0) * (h.w0 + h.w1*x1 + h.w2*x2 + h.w3*x3))), 6) AS loss_irr
  FROM mf, mw6 m, hw6 h),
rsc2 AS (SELECT doc_id, ROUND(loss_train - loss_irr, 6) AS rho FROM rsc),
sel AS (SELECT doc_id, rho,
    CAST(ROW_NUMBER() OVER (ORDER BY rho DESC, doc_id) AS BIGINT) AS sel_rank
  FROM rsc2 ORDER BY rho DESC, doc_id LIMIT 150),
packin AS (SELECT k.doc_id, k.ensemble, s.rho, s.sel_rank,
    CAST(len($wsToksSql) AS BIGINT) AS n_tokens
  FROM kept k JOIN sel s USING (doc_id)),
pack AS (SELECT *,
    CAST(SUM(n_tokens) OVER (ORDER BY ensemble DESC, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM packin)
SELECT doc_id, ensemble, rho, sel_rank, n_tokens, cum_tokens
FROM pack WHERE cum_tokens <= 8000 ORDER BY doc_id"""
  }

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

  /** E247 per-domain quantile-normalization twin: the E9 quality inner
    * relation, explicit percentile `(rn−1)/(n−1)` (0 for singletons)
    * over (quality, id) order within each domain, keep-top-half
    * verdict. */
  lazy val domainQuantileNorm: String = {
    val en = stopList(graft.functions.TextFunctions.Stopwords
      .collectFirst { case ("en", w) => w }.get)
    val pr = "ROUND(CASE WHEN n > 1 THEN (rn-1)*1.0/(n-1) ELSE 0.0 END, 6)"
    s"""WITH q AS (SELECT doc_id, source AS domain,
    ROUND(CASE WHEN n_chars > 0 AND ws_tokens > 0 THEN 0.4 * LEAST(ws_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct * 1.0 / n_chars) + 0.3 * (stop_hits * 1.0 / ws_tokens) END, 6) AS quality
  FROM (
    SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS n_chars,
      CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '${graft.functions.TextFunctions.PunctPattern}')) AS BIGINT) AS punct,
      CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
    FROM documents) i),
r AS (SELECT doc_id, domain, quality,
    CAST(ROW_NUMBER() OVER (PARTITION BY domain ORDER BY quality, doc_id) AS BIGINT) AS rn,
    CAST(COUNT(*) OVER (PARTITION BY domain) AS BIGINT) AS n
  FROM q WHERE quality IS NOT NULL)
SELECT doc_id, domain, quality, $pr AS pct_rank,
  ($pr >= 0.5) AS selected
FROM r ORDER BY doc_id"""
  }

  /** E245 Hedge online-mixing twin: ONE (batch, domain) reward
    * aggregate (6-dp mean of the shared x3 stopword-fraction feature,
    * DECIMAL(38,6) sum discipline), zero-filled over rounds × domains,
    * then the multiplicative chain `w_k = ROUND(w_{k-1}·e^{0.5·r_k},6)`
    * with probabilities over the exact decimal weight sum. */
  lazy val hedgeMix: String = {
    val en = stopList(graft.functions.TextFunctions.Stopwords
      .collectFirst { case ("en", w) => w }.get)
    val steps = (1 to 6).map { k =>
      s"""hw$k AS (SELECT c.domain, c.n, c.reward,
    ROUND(p.w * EXP(0.5 * c.reward), 6) AS w
  FROM cells c JOIN hw${k - 1} p USING (domain) WHERE c.t = $k),
hr$k AS (SELECT CAST($k AS BIGINT) AS round, domain, n, reward, w AS weight,
    ROUND(w / (SELECT CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) FROM hw$k), 6) AS prob
  FROM hw$k)"""
    }.mkString(",\n")
    val rows = (1 to 6).map(k => s"SELECT * FROM hr$k").mkString(" UNION ALL ")
    raw"""WITH i AS (SELECT doc_id, source, CAST(LENGTH(text) AS BIGINT) AS n_chars,
    CAST(len($wsToksSql) AS BIGINT) AS ws_tokens,
    CAST(len(list_filter($wsToksLowerSql, t -> list_contains($en, t))) AS BIGINT) AS stop_hits
  FROM documents),
f AS (SELECT (doc_id % 6) + 1 AS t, source AS domain,
    ROUND(CAST(stop_hits AS DOUBLE)/ws_tokens, 6) AS x3
  FROM i WHERE n_chars > 0 AND ws_tokens > 0),
doms AS (SELECT DISTINCT domain FROM f),
rounds(t) AS (VALUES (1), (2), (3), (4), (5), (6)),
robs AS (SELECT t, domain, CAST(COUNT(*) AS BIGINT) AS n,
    ROUND(CAST(SUM(CAST(x3 AS DECIMAL(38,6))) AS DOUBLE)/COUNT(*), 6) AS reward
  FROM f GROUP BY t, domain),
cells AS (SELECT r.t, d.domain, COALESCE(o.n, 0) AS n,
    COALESCE(o.reward, 0.0) AS reward
  FROM rounds r CROSS JOIN doms d
  LEFT JOIN robs o ON o.t = r.t AND o.domain = d.domain),
hw0 AS (SELECT domain, CAST(1.0 AS DOUBLE) AS w FROM doms),
$steps
$rows ORDER BY round, domain"""
  }

  private[graft] def groupDroCtes(grpSql: String = "source"): String = {
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

  /** E139 decile-report twin: the scorePercentile expression feeding
    * min(⌊10·pr⌋, 9) bands with token weights joined by doc id. */
  lazy val qualityDeciles: String = {
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

  /** CCNet-bucket twin (E171): the langId argmax + textQuality score
    * (both expression-identical to their standalone oracles), the
    * per-language DISTINCT-score histogram with the strictly-better
    * running mass (DESC window, one row back), and the integer tertile
    * comparison `3·n_above < k·n_lang` — no float at the cut. */
  /** Shared CTE chain for the CCNet-bucket twins (E171/E187): the langId
    * argmax + textQuality score, the per-language DISTINCT-score
    * histogram, the strictly-better running mass. */
  private[graft] lazy val ccnetBucketsCtes: String = {
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
}
