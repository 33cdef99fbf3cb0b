package graft

/** OracleSql — Text lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlText { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  /** E71 vocab-growth twin: identical bucket algebra
    * `(id * B) // (max_id + 1)`, token first-appearance attribution, and
    * cumulative window over the B-row grid. */
  lazy val vocabGrowth: String =
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

  /** BM25 twin for the fixed query (spark, merge, vector), k1=1.2, b=0.75.
    * Every fractional constant is CAST to DOUBLE (a bare 2.2 is DECIMAL in
    * DuckDB — exact-decimal then one late rounding, which does NOT equal
    * Java double arithmetic), and the three term scores are added in the
    * same fixed left-associated order as the Spark expression tree, so the
    * raw doubles match bit-for-bit. LN not LOG (DuckDB LOG is log10). */
  lazy val bm25TopK: String = {
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
  lazy val lmQuality: String =
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
  lazy val bigramLm: String =
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
  private[graft] def bpeChain(K: Int): String = {
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
  lazy val tfidfKeywords: String =
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
  lazy val repetitionMetrics: String =
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
  lazy val piiScan: String = {
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

  private[graft] lazy val wsToksSql = raw"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
  private[graft] lazy val wsToksLowerSql = raw"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"

  private[graft] def stopList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Chunking twin: same start grid (stride 48), same slice clamping, same
    * space-joined SHA-256 fingerprint over original-case tokens. */
  lazy val docChunks: String =
    s"""WITH words AS (SELECT doc_id, $wsToksSql AS w FROM documents),
c AS (SELECT doc_id, w, CAST(i AS BIGINT) AS chunk_idx
  FROM words, UNNEST(range(0, CASE WHEN len(w) = 0 THEN 0
    WHEN len(w) > 64 THEN CAST(CEIL((len(w) - 64) / 48.0) AS BIGINT) + 1
    ELSE 1 END)) t(i))
SELECT doc_id, chunk_idx, chunk_idx * 48 + 1 AS start_tok,
  CAST(LEAST(64, len(w) - chunk_idx * 48) AS BIGINT) AS n_tokens,
  sha256(array_to_string(list_slice(w, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' ')) AS chunk_sha
FROM c ORDER BY doc_id, chunk_idx"""

  lazy val tokenCount: String =
    s"SELECT doc_id, CAST(len($wsToksSql) AS BIGINT) AS ws_tokens, " +
      s"CAST(len(regexp_extract_all(text, '$BpeishPattern')) AS BIGINT) AS bpe_tokens " +
      "FROM documents ORDER BY doc_id"

  /** Length / punctuation / stopword quality metrics + composite score
    * (identical expression tree to TextFunctions.qualityScore; the CASE
    * guards mirror its null-on-empty division guards). */
  lazy val textQuality: String = {
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

  /** Zipf-fit twin (E76): identical top-k (freq DESC, token ASC), ranks
    * from a window over those k rows, OLS moments via ROUND(·,12) →
    * DECIMAL(38,12) sums, the same closed-form slope/intercept/r2. */
  lazy val zipfFit: String = {
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
  lazy val vocabTopK: String =
    s"""SELECT token, freq FROM (
  SELECT t.x AS token, COUNT(*) AS freq
  FROM documents, UNNEST($wsToksLowerSql) t(x) GROUP BY 1) q
ORDER BY freq DESC, token ASC LIMIT 100"""

  /** Stopword-vote language ID; argmax with (score desc, lang asc)
    * tie-break — lists shared with TextFunctions.Stopwords. */
  lazy val langId: String = {
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

  /** Polynomial rolling hash h = fold((h*31 + codepoint) mod 2^31-1) — the
    * oracle twin of the custom codegen RollingHash expression. */
  lazy val docFingerprint: String =
    "SELECT doc_id, CAST(CASE WHEN LENGTH(text) = 0 THEN 0 ELSE " +
      "list_reduce(list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT)), " +
      "(a, b) -> (a * 31 + b) % 2147483647) END AS BIGINT) AS fingerprint " +
      "FROM documents ORDER BY doc_id"

  /** Text-normalization twin: identical decomposed combining-sequence
    * prefix (chr(769)=U+0301, chr(776)=U+0308, chr(9)=tab), then the same
    * NFC → lower → collapse-whitespace → trim pipeline (`nfc_normalize`
    * implements the same Unicode canonical composition as the engine's
    * codegen NfcNormalize expression). */
  lazy val textNormalize: String =
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

  /** Corpus bigram top-50 — the vocabTopK ranking rule over the
    * repetition-metrics positional bigram generator. */
  lazy val bigramTopK: String =
    s"""SELECT bigram, freq FROM (
  SELECT w[i] || ' ' || w[i + 1] AS bigram, COUNT(*) AS freq
  FROM (SELECT $wsToksLowerSql AS w FROM documents), UNNEST(range(1, len(w))) s(i)
  GROUP BY 1) q
ORDER BY freq DESC, bigram ASC LIMIT 50"""

  /** URL-canonicalization twin: identical rendered messy URL, the literal
    * same Java/RE2-portable patterns, same per-domain ROW_NUMBER cap. */
  lazy val urlNormalize: String = {
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

  /** Tokenizer-application twin: vocab id = rank in the vocabTopK order,
    * OOV = 0, sequence fingerprint via ORDER BY pos string_agg (the
    * array_sort(collect_list(struct)) order on the Spark side). */
  lazy val tokenizeIds: String =
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

  /** E167 path templating twin (r11): per-(depth, segment) support,
    * generalize below-threshold segments to '*', census the templates. */
  lazy val pathTemplates: String =
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

  /** PMI-collocation twin (E112): same bigram construction as
    * bigramTopK, marginals/total as exact integer sums over the cells
    * relation, identical double algebra (n·c then cx·cy, one divide,
    * LN, round 6) and the same rounded-pmi/bigram-ASC frontier. */
  lazy val collocationsPmi: String =
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

  /** E123 document-frequency twin: per-doc DISTINCT token sets before
    * the unnest (df counts documents, never instances), broadcast doc
    * total, (df DESC, token ASC) frontier. */
  lazy val docFrequency: String =
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
  lazy val tokenizerFertility: String =
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(len($wsToksSql)) AS BIGINT) AS n_ws_tokens,
  CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS BIGINT) AS n_bpeish_tokens,
  CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
  CAST(SUM(STRLEN(text)) AS BIGINT) AS n_bytes,
  ROUND(CAST(SUM(LENGTH(text)) AS DOUBLE) / CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE), 6) AS chars_per_token,
  ROUND(CAST(SUM(STRLEN(text)) AS DOUBLE) / CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE), 6) AS bytes_per_token,
  ROUND(CAST(SUM(len(regexp_extract_all(text, '$BpeishPattern'))) AS DOUBLE) / CAST(SUM(len($wsToksSql)) AS DOUBLE), 6) AS fertility_vs_ws
FROM documents GROUP BY lang ORDER BY lang"""

  /** E128 containment twin: the jaccard CTE shapes with the intersection
    * relation directed both ways and divided by the SUBSET side's size. */
  lazy val ngramContainment: String =
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

  /** E129 novelty twin: the shared distinct-shingle relation joined to
    * its own corpus document frequency; unique = df 1. */
  lazy val ngramNovelty: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
freq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1)
SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
  CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS BIGINT) AS n_unique,
  ROUND(CAST(COUNT(CASE WHEN df = 1 THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM sh JOIN freq ON sh.s = freq.s GROUP BY 1 ORDER BY doc_id"""

  /** E134 declared-vs-detected confusion twin: the langId argmax inlined
    * (the mixtureStats pattern), cells + per-declared window share. */
  lazy val langAgreement: String = {
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

  /** E144 HTML-strip twin: identical deterministic render (the piiScan
    * precedent), identical tag → space → collapse → trim chain with the
    * 'g' flag. */
  lazy val htmlStrip: String =
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
  lazy val sentenceStats: String =
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
  lazy val charClassStats: String = {
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

  /** Interpolated-trigram twin (E174): tri/bi/unigram counts from the
    * positional token relation, the identical fixed-order interpolation
    * `0.6·p₃ + 0.3·p₂ + 0.1·p₁` over BIGINT counts, ROUND(LN·,12) →
    * DECIMAL(38,12) per-doc sums (the bigramLm contract). */
  lazy val trigramLm: String =
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

  /** Shared C4 line-keep predicate (E224) over a DuckDB line lambda
    * variable — terminal punctuation, ≥ 5 whitespace words, no
    * "javascript": the Spark-side c4LineKeep twin. */
  private def c4KeepSql(l: String): String =
    raw"""(ends_with($l, '.') OR ends_with($l, '!') OR ends_with($l, '?') OR ends_with($l, '"'))
      AND len(list_filter(string_split_regex($l, '\s+'), x -> x <> '')) >= 5
      AND NOT contains(lower($l), 'javascript')"""

  /** The paged-corpus view twin (CorpusStats.c4SynthPage): 12-token
    * lines, the `(doc_id + line) % 3` terminal-mark schedule, the three
    * modular page tells — identical string algebra; inner
    * `array_to_string` COALESCEd because DuckDB yields NULL on an empty
    * list where Spark's array_join yields ''. */
  private def c4PagesSql: String =
    raw"""(SELECT doc_id,
  array_to_string(list_transform(range(0, GREATEST((len(toks) + 11) // 12, 1)), i ->
    CASE WHEN (doc_id % 13 = 0 AND (doc_id + i) % 2 = 1)
           OR (doc_id % 13 <> 0 AND (doc_id + i) % 7 = 1)
    THEN 'copyright footer all rights reserved worldwide.'
    ELSE COALESCE(array_to_string(list_slice(toks, i*12 + 1, i*12 + 12), ' '), '') ||
    CASE WHEN (doc_id + i) % 3 = 0 THEN '.' WHEN (doc_id + i) % 3 = 2 THEN '?' ELSE '' END END), chr(10))
  || CASE WHEN doc_id % 23 = 0 THEN chr(10) || 'int main() { return 0; }' ELSE '' END
  || CASE WHEN doc_id % 29 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet consectetur adipiscing elit.' ELSE '' END
  || CASE WHEN doc_id % 31 = 0 THEN chr(10) || 'please enable javascript to view this page.' ELSE '' END AS text
FROM (SELECT doc_id, $wsToksSql AS toks FROM documents) tt) pages"""

  /** C4 rule-battery twin (E224): the same page view / line split / keep
    * predicate / sentence count, every cut the same integer or boolean
    * comparison, the retained-line fraction 6-dp readout only. */
  lazy val c4Rules: String =
    raw"""WITH base AS (SELECT doc_id, text,
    string_split(text, chr(10)) AS ls,
    list_filter(string_split(text, chr(10)), l -> ${c4KeepSql("l")}) AS kept
  FROM $c4PagesSql),
m AS (SELECT doc_id,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS kept_lines,
    CAST(LENGTH(COALESCE(array_to_string(kept, chr(10)), '')) AS BIGINT) AS kept_chars,
    CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) AS BIGINT) AS n_sentences,
    NOT contains(lower(text), 'lorem ipsum') AS no_lorem,
    NOT contains(text, '{') AS no_brace
  FROM base)
SELECT doc_id, n_lines, kept_lines, kept_chars, n_sentences,
  CASE WHEN n_lines > 0 THEN ROUND(CAST(kept_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) END AS retained_line_frac,
  (n_sentences >= 3) AS ok_sentences, no_lorem, no_brace,
  (n_sentences >= 3 AND no_lorem AND no_brace) AS keep
FROM m ORDER BY doc_id"""

  /** C4 executor twin (E224's action): kept pages with failing lines
    * removed, the cleaned text (kept lines re-joined on `\n`)
    * sha256-pinned. */
  lazy val c4FilterExecute: String =
    raw"""WITH base AS (SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), l -> ${c4KeepSql("l")}) AS kept
  FROM $c4PagesSql),
m AS (SELECT doc_id,
    CAST(len(kept) AS BIGINT) AS kept_lines,
    CAST(len(regexp_extract_all(COALESCE(array_to_string(kept, chr(10)), ''), '[.!?]')) AS BIGINT) AS n_sentences,
    contains(lower(text), 'lorem ipsum') AS has_lorem,
    contains(text, '{') AS has_brace,
    sha256(COALESCE(array_to_string(kept, chr(10)), '')) AS text_sha
  FROM base)
SELECT doc_id, kept_lines, text_sha
FROM m WHERE n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
ORDER BY doc_id"""

  /** E235 Flesch readability twin: the same page view; whitespace
    * tokens, `GREATEST(sentence marks, 1)`, the vowel-run syllable
    * counter per word (min 1, exact integer fold — `list_sum`
    * COALESCEd for the empty list), and the two linear forms as the
    * identical fixed-order double expressions. */
  lazy val fleschReadability: String = {
    val wps = "(CAST(n_words AS DOUBLE)/CAST(n_sentences AS DOUBLE))"
    val spw = "(CAST(n_syllables AS DOUBLE)/CAST(n_words AS DOUBLE))"
    raw"""WITH w AS (SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
    CAST(GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT) AS n_sentences
  FROM $c4PagesSql),
m AS (SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words, n_sentences,
    CAST(COALESCE(list_sum(list_transform(toks, t ->
      GREATEST(len(regexp_extract_all(t, '[aeiouyAEIOUY]+')), 1))), 0) AS BIGINT) AS n_syllables
  FROM w)
SELECT doc_id, n_words, n_sentences, n_syllables,
  ROUND($wps, 6) AS words_per_sentence,
  CASE WHEN n_words > 0 THEN ROUND($spw, 6) END AS syllables_per_word,
  CASE WHEN n_words > 0 THEN ROUND(206.835 - 1.015 * $wps - 84.6 * $spw, 6) END AS flesch,
  CASE WHEN n_words > 0 THEN ROUND(0.39 * $wps + 11.8 * $spw - 15.59, 6) END AS fk_grade,
  CASE WHEN n_words > 0 THEN ROUND(206.835 - 1.015 * $wps - 84.6 * $spw, 6) >= 30.0 END AS readable
FROM m ORDER BY doc_id"""
  }

  /** E226 duplicate-line twin: the same page view; per-document dedup
    * via `list_distinct` (order-free — only counts and length sums are
    * read), char sums COALESCEd because DuckDB's `list_sum` of an empty
    * list is NULL where Spark's 0-seeded fold is 0; the two MassiveText
    * cuts as the same integer comparisons. */
  lazy val dupLineStats: String =
    raw"""WITH m AS (SELECT doc_id,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS dup_lines,
    CAST(COALESCE(list_sum(list_transform(ls, l -> LENGTH(l))), 0) AS BIGINT) AS line_chars,
    CAST(COALESCE(list_sum(list_transform(ls, l -> LENGTH(l))), 0)
       - COALESCE(list_sum(list_transform(list_distinct(ls), l -> LENGTH(l))), 0) AS BIGINT) AS dup_line_chars
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM $c4PagesSql) b)
SELECT doc_id, n_lines, dup_lines, line_chars, dup_line_chars,
  CASE WHEN n_lines > 0 THEN ROUND(CAST(dup_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) END AS dup_line_frac,
  CASE WHEN line_chars > 0 THEN ROUND(CAST(dup_line_chars AS DOUBLE) / CAST(line_chars AS DOUBLE), 6) END AS dup_char_frac,
  (10 * dup_lines <= 3 * n_lines) AS ok_dup_lines,
  (5 * dup_line_chars <= line_chars) AS ok_dup_chars,
  (10 * dup_lines <= 3 * n_lines AND 5 * dup_line_chars <= line_chars) AS keep
FROM m ORDER BY doc_id"""

  /** Interpolated Kneser-Ney trigram twin (E191): the E174 token/bigram/
    * trigram streams verbatim, four continuation-TYPE rollups of the
    * count relations, the three-level discounted interpolation as one
    * fixed-order double expression (literal D = 0.75), `ROUND(LN p, 12)`
    * decimal-summed per doc. */
  lazy val kneserNeyLm: String =
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

  /** Char-entropy twin (E179): per-(doc, char) counts, the identical
    * `(c/n)·ln(c/n)` double terms ROUND(·,12) → DECIMAL(38,12) sums,
    * entropy = ROUND(−Σ, 6). */
  lazy val charEntropy: String =
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

  /** E238 domain-caps twin: the identical synthetic messy-URL rendering
    * (CASE chains on doc_id — the url_normalize precedent), the identical
    * host extraction (fragment → authority → userinfo → port → trailing
    * dot → lower; every regexp_replace carries the 'g' flag, DuckDB's
    * replace-first default being the pinned divergence trap), and the
    * PSL algebra with IN-lists GENERATED from the same
    * DomainFunctions rule Seqs the engine compiles in. */
  lazy val domainCaps: String = {
    import graft.functions.DomainFunctions._
    val twoIn = TwoLabelSuffixes.map("'" + _ + "'").mkString(", ")
    val wildIn = WildcardTlds.map("'" + _ + "'").mkString(", ")
    val excWhens = ExceptionRules.map { e =>
      s"WHEN host = '$e' OR host LIKE '%.$e' THEN '$e'"
    }.mkString("\n    ")
    raw"""WITH hc AS (SELECT doc_id, source,
    CASE WHEN doc_id % 10 = 0 THEN source || '.example.co.uk'
      WHEN doc_id % 10 = 1 THEN 'www.' || source || '.com'
      WHEN doc_id % 10 = 2 THEN 'sub.xn--bcher-kva.de'
      WHEN doc_id % 10 = 3 THEN 'b' || CAST(doc_id % 7 AS VARCHAR) || '.ck'
      WHEN doc_id % 10 = 4 THEN 'x.b' || CAST(doc_id % 7 AS VARCHAR) || '.ck'
      WHEN doc_id % 10 = 5 THEN 'www.ck'
      WHEN doc_id % 10 = 6 THEN 'deep.sub.www.ck'
      WHEN doc_id % 10 = 7 THEN '192.168.' || CAST(doc_id % 250 AS VARCHAR) || '.1'
      WHEN doc_id % 10 = 8 THEN source || '.com.au'
      ELSE 'co.uk' END AS hcore
  FROM documents),
hcc AS (SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN upper(hcore) ELSE hcore END AS ch
  FROM hc),
u AS (SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
    (CASE WHEN doc_id % 4 = 0 THEN 'user:p%40ss@' ELSE '' END) ||
    (CASE WHEN doc_id % 6 = 0 THEN ch || '.' ELSE ch END) ||
    (CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END) ||
    '/p/' || CAST(doc_id AS VARCHAR) ||
    (CASE WHEN doc_id % 9 = 0 THEN '#Frag' ELSE '' END) AS u
  FROM hcc),
hx0 AS (SELECT doc_id,
    lower(regexp_replace(regexp_replace(regexp_replace(
      regexp_extract(regexp_replace(u, '#.*$$', '', 'g'),
        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
      '^[^@]*@', '', 'g'), ':[0-9]+$$', '', 'g'), '\.$$', '', 'g')) AS h
  FROM u),
hx AS (SELECT doc_id,
    CASE WHEN LENGTH(h) > 0 THEN h END AS host,
    regexp_extract(h, '([^.]+)$$', 1) AS last1,
    regexp_extract(h, '([^.]+\.[^.]+)$$', 1) AS last2,
    regexp_extract(h, '([^.]+\.[^.]+\.[^.]+)$$', 1) AS last3,
    LENGTH(h) - LENGTH(regexp_replace(h, '\.', '', 'g')) + 1 AS nlab
  FROM hx0),
rd AS (SELECT doc_id, host,
    CASE WHEN host IS NULL THEN NULL
    WHEN regexp_matches(host, '^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$$') THEN host
    $excWhens
    WHEN last2 IN ($twoIn) THEN CASE WHEN nlab >= 3 THEN last3 END
    WHEN last1 IN ($wildIn) THEN CASE WHEN nlab >= 3 THEN last3 END
    ELSE CASE WHEN nlab >= 2 THEN last2 END END AS registered_domain
  FROM hx),
rk AS (SELECT doc_id, host, registered_domain,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY COALESCE(registered_domain, host, '')
      ORDER BY doc_id) AS BIGINT) AS domain_rank
  FROM rd)
SELECT doc_id, host, registered_domain, domain_rank,
  (domain_rank <= 15) AS kept
FROM rk ORDER BY doc_id"""
  }

  /** E239 script-profile twin: the identical deterministic multiscript
    * augmentation, per-class codepoint counts via
    * `len(regexp_extract_all(...))` over the SAME `\x{...}` range
    * classes (generated from CorpusStats.ScriptClasses — the one regex
    * dialect feature Java regex and RE2 read identically), GREATEST for
    * the max, the fixed-order CASE argmax, and the integer mixed-script
    * rule `10·second ≥ max`. */
  /** E242 count-min twin: exact per-token counts feed both the d×w cell
    * relation and the audit; every cell index is the SAME affine map
    * over the SAME rolling-hash fold both engines compute in integer
    * algebra (`((a·h + b) mod 2^31−1) mod 64`). SUM casts back to
    * BIGINT (DuckDB widens BIGINT sums to HUGEINT). */
  lazy val cmsFreq: String = {
    val coeffs = graft.operators.CountMin.RowCoeffs.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    val rhFold = "list_reduce(list_transform(string_split(token, ''), " +
      "c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 2147483647)"
    s"""WITH toks AS (SELECT unnest($wsToksSql) AS token FROM documents),
exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_n FROM toks GROUP BY token),
rh AS (SELECT token, exact_n, $rhFold AS rh FROM exact),
coef(row_i, a, b) AS (VALUES $coeffs),
cells AS (SELECT row_i, ((a * rh + b) % 2147483647) % 64 AS bucket,
    CAST(SUM(exact_n) AS BIGINT) AS cell_n
  FROM rh CROSS JOIN coef GROUP BY row_i, bucket),
top AS (SELECT token, exact_n, rh FROM rh ORDER BY exact_n DESC, token LIMIT 30),
est AS (SELECT t.token, t.exact_n, MIN(c.cell_n) AS cms_est
  FROM top t CROSS JOIN coef k
  JOIN cells c ON c.row_i = k.row_i
    AND c.bucket = ((k.a * t.rh + k.b) % 2147483647) % 64
  GROUP BY t.token, t.exact_n)
SELECT token, exact_n, cms_est,
  CAST(cms_est - exact_n AS BIGINT) AS overest,
  (cms_est - exact_n = 0) AS tight
FROM est ORDER BY token"""
  }

  /** E248 signed-feature-hash twin: the SAME rolling-hash fold per
    * token, bucket `h mod 16`, sign from the bit above the bucket field
    * (`(h // 16) % 2`), exact integer per-bucket sums, fixed-order sum
    * of squares, one rounded division per coordinate. */
  lazy val textFeatureHash: String = {
    val rhFold = "list_reduce(list_transform(string_split(token, ''), " +
      "c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 2147483647)"
    val fCols = (0 until 16).map(b =>
      s"SUM(CASE WHEN bucket = $b THEN sign ELSE 0 END) AS f$b")
      .mkString(",\n    ")
    val sq = (0 until 16).map(b => s"f$b*f$b").mkString(" + ")
    val vCols = (0 until 16).map(b => s"ROUND(f$b / nrm, 6) AS v$b")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, unnest($wsToksSql) AS token FROM documents),
h AS (SELECT doc_id, $rhFold AS rh FROM toks),
s AS (SELECT doc_id, rh % 16 AS bucket,
    CASE WHEN (rh // 16) % 2 = 0 THEN 1 ELSE -1 END AS sign FROM h),
f AS (SELECT doc_id,
    $fCols
  FROM s GROUP BY doc_id),
n AS (SELECT *, SQRT(CAST($sq AS DOUBLE)) AS nrm FROM f)
SELECT doc_id, $vCols FROM n WHERE nrm > 0 ORDER BY doc_id"""
  }

  lazy val scriptProfile: String = {
    import graft.operators.CorpusStats.{AuxClasses, ScriptClasses}
    val cntCols = (ScriptClasses ++ AuxClasses).map { case (n, re) =>
      s"CAST(len(regexp_extract_all(t2, '$re')) AS BIGINT) AS n_$n"
    }.mkString(",\n    ")
    val gMax = ScriptClasses.map { case (n, _) => s"n_$n" }.mkString(", ")
    val domCases = ScriptClasses.map { case (n, _) =>
      s"WHEN n_$n = m THEN '$n'"
    }.mkString("\n    ")
    val secTerms = ScriptClasses.map { case (n, _) =>
      s"CASE WHEN dominant_script = '$n' THEN 0 ELSE n_$n END"
    }.mkString(",\n      ")
    val outCols = (ScriptClasses ++ AuxClasses)
      .map { case (n, _) => s"n_$n" }.mkString(", ")
    s"""WITH s AS (SELECT doc_id, text,
    CASE WHEN doc_id % 6 = 1 THEN ' Привет мир'
      WHEN doc_id % 6 = 2 THEN ' 你好世界'
      WHEN doc_id % 6 = 3 THEN ' こんにちはカナ'
      WHEN doc_id % 6 = 4 THEN ' مرحبا שלום'
      WHEN doc_id % 6 = 5 THEN ' 😀🚀 한글 नमस्ते'
      ELSE '' END AS soup
  FROM documents),
base AS (SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN '№' || soup ELSE text || soup END AS t2
  FROM s),
cnts AS (SELECT doc_id,
    $cntCols
  FROM base),
mx AS (SELECT *, GREATEST($gMax) AS m FROM cnts),
dm AS (SELECT *,
    CASE WHEN m = 0 THEN 'none'
    $domCases
    ELSE 'none' END AS dominant_script
  FROM mx),
sec AS (SELECT *,
    GREATEST(
      $secTerms) AS second
  FROM dm)
SELECT doc_id, $outCols, dominant_script,
  (second * 10 >= m AND second > 0) AS mixed_script
FROM sec ORDER BY doc_id"""
  }
}
