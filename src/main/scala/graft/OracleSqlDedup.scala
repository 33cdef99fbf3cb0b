package graft

/** OracleSql — Dedup lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlDedup { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  // =====================================================================
  // Training-data-pipeline extensions (documents / embeddings / events)
  // =====================================================================

  /** Exact dedup by SHA-256 content hash (same hash both engines). */
  lazy val dedupExact: String =
    "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents " +
      "GROUP BY sha256(text) ORDER BY doc_id"

  /** E69 blocklist-filter twin: the operator's Bloom prefilter is a pure
    * routing optimization (no false negatives; false positives resolved by
    * the exact anti-join), so the oracle is the plain anti-join over the
    * identically-derived blocklist (same sha256 bucket math as the
    * sampling oracles). */
  lazy val blocklistFilter: String =
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
  lazy val paragraphDedup: String =
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
  lazy val dedupIncremental: String =
    """SELECT n.doc_id, EXISTS (
  SELECT 1 FROM documents o WHERE o.doc_id < 400 AND sha256(o.text) = sha256(n.text)
) AS dup FROM documents n WHERE n.doc_id >= 400 ORDER BY n.doc_id"""

  /** Shared CTE chain computing exact word-3-gram Jaccard pairs ≥ 0.5
    * (`jpairs(id_a, id_b)`) — the oracle twin of Dedup.ngramJaccard with
    * no doc-freq cap. */
  private[graft] lazy val jaccardCtes: String =
    raw"""words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jpairs AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT id_a, id_b, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b) q
  WHERE jaccard >= 0.5)"""

  lazy val dedupNgramJaccard: String =
    s"WITH $jaccardCtes\nSELECT id_a, id_b, jaccard FROM jpairs ORDER BY id_a, id_b"

  /** E253 detector-eval twin: the same planted union corpus (easy
    * tail-append / hard truncation), the E2 shingle-Jaccard chain over
    * it, probe-restricted predictions, canonicalized full-outer pair
    * join, double-cast P/R and F1 from the ROUNDED ratios. */
  lazy val dedupEval: String =
    raw"""WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000, text || ' planted near duplicate tail'
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 600000, substring(text, 1, 40)
  FROM documents WHERE doc_id % 7 = 3),
words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM corpus),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
jp AS (SELECT id_a, id_b FROM (
    SELECT id_a, id_b, ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b) q
  WHERE jaccard >= 0.5),
pred AS (SELECT DISTINCT LEAST(id_a, id_b) AS lo, GREATEST(id_a, id_b) AS hi
  FROM jp WHERE id_b >= 500000),
truth AS (SELECT DISTINCT LEAST(id_a, id_b) AS lo, GREATEST(id_a, id_b) AS hi
  FROM (
    SELECT doc_id AS id_a, doc_id + 500000 AS id_b FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id, doc_id + 600000 FROM documents WHERE doc_id % 7 = 3)),
m AS (SELECT p.lo IS NOT NULL AS in_p, t.lo IS NOT NULL AS in_t
  FROM pred p FULL OUTER JOIN truth t ON p.lo = t.lo AND p.hi = t.hi),
c AS (SELECT
    CAST(SUM(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM m),
f AS (SELECT tp + fn AS n_truth, tp + fp AS n_pred, tp, fp, fn,
    CASE WHEN tp + fp > 0
      THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS p6,
    CASE WHEN tp + fn > 0
      THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS r6
  FROM c)
SELECT n_truth, n_pred, tp, fp, fn, p6 AS "precision", r6 AS recall,
  CASE WHEN p6 IS NOT NULL AND r6 IS NOT NULL AND p6 + r6 > 0
    THEN ROUND(CAST(2.0 AS DOUBLE) * p6 * r6 / (p6 + r6), 6) END AS f1
FROM f"""

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
  lazy val dedupClusters: String =
    s"""WITH RECURSIVE $jaccardCtes,
edges AS (SELECT id_a AS u, id_b AS v FROM jpairs UNION SELECT id_b, id_a FROM jpairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u)
SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u ORDER BY doc_id"""

  /** Decontamination twin: distinct word-3-gram shingles per doc, train
    * (doc_id % 50 != 0) joined to bench (doc_id % 50 = 0) on shared
    * shingles, pairs with >= 3 shared shingles flagged. */
  lazy val contamination: String =
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
  lazy val contaminationRatio: String =
    raw"""WITH words AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM words, UNNEST(range(1, len(w) - 1)) t(i)),
train AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 <> 0),
per AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams, CAST(COUNT(t.s) AS BIGINT) AS n_contaminated
        FROM sh b LEFT JOIN train t ON b.s = t.s WHERE b.doc_id % 50 = 0 GROUP BY 1)
SELECT doc_id, n_ngrams, n_contaminated,
  ROUND(CAST(n_contaminated AS DOUBLE) / CAST(n_ngrams AS DOUBLE), 6) AS contaminated_ratio
FROM per ORDER BY doc_id"""

  /** Winnowing twin: the same packed `hash·2²⁰ + (2²⁰−1−pos)` keys (inner
    * rolling hash = the doc_fingerprint fold over the k-gram's codepoints),
    * window minima via list_min, DISTINCT selected pairs. */
  lazy val winnowFingerprint: String =
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
  lazy val winnowNearDup: String =
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
  private[graft] def lcp(x: String, y: String): String =
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
  private[graft] lazy val substringSpansCte: String = {
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
  private[graft] lazy val selfRepeatSpansCte: String = {
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

  private[graft] lazy val contaminationSpansCte: String = {
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
  private[graft] def cutIntervalsSql(docFilter: String): String =
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

  /** SemDeDup twin (E158): the same nearest-centroid assignment as the
    * centroid-update twin (6-dp cosine, QUALIFY argmax with centroid-id
    * tie-break), within-cluster pairwise 6-dp cosine, and the same
    * pairwise-loser rule — the HIGHER rounded centroid-cosine member of
    * every duplicate pair is removed (ties remove the larger id). */
  /** Shared CTE chain for the SemDeDup twins (E158/E186): assignment
    * (argmax 6-dp centroid cosine), within-cluster pairs, removal set. */
  private[graft] lazy val semDedupCtes: String =
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

  /** D4 selection twin (E234): the SemDeDup verdict CTEs verbatim, then
    * the E229 per-cluster hardest-first rank and integer keep quota over
    * the SURVIVORS only (removed vectors carry null rank and keep =
    * false via the COALESCE). */
  lazy val d4Select: String =
    s"""WITH $semDedupCtes,
sv AS (SELECT a.vec_id, a.centroid_id, a.cos, (r.vec_id IS NOT NULL) AS removed
  FROM a LEFT JOIN r USING (vec_id)),
rk AS (SELECT vec_id, centroid_id, cos, removed,
    CASE WHEN NOT removed THEN CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id, removed ORDER BY cos ASC, vec_id) AS BIGINT) END AS rnk,
    CASE WHEN NOT removed THEN CAST(COUNT(*) OVER (PARTITION BY centroid_id, removed) AS BIGINT) END AS n_cluster
  FROM sv)
SELECT vec_id, centroid_id, cos AS centroid_cos, removed AS dedup_removed,
  rnk, n_cluster,
  COALESCE((NOT removed) AND rnk <= CAST(CEIL(0.7 * n_cluster) AS BIGINT), FALSE) AS keep
FROM rk ORDER BY vec_id"""

  /** Cluster-representative twin: the recursive-CTE transitive closure of
    * the Jaccard pair graph + the text_quality composite, rank 1 per
    * cluster on (quality DESC, doc_id). */
  lazy val dedupClusterBest: String = {
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

  lazy val minhashAudit: String =
    allTrue(Seq("pairs_subset_of_exact", "threshold_and_ordering"))

  /** E205 cross-batch incremental dedup audit: signature-store
    * mergeability (union of per-sub-batch states ≡ one-pass state),
    * detection invariance under store composition, exact-stage parity
    * with E39, and planted byte-identical cross-batch copies caught by
    * both stages at est_jaccard = 1. */
  lazy val dedupIncrementalLshAudit: String = allTrue(Seq(
    "detection_state_invariant", "exact_parity_with_incremental_exact",
    "planted_cross_dups_caught", "state_merge_equals_whole"))

  /** E220 twin: the two-batch store with re-ingested copies, min-id
    * representative + copy count per distinct content. */
  lazy val dedupStateCompact: String =
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
  lazy val dedupStateCompactAudit: String = allTrue(Seq(
    "copy_mass_preserved", "detection_flags_invariant",
    "one_row_per_distinct_content"))

  /** E215 calibration audit: pair mass preserved by the decile rollup,
    * exact values ≡ the n-gram Jaccard relation, estimates in [0,1]. */
  lazy val minhashCalibrationAudit: String = allTrue(Seq(
    "est_exact_in_unit_range", "exact_matches_ngram_jaccard",
    "rollup_preserves_pair_mass"))

  /** E216 twin: per-day volumes, integer day ages against the max day,
    * EXP decay weights (the LN/EXP parity contract), 6-dp products. */
  lazy val freshnessWeights: String =
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
  lazy val dupPairExplain: String =
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
  lazy val dedupRateByBatch: String =
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
  lazy val crossDedupMatrix: String =
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

  /** E203 recall-curve audit: per-band caught ⊆ exact, the J = 1 band
    * deterministically fully caught, every LSH pair in exactly one
    * band. */
  lazy val lshRecallAudit: String =
    allTrue(Seq("caught_subset_per_band", "perfect_band_fully_caught",
      "total_caught_equals_lsh_pairs"))

  /** E195 cluster audit: canonical min-id labels, LSH components refine
    * the exact components (verified pairs ⊆ exact pairs ⇒ each LSH
    * cluster lies inside ONE exact cluster), keep-one yield bounded by
    * the exact graph's. */
  lazy val minhashClustersAudit: String =
    allTrue(Seq("cluster_label_is_min_id", "clusters_refine_exact",
      "yield_at_most_exact"))

  /** E185 executor audit: sound removals, corpus partition, identical
    * docs caught deterministically (J=1 ⇒ identical band hashes). */
  lazy val minhashDedupExecuteAudit: String =
    allTrue(Seq("identical_pairs_always_caught",
      "kept_plus_removed_partitions_corpus", "removed_subset_of_exact"))

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

  lazy val simhashAudit: String = allTrue(Seq("pairs_equal_bruteforce"))

  lazy val deflateAudit: String =
    allTrue(Seq("bounds_hold", "deterministic", "doubling_compresses"))

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

  /** E135 threshold-sweep twin: the jaccard pair algebra at the 0.1
    * floor, collapsed to floor(10·J) bands. */
  lazy val jaccardHistogram: String =
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

  /** E138 normalized-dedup twin: the identical canonicalization chain
    * (lower → \s+ collapse with the 'g' flag → trim), grouped by the
    * normalized text itself (≡ grouping by its sha256). */
  lazy val dedupNormalized: String =
    raw"""WITH n AS (SELECT doc_id, text,
  COALESCE(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 'null') AS nt
  FROM documents)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS dup_count,
  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw_variants
FROM n GROUP BY nt ORDER BY doc_id"""

  /** E147 degree-histogram twin: the jaccard pair CTEs reduced twice
    * (pairs → per-node degree → histogram). */
  lazy val dupGraphDegrees: String =
    s"""WITH $jaccardCtes,
d AS (SELECT id_a AS id FROM jpairs UNION ALL SELECT id_b FROM jpairs),
deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM d GROUP BY 1)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY 1 ORDER BY degree"""

  /** E124 dedup-yield twin: the dedupClusters recursive-CTE components
    * reduced to the cluster-size histogram, corpus total as a broadcast
    * scalar. */
  lazy val dedupYield: String =
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
}
