package graft

/** OracleSql — Similarity lane (split from the former 4.5k-line
  * monolith, VERDICT r13 task 5). Self-typed to the aggregator so
  * slices reference each other freely; every val is lazy so init
  * order is demand-driven regardless of trait linearization. */
private[graft] trait OracleSqlSimilarity { this: OracleSql.type =>
  import Lineitem._
  import graft.functions.TextFunctions.{BpeishPattern, PunctPattern, Stopwords}

  /** Left-fold double dot product — matches Spark `aggregate` (0.0 seed,
    * left-to-right) bit-for-bit. */
  private[graft] def listDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"

  private[graft] def listNorm(a: String): String =
    s"SQRT(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"

  /** Brute-force cosine top-10 per query vector (query set = vec_id % 97 = 0),
    * ranked on the 6-dp-rounded cosine with id tie-break. */
  lazy val annCosineTopK: String =
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 = 0)
SELECT query_id, neighbor_id, cos FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
    ROUND(${listDot("q.embedding", "e.embedding")} / (${listNorm("q.embedding")} * ${listNorm("e.embedding")}), 6) AS cos
  FROM q CROSS JOIN embeddings e) t
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) <= 10
ORDER BY query_id, neighbor_id"""

  /** Top-50 closest embedding pairs — the near-dup review list (exact
    * pairwise twin of Similarity.cosineNearDupPairs). */
  lazy val dedupEmbeddingCosine: String =
    s"""SELECT id_a, id_b, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(${listDot("a.embedding", "b.embedding")} / (${listNorm("a.embedding")} * ${listNorm("b.embedding")}), 6) AS cos
  FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id) t
ORDER BY cos DESC, id_a, id_b LIMIT 50"""

  /** Nearest-centroid twin: same fold dot/norm, rank 1 per vector on
    * (6-dp cosine DESC, centroid_id ASC). */
  lazy val knnAssign: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
s AS (SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0)
SELECT vec_id, centroid_id, cos FROM s
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1
ORDER BY vec_id"""

  /** E229 SSL-prototypes pruning twin: the knn_assign cell structure
    * (rank-1 centroid per vector on the 6-dp cosine), hardest-first
    * per-cluster rank (cos ASC, vec_id), and the integer keep quota
    * `rnk ≤ ceil(0.7 · n_cluster)`. The index-served key shares this
    * SQL — the artifact path is bit-identical by the E221 contract. */
  lazy val prototypePrune: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
a AS (SELECT vec_id, centroid_id, cos FROM (
  SELECT e.vec_id, c.centroid_id,
    ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS cos
  FROM embeddings e CROSS JOIN c
  WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) = 1),
r AS (SELECT vec_id, centroid_id, cos,
    CAST(ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY cos ASC, vec_id) AS BIGINT) AS rnk,
    CAST(COUNT(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS n_cluster
  FROM a)
SELECT vec_id, centroid_id, cos, rnk, n_cluster,
  (rnk <= CAST(CEIL(0.7 * n_cluster) AS BIGINT)) AS keep
FROM r ORDER BY vec_id"""

  /** IVF twin: the knn_assign cell structure (rank-1 centroid per vector),
    * rank-≤2 probe list per query, exact cosine only inside probed cells,
    * top-10 on (6-dp cosine DESC, id ASC) — deterministic approximation,
    * reproduced exactly. */
  lazy val ivfTopK: String =
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

  /** E252 KNN-Shapley twin: the %97 test slice vs the train remainder,
    * 6-dp cosine rank per test point, the closed-form suffix sum
    * (`Δ = (ind_i − ind_{i+1}) / max(K, rnk)`, base `ind_N / N`) with
    * 12-dp DECIMAL(38,12) terms (exact order-free window sum — raw
    * doubles diverge: Spark sums sequentially, DuckDB by segment
    * tree), 6-dp per-test values, and the cross-test mean as exact
    * integer micros (`floor((2Σµ + n) / 2n)` — the E232 discipline;
    * a 6-dp sum over small |Q| hits the 7th-digit half boundary
    * densely). */
  lazy val knnShapley: String =
    s"""WITH e AS (SELECT vec_id, embedding, CAST(label AS BIGINT) AS lbl FROM embeddings),
q AS (SELECT vec_id AS tid, embedding AS tv, lbl AS tl FROM e WHERE vec_id % 97 = 0),
tr AS (SELECT * FROM e WHERE vec_id % 97 <> 0),
p AS (SELECT q.tid, t.vec_id AS vid,
    ROUND(${listDot("t.embedding", "q.tv")} / (${listNorm("t.embedding")} * ${listNorm("q.tv")}), 6) AS cos,
    CASE WHEN t.lbl = q.tl THEN 1 ELSE 0 END AS ind
  FROM tr t CROSS JOIN q
  WHERE ${listNorm("t.embedding")} * ${listNorm("q.tv")} > 0),
r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY tid ORDER BY cos DESC, vid) AS BIGINT) AS rnk,
    CAST(COUNT(*) OVER (PARTITION BY tid) AS BIGINT) AS n
  FROM p),
l AS (SELECT *, LEAD(ind) OVER (PARTITION BY tid ORDER BY rnk) AS nind FROM r),
t2 AS (SELECT tid, vid, rnk,
    CAST(ROUND(CASE WHEN rnk = n THEN CAST(ind AS DOUBLE) / CAST(n AS DOUBLE)
         ELSE CAST(ind - nind AS DOUBLE) / GREATEST(10.0, CAST(rnk AS DOUBLE)) END, 12) AS DECIMAL(38,12)) AS term
  FROM l),
s AS (SELECT tid, vid,
    ROUND(CAST(SUM(term) OVER (PARTITION BY tid ORDER BY rnk DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS sv
  FROM t2),
sm AS (SELECT vid, CAST(ROUND(sv * 1000000.0) AS BIGINT) AS svu FROM s)
SELECT vid AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_tests,
  CAST(FLOOR(CAST(2 * SUM(svu) + COUNT(*) AS DOUBLE)
    / CAST(2 * COUNT(*) AS DOUBLE)) AS DOUBLE) / 1000000.0 AS shapley
FROM sm GROUP BY vid ORDER BY vec_id"""

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
  lazy val embeddingQuantize: String =
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

  /** Centroid-update twin: the knn_assign rank-1 assignment, per-(cell,
    * dim) sums of DECIMAL(38,12)-quantized addends (the lm_quality
    * contract: round the double to 12 places, then cast — identical in
    * both engines), ONE double division at the end. */
  lazy val centroidUpdate: String =
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

  /** Embedding-corpus QA twin: same norm fold, same round-then-cast
    * DECIMAL(38,12) mean contract. */
  lazy val embeddingStats: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(COUNT(*) - COUNT(nrm) AS BIGINT) AS null_vec_count,
  CAST(MIN(nd) AS INT) AS dims_min, CAST(MAX(nd) AS INT) AS dims_max,
  CAST(COUNT(CASE WHEN nrm = 0 THEN 1 END) AS BIGINT) AS zero_norm_count,
  ROUND(MIN(nrm), 6) AS norm_min, ROUND(MAX(nrm), 6) AS norm_max,
  ROUND(CAST(SUM(CAST(ROUND(nrm, 12) AS DECIMAL(38,12))) AS DOUBLE) / CAST(COUNT(nrm) AS DOUBLE), 6) AS norm_mean
FROM (SELECT len(embedding) AS nd, ${listNorm("embedding")} AS nrm FROM embeddings) t"""

  /** E221 persisted-IVF-index audit: artifact-served search ≡ in-plan
    * recompute (ivf_topk and the ANN hard-negative miner), split-build
    * + batch append ≡ whole build, row-count sidecars correct. */
  lazy val ivfFromIndexAudit: String = allTrue(Seq(
    "append_equals_whole", "artifact_equals_inplan",
    "hard_negatives_from_index_parity", "meta_counts_match"))

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

  /** E165 deterministic JL projection twin (r11): the identical sha256
    * sign matrix regenerated in SQL, the identical left-to-right fold
    * (list_reduce; Spark's fold starts 0.0 + x₁ = x₁), 1/√16 scale. */
  lazy val embeddingProject: String =
    """WITH s AS (
  SELECT j, list(CASE WHEN substr(sha256('jl:' || CAST(i AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1) < '8' THEN 1.0 ELSE -1.0 END ORDER BY i) AS sv
  FROM range(64) t1(i) CROSS JOIN range(16) t2(j) GROUP BY j)
SELECT vec_id, CAST(j AS BIGINT) AS dim,
  ROUND(list_reduce(list_transform(list_zip(embedding, sv), z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b) / 4.0, 6) AS value
FROM embeddings CROSS JOIN s
ORDER BY vec_id, dim"""

  /** E168 hard-negative mining twin (r11): brute-force cosine with the
    * label-inequality predicate before the per-query top-k. */
  lazy val hardNegatives: String =
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
  lazy val hardNegativesAnn: String =
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
  lazy val hardNegativesAnnAudit: String = allTrue(Seq(
    "cos_exact_recompute", "labels_disjoint", "planted_twin_caught"))

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

  lazy val annLshAudit: String =
    allTrue(Seq("cos_exact_recompute", "rank_dominance", "ranks_in_bruteforce"))

  /** E130 per-dimension embedding twin: 1-indexed list subscripts over a
    * 0-based range (UNNEST WITH ORDINALITY is unavailable), float→double
    * widening exact, means on the DECIMAL(38,12) addend contract. */
  lazy val embeddingDimStats: String =
    """WITH v AS (
  SELECT i AS dim, CAST(e[i + 1] AS DOUBLE) AS x
  FROM (SELECT embedding AS e FROM embeddings) q, UNNEST(range(len(e))) t(i))
SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(SUM(CAST(ROUND(x, 12) AS DECIMAL(38,12))) AS DOUBLE) / COUNT(x), 6) AS mean,
  ROUND(MIN(x), 6) AS min_x,
  ROUND(MAX(x), 6) AS max_x,
  CAST(COUNT(CASE WHEN x = 0 THEN 1 END) AS BIGINT) AS n_zero
FROM v GROUP BY dim ORDER BY dim"""

  /** E143 cluster-balance twin: the knnAssign cells reduced to the
    * quantized-entropy report; h and exp(h) from the same expression. */
  lazy val clusterBalance: String = {
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

  /** E148 effective-dims twin: per-dim decimal sums → fixed-order σ²
    * algebra → re-quantized variance sums → participation ratio. */
  lazy val effectiveDims: String = {
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

  /** PQ-encode twin (E177): per-subspace list slices, the shared
    * left-to-right zip fold for the squared distance (ROUND 6), QUALIFY
    * argmin with centroid-id tie-break, ordered code join and the
    * DECIMAL(38,6) distortion sum. */
  lazy val embeddingPq: String =
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

  /** E225 greedy k-center coreset twin: the Gonzalez incremental form
    * replayed in chained CTEs — seed = smallest id, each step keeps the
    * running `GREATEST(prev, ROUND(cos-to-newest, 6))` relation,
    * excludes the pick, and selects the argmin by the total
    * (mcos ASC, vec_id ASC) order — the same 6-dp cosine and tie-break
    * the Spark loop applies step by step. */
  lazy val kcenterCoreset: String = {
    val k = 8
    val steps = (1 until k).map { t =>
      val prev = s"m${t - 1}"
      s"""p$t AS (SELECT vec_id, mcos FROM $prev ORDER BY mcos ASC, vec_id LIMIT 1),
c$t AS MATERIALIZED (SELECT e.vec_id, e.v, e.nv, p$t.mcos
  FROM e JOIN p$t USING (vec_id)),
m$t AS MATERIALIZED (SELECT m.vec_id, m.v, m.nv,
    GREATEST(m.mcos, ROUND(${listDot("m.v", "c.v")} / (m.nv * c.nv), 6)) AS mcos
  FROM $prev m, c$t c WHERE m.vec_id <> c.vec_id)"""
    }.mkString(",\n")
    val rows = (1 until k)
      .map(t => s"UNION ALL SELECT CAST($t AS BIGINT), vec_id, mcos FROM c$t")
      .mkString("\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding AS v, ${listNorm("embedding")} AS nv
  FROM embeddings WHERE ${listNorm("embedding")} > 0),
c0 AS MATERIALIZED (SELECT vec_id, v, nv FROM e ORDER BY vec_id LIMIT 1),
m0 AS MATERIALIZED (SELECT e.vec_id, e.v, e.nv,
    ROUND(${listDot("e.v", "c.v")} / (e.nv * c.nv), 6) AS mcos
  FROM e, c0 c WHERE e.vec_id <> c.vec_id),
$steps
SELECT CAST(0 AS BIGINT) AS step, vec_id, CAST(NULL AS DOUBLE) AS max_cos_prev FROM c0
$rows
ORDER BY step"""
  }

  /** E240 bitext-mining twin: the cross-set 6-dp cosine relation, k=4
    * forward/backward k-NN means as exact DECIMAL(38,6) sums of the
    * rounded cosines (the GroupDRO sum discipline), the ratio margin on
    * the 6-dp means, best candidate per source and the 1.02 threshold
    * verdict. */
  /** Margin chain shared by the brute and index-served bitext twins:
    * QUALIFY top-k both directions over `sc`, decimal k-NN means, the
    * ratio-margin division, per-source argmax, threshold verdict. */
  private def bitextMarginChain(threshold: String): String =
    s"""cand AS (SELECT * FROM sc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos DESC, tgt_id) <= 4),
favg AS (SELECT src_id,
    ROUND(CAST(SUM(CAST(cos AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_fwd
  FROM cand GROUP BY src_id),
btop AS (SELECT * FROM sc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos DESC, src_id) <= 4),
bavg AS (SELECT tgt_id,
    ROUND(CAST(SUM(CAST(cos AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS avg_bwd
  FROM btop GROUP BY tgt_id),
m AS (SELECT c.src_id, c.tgt_id, c.cos, f.avg_fwd, b.avg_bwd,
    ROUND(c.cos / ((f.avg_fwd + b.avg_bwd) / 2.0), 6) AS margin
  FROM cand c JOIN favg f USING (src_id) JOIN bavg b USING (tgt_id)
  WHERE f.avg_fwd + b.avg_bwd <> 0.0)
SELECT src_id, tgt_id, cos, avg_fwd, avg_bwd, margin,
  (margin >= $threshold) AS accepted
FROM m
QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) = 1
ORDER BY src_id"""

  lazy val bitextMine: String =
    s"""WITH src AS (SELECT vec_id AS src_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
tgt AS (SELECT vec_id AS tgt_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
sc AS (
  SELECT s.src_id, t.tgt_id,
    ROUND(${listDot("s.embedding", "t.embedding")} / (${listNorm("s.embedding")} * ${listNorm("t.embedding")}), 6) AS cos
  FROM src s CROSS JOIN tgt t
  WHERE ${listNorm("s.embedding")} * ${listNorm("t.embedding")} > 0),
${bitextMarginChain("1.22")}"""

  /** E246 index-served bitext twin: candidates restricted to the src's
    * top-2 probed cells (the ivfTopK cell CTEs over the %83 quantizer),
    * then the SAME margin chain — the approximation's verdict replayed
    * as its own fixed point. */
  lazy val bitextFromIndex: String =
    s"""WITH c AS (SELECT vec_id AS centroid_id, embedding FROM embeddings WHERE vec_id % 83 = 0),
src AS (SELECT vec_id AS src_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
probes AS (SELECT src_id, centroid_id FROM (
    SELECT s.src_id, c.centroid_id,
      ROUND(${listDot("s.embedding", "c.embedding")} / (${listNorm("s.embedding")} * ${listNorm("c.embedding")}), 6) AS qcos
    FROM src s CROSS JOIN c
    WHERE ${listNorm("s.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY qcos DESC, centroid_id) <= 2),
a AS (SELECT vec_id AS tgt_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      ROUND(${listDot("e.embedding", "c.embedding")} / (${listNorm("e.embedding")} * ${listNorm("c.embedding")}), 6) AS acos_
    FROM embeddings e CROSS JOIN c
    WHERE ${listNorm("e.embedding")} * ${listNorm("c.embedding")} > 0) t
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY acos_ DESC, centroid_id) = 1),
tgt AS (SELECT vec_id AS tgt_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
sc AS (
  SELECT p.src_id, t.tgt_id,
    ROUND(${listDot("s.embedding", "t.embedding")} / (${listNorm("s.embedding")} * ${listNorm("t.embedding")}), 6) AS cos
  FROM probes p JOIN a USING (centroid_id) JOIN tgt t USING (tgt_id)
  JOIN src s USING (src_id)
  WHERE ${listNorm("s.embedding")} * ${listNorm("t.embedding")} > 0),
${bitextMarginChain("1.22")}"""

  /** E244 semantic-decontamination twin: the knn_assign cell structure
    * (rank-1 eval vector per corpus vector on the 6-dp cosine, ties to
    * the smaller eval id) with the eval set excluded from the corpus
    * side, plus the 0.9 contamination verdict. */
  lazy val semanticContamination: String =
    s"""WITH ev AS (SELECT vec_id AS eval_id, embedding FROM embeddings WHERE vec_id % 97 = 0),
c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 97 <> 0),
sc AS (
  SELECT c.vec_id, ev.eval_id,
    ROUND(${listDot("c.embedding", "ev.embedding")} / (${listNorm("c.embedding")} * ${listNorm("ev.embedding")}), 6) AS cos
  FROM c CROSS JOIN ev
  WHERE ${listNorm("c.embedding")} * ${listNorm("ev.embedding")} > 0)
SELECT vec_id, eval_id, cos,
  (cos >= 0.9) AS contaminated, NOT (cos >= 0.9) AS keep
FROM sc
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) = 1
ORDER BY vec_id"""
}
