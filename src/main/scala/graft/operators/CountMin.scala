package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** Count-min sketch frequency estimation (E242) — Cormode & Muthukrishnan
  * '05 ("An improved data stream summary: the count-min sketch and its
  * applications"): d hash rows × w buckets of counters; a token's
  * estimated frequency is the MIN over its d cells, an overestimate
  * bounded by εN with probability 1−δ (ε = e/w, δ = e^−d). The sketch is
  * the missing member of the mergeable-summary shelf next to HLL (E163),
  * KLL (E19), Bloom (E69) and Misra-Gries (E91): MG answers "which keys
  * are heavy", CMS answers "how often does THIS key occur" for any key,
  * in O(d·w) state.
  *
  * Determinism contract: the d row-hash functions are affine maps
  * `((a_i · h + b_i) mod p) mod w` over the engine's codegen polynomial
  * [[graft.functions.RollingHash]] (p = 2^31−1, the Mersenne modulus),
  * so every cell index — and therefore every counter and every estimate —
  * is integer algebra both engines compute bit-identically; the audit
  * joins the estimates against EXACT counts, making the CMS overestimate
  * (est − exact ≥ 0, the sketch's one-sided error guarantee) a
  * hash-verifiable relation rather than a trusted property.
  *
  * Scale shape: one explode + one hash-aggregate per token (the
  * vocab-top-k shape, map-side combined); the sketch itself is a second
  * aggregate over ≤ d·w cells — FIXED state regardless of corpus size,
  * which is the entire point of the sketch at 100 TB: the cell relation
  * that merges across 1000 executors is d·w rows, not |vocab|. The audit
  * join carries only the top-N exact tokens (broadcast-sized).
  *
  * Cites reference scope: the reference's approximate shelf is Deequ's
  * HLL approx_count_distinct only (Profiler.scala:181) — extension per
  * SURVEY §2.E. */
object CountMin {

  /** 2^31 − 1, shared with [[RollingHash.Modulus]]. */
  final val P: Long = RollingHash.Modulus

  /** Row-hash coefficients (a_i, b_i) — d = 3 affine maps. */
  final val RowCoeffs: Seq[(Long, Long)] = Seq((31L, 7L), (131L, 101L), (1031L, 997L))

  /** Estimate-vs-exact audit relation over the top-N exact-frequency
    * whitespace tokens: `(token, exact_n, cms_est, overest, tight)` with
    * `overest = cms_est − exact_n ≥ 0` by the CMS guarantee. `w` is the
    * bucket count per row. */
  def cmsFrequencyAudit(
      docs: DataFrame,
      textCol: String,
      w: Int = 64,
      topN: Int = 30): DataFrame = {
    require(w > 1 && topN > 0, s"cmsFrequencyAudit: w=$w topN=$topN")
    RollingHash.register(docs.sparkSession)
    // exact per-token counts: the audit's ground truth AND the sketch's
    // input (summing counts per cell ≡ counting occurrences per cell —
    // CMS updates commute)
    val exact = docs
      .select(explode(split(col(textCol), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("exact_n"))
      .withColumn("rh", expr("rolling_hash(token)"))
      .localCheckpoint(true) // three consumers: sketch, top-N, estimate join
    val rows = RowCoeffs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row_i"),
        (((lit(a) * col("rh") + lit(b)) % P) % w).as("bucket"))
    }
    val cells = exact
      .select(col("exact_n"), explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.row_i").as("row_i"), col("cell.bucket").as("bucket"))
      .agg(sum("exact_n").as("cell_n"))
    val top = exact
      .orderBy(col("exact_n").desc, col("token").asc)
      .limit(topN)
    top
      .select(col("token"), col("exact_n"), explode(array(rows: _*)).as("cell"))
      .join(cells,
        col("cell.row_i") === cells("row_i") && col("cell.bucket") === cells("bucket"))
      .groupBy("token")
      .agg(max("exact_n").as("exact_n"), min("cell_n").as("cms_est"))
      .withColumn("overest", col("cms_est") - col("exact_n"))
      .withColumn("tight", col("overest") === 0L)
  }
}
