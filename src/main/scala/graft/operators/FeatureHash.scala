package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RollingHash

/** Signed feature hashing (E248) — Weinberger et al. '09 ("Feature
  * hashing for large scale multitask learning", the HashingTF shape
  * with the sign trick): every token maps to a fixed-dimension bucket
  * by hash, with a second hash bit choosing ±1 so collisions cancel in
  * expectation instead of biasing counts upward. The result is a dense
  * unit vector per document from raw text with NO vocabulary state —
  * the bridge that feeds the embedding shelf (ANN E6, SemDeDup E158,
  * semantic decontamination E244, bitext E240) on corpora that carry
  * no model embeddings.
  *
  * Determinism contract: bucket = `h mod dims`, sign from the bit just
  * ABOVE the bucket field (`(h div dims) mod 2` — a bit inside `h mod
  * dims` would make the sign a function of the bucket, so same-bucket
  * collisions could never cancel), h = the codegen polynomial
  * [[graft.functions.RollingHash]] both engines fold identically;
  * per-bucket sums are exact integers, the l2 norm is a FIXED-ORDER
  * sum of squares, and each coordinate is one rounded IEEE division —
  * so the vectors hash-match cell for cell.
  *
  * Scale shape: one explode + one map-side-combined hash aggregate per
  * document (the shuffle carries one row per doc per partition, with
  * `dims` integer cells); everything downstream of the aggregate is a
  * scan projection. Zero vectors (total sign cancellation — no
  * direction) are dropped, mirrored by the oracle's norm filter. */
object FeatureHash {

  /** Per-document l2-normalized signed-hash vector as `dims` scalar
    * columns `v0..v{dims-1}` (scalar columns keep the relation
    * hash-comparable cell-by-cell). */
  def textFeatureHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int = 16): DataFrame = {
    require(dims > 1, s"textFeatureHash: dims=$dims")
    RollingHash.register(docs.sparkSession)
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
      .withColumn("rh", expr("rolling_hash(token)"))
      .withColumn("bucket", col("rh") % dims)
      .withColumn("sign",
        when(expr(s"(rh div $dims) % 2") === 0, lit(1L)).otherwise(lit(-1L)))
    val sumCols = (0 until dims).map(b =>
      sum(when(col("bucket") === b, col("sign")).otherwise(lit(0L)))
        .as(s"f$b"))
    val sums = toks.groupBy(col(idCol)).agg(sumCols.head, sumCols.tail: _*)
    // fixed-order sum of squares — integer adds, order-free and exact
    val norm = sqrt((0 until dims)
      .map(b => col(s"f$b") * col(s"f$b"))
      .reduce(_ + _).cast("double"))
    sums
      .withColumn("nrm", norm)
      .where(col("nrm") > 0)
      .select(col(idCol) +: (0 until dims).map(b =>
        round(col(s"f$b") / col("nrm"), 6).as(s"v$b")): _*)
  }
}
