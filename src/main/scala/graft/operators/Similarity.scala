package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the classic ANN playbook:
  *   - [[cosineTopK]]: exact brute force — broadcast the (small) query set
  *     against the corpus, fold the dot product with higher-order array
  *     functions (codegen'd, no UDF), rank per query. The baseline every
  *     approximate method is measured against.
  *   - [[lshTopK]]: random-hyperplane LSH — a deterministic ±1 projection
  *     matrix buckets vectors by sign pattern; only same-bucket pairs are
  *     scored. At 100 TB the bucket join replaces the full cross product;
  *     recall follows the hyperplane S-curve and is tunable via `planes`.
  *
  * Determinism: dot products fold left-to-right from 0.0 (Spark `aggregate`
  * semantics), matching DuckDB `list_reduce` exactly; ranking uses the
  * 6-dp-rounded cosine with neighbor id as tie-break, so the top-k cut is
  * stable across engines and partitionings.
  */
object Similarity {

  /** Left-to-right dot product of two float-array columns in double —
    * higher-order-function form (no session needed). The scoring loops use
    * the bit-identical but faster codegen [[graft.functions.VectorDot]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen dot/norm (bit-identical to the forms above). */
  private def fdot(a: Column, b: Column): Column = graft.functions.VectorOps.vectorDot(a, b)
  private def fnorm(a: Column): Column = sqrt(fdot(a, a))

  /** 6-dp cosine, null for zero-norm vectors: under default ANSI mode an
    * unguarded `dot / 0` throws DIVIDE_BY_ZERO and fails the whole query;
    * zero vectors have no defined direction, so their pairs are dropped by
    * the callers' `isNotNull` filters (the oracle filters identically). */
  private def safeCos(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na * nb > 0, round(fdot(a, b) / (na * nb), 6))

  /** Exact brute-force cosine top-k: `queries` (selected by `queryPred`, a
    * small set) are broadcast against every corpus vector; per-query top-k
    * by (rounded cosine desc, id asc). Output
    * `(query_id, neighbor_id, cos)`. */
  def cosineTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int = 10): DataFrame = {
    graft.functions.VectorOps.register(emb.sparkSession)
    // norms are per-vector, not per-pair: compute them once before the join
    // (3x fewer array folds in the O(|Q|·n) scoring loop, same values)
    val corpus = emb.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v"), fnorm(col(vecCol)).as("nv"))
    val queries = emb.where(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("q"), fnorm(col(vecCol)).as("nq"))
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col("query_id"), col("neighbor_id"),
        safeCos(col("q"), col("v"), col("nq"), col("nv")).as("cos"))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }

  /** Embedding near-duplicate review list: the `top` closest pairs by
    * cosine across the whole corpus (id_a < id_b), ranked on the rounded
    * cosine with id tie-breaks. Exact O(n²) pairwise — correct baseline and
    * fine for corpus samples; at 100 TB the same review list comes from
    * [[lshTopK]] candidates instead of the full cross join. One side is
    * broadcast: the pair generation never shuffles the corpus. */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      top: Int = 50): DataFrame = {
    graft.functions.VectorOps.register(emb.sparkSession)
    val a = emb.select(
      col(idCol).as("id_a"), col(vecCol).as("va"), fnorm(col(vecCol)).as("na"))
    val b = emb.select(
      col(idCol).as("id_b"), col(vecCol).as("vb"), fnorm(col(vecCol)).as("nb"))
    a.crossJoin(broadcast(b))
      .where(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        safeCos(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .where(col("cos").isNotNull)
      .orderBy(col("cos").desc, col("id_a").asc, col("id_b").asc)
      .limit(top)
  }

  /** Deterministic ±1 hyperplane matrix: sign from a splitmix64-style hash
    * of (plane, dim) — reproducible everywhere, no RNG state. */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
      z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
      z ^= z >>> 27; z *= 0x94D049BB133111EBL
      z ^= z >>> 31
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign-pattern bucket id of a vector under the hyperplane matrix. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val proj = aggregate(
        zip_with(vec, array(plane.map(lit).toIndexedSeq: _*), (x, s) => x.cast("double") * s),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate cosine top-k: score only (query, vector) pairs that share
    * an LSH bucket. Same output shape and ranking rule as [[cosineTopK]];
    * recall < 1 by design. */
  def lshTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int = 10,
      planes: Int = 8,
      dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    graft.functions.VectorOps.register(emb.sparkSession)
    val bucketed = emb.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v"), fnorm(col(vecCol)).as("nv"),
      lshBucket(col(vecCol), hp).as("bucket"))
    val queries = bucketed.where(queryPred)
      .select(
        col("neighbor_id").as("query_id"), col("v").as("q"),
        col("nv").as("nq"), col("bucket"))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .select(
        col("query_id"), col("neighbor_id"),
        safeCos(col("q"), col("v"), col("nq"), col("nv")).as("cos"))
      .where(col("cos").isNotNull)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos")
  }
}
