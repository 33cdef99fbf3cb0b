package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/bandwidth step of a
  * large-scale vector pipeline (a 100 TB float corpus becomes ~25 TB of
  * int8 codes plus one scale per vector; ANN scoring then runs on codes).
  *
  * Symmetric per-vector quantization: `scale = max|x| / 127`,
  * `code_i = sign(x_i) * floor(|x_i| / scale + 0.5)` (explicit half-up —
  * written out rather than `round()` so the Spark and DuckDB twins share
  * one rounding law), reconstruction `x̂_i = code_i * scale`.
  *
  * Scale shape: pure per-row array expressions (higher-order functions,
  * codegen'd) — no shuffle, no UDF; the operator is scan-bound and
  * embarrassingly parallel at any corpus size. Dot products and folds run
  * left-to-right from 0.0, matching DuckDB `list_reduce` bit-for-bit.
  */
object Quantize {

  private def xd(c: Column): Column = c.cast("double")

  /** Per-vector quantization report: `(id, n_dims, scale, code_sum,
    * code_min, code_max, mse)` — scale and MSE rounded to 6 dp for
    * engine-portable output; zero/empty vectors yield null scale and mse
    * (no defined quantization). */
  def int8Scalar(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // scale and codes are MATERIALIZED as columns stage by stage: a lambda
    // body referencing an outer array fold (e.g. `scale` inside the code
    // transform) re-evaluates that fold per ELEMENT — lambda bodies sit
    // outside common-subexpression elimination — turning the linear pass
    // into O(d²) per row
    val v = col("_v")
    val scale = col("_scale")
    val codes = col("_codes")
    val staged = emb
      .select(
        col(idCol), col(vecCol).as("_v"),
        (aggregate(
          transform(col(vecCol), x => abs(xd(x))),
          lit(0.0), (acc, a) => greatest(acc, a)) / lit(127.0)).as("_scale"))
      // codes as int: sign(x) * floor(|x|/scale + 0.5); guarded — with
      // scale = 0 the division would throw under ANSI mode
      .withColumn("_codes",
        when(scale > 0,
          transform(v, x =>
            (signum(xd(x)) * floor(abs(xd(x)) / scale + lit(0.5))).cast("int"))))
    val residSq = zip_with(v, codes, (x, c) => {
      val r = xd(x) - c.cast("double") * scale
      r * r
    })
    val mse = aggregate(residSq, lit(0.0), (acc, r) => acc + r) / size(v)
    staged.select(
      col(idCol),
      size(v).as("n_dims"),
      when(scale > 0, round(scale, 6)).as("scale"),
      when(scale > 0, aggregate(codes, lit(0L), (acc, c) => acc + c)).as("code_sum"),
      when(scale > 0, array_min(codes)).as("code_min"),
      when(scale > 0, array_max(codes)).as("code_max"),
      when(scale > 0, round(mse, 6)).as("mse"))
  }

  /** The deterministic ±1 sign of projection-matrix cell (i, j): +1 iff
    * the first hex character of sha256("jl:i:j") is below '8' (i.e. the
    * digest's top bit is 0 — an unbiased coin). SHA-256 is the
    * cross-engine determinism contract (the dsir precedent): DuckDB's
    * `sha256()` produces the identical lowercase hex, so both engines
    * materialize the SAME matrix without shipping it. */
  /** Product quantization encode (E177) — the Jégou et al. PQ step every
    * billion-vector ANN index (IVF-PQ/FAISS) runs after coarse
    * quantization: split each `dim`-dim vector into `m` contiguous
    * subspaces, encode each sub-vector as the id of its nearest
    * sub-codebook entry, and report the code word plus the total squared
    * reconstruction distortion — 64 floats become `m` small ids, the
    * 100 TB→memory compression that makes vector search tractable.
    *
    * Codebook = the deterministic centroid convention (rows matching
    * `centroidPred`, the E50/E158 seed rule) sliced per subspace — it is
    * metadata-sized and BROADCAST onto the per-subspace vector stream,
    * so encode is one broadcast join + one argmin agg, never a shuffle
    * of the embedding corpus. Determinism: sub-distances are
    * `ROUND(Σ(aᵢ−bᵢ)², 6)` with the left-to-right zip fold both engines
    * share; argmin ties break to the smaller centroid id via the
    * lexicographic struct min; distortion is the DECIMAL(38,6) sum of
    * the m chosen sub-distances.
    *
    * Returns `(id, code, distortion)` — `code` the '-'-joined m
    * sub-codes in subspace order. */
  def productQuantize(
      emb: DataFrame, idCol: String, vecCol: String,
      centroidPred: Column, m: Int = 8): DataFrame = {
    require(m >= 1)
    // Loud pre-flight dim probe (ADVICE r11): slice(_v, s*(d div m)+1, d div m)
    // silently drops the trailing d mod m dims from codes AND distortion, and
    // d < m encodes everything to sub-code 0 with zero distortion. Malformed
    // inputs must fail, not return wrong codes.
    val dimProbe = emb.where(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).take(1)
    require(dimProbe.nonEmpty, "productQuantize: no non-null vectors to probe")
    val d0 = dimProbe.head.getInt(0)
    require(d0 >= m && d0 % m == 0,
      s"productQuantize: dim=$d0 is not divisible into m=$m equal subspaces")
    val dec6 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    def subs(df: DataFrame, outId: String) = df
      .select(col(idCol).as(outId), col(vecCol).as("_v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col(outId), col("s"),
        expr(s"slice(_v, s * (size(_v) div $m) + 1, size(_v) div $m)")
          .as(s"_sub_$outId"))
    val vecSub = subs(emb, "vid")
    val cenSub = subs(emb.where(centroidPred), "cid")
    val d = round(
      aggregate(
        zip_with(col("_sub_vid"), col("_sub_cid"),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => acc + x), 6)
    vecSub
      .join(broadcast(cenSub), Seq("s"))
      .select(col("vid"), col("s"), col("cid"), d.as("d"))
      .groupBy("vid", "s")
      .agg(min(struct(col("d"), col("cid"))).as("best"))
      .groupBy("vid")
      .agg(
        concat_ws("-", transform(
          array_sort(collect_list(struct(col("s"), col("best.cid").as("c")))),
          x => x.getField("c").cast("string"))).as("code"),
        round(sum(col("best.d").cast(dec6)).cast("double"), 6)
          .as("distortion"))
      .withColumnRenamed("vid", idCol)
  }

  private[operators] def jlSign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s"jl:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** Deterministic Johnson–Lindenstrauss random projection (E165) — the
    * dimensionality-reduction step ahead of ANN indexing / clustering at
    * corpus scale: project each `d`-dim vector onto `outDims` ±1
    * hyperplanes (Achlioptas' database-friendly JL construction, signs
    * drawn from SHA-256 so both engines regenerate the identical matrix)
    * and scale by 1/√outDims, preserving pairwise distances within the
    * JL bound in expectation. A 64→16 projection cuts ANN scoring and
    * index memory 4× before any quantization.
    *
    * Scale shape: pure per-row codegen'd array folds — no shuffle, no
    * UDF, the projection matrix rides as a broadcast-free literal.
    * Determinism: products are float→double exact sign flips; each
    * output coordinate is ONE left-to-right fold from 0.0 (the
    * list_reduce contract), divided by √outDims and rounded 6-dp.
    * Vectors shorter than the probed dimensionality project to null
    * coordinates (zip_with's null padding propagates through the fold) —
    * surfaced, not silently truncated.
    *
    * Returns `(id, dim, value)`, one row per output coordinate. */
  def randomProject(
      emb: DataFrame, idCol: String, vecCol: String,
      outDims: Int = 16): DataFrame = {
    require(outDims > 0, "need a positive output dimensionality")
    val probe = emb.where(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).head()
    val d = probe.getInt(0)
    val scale = math.sqrt(outDims.toDouble)
    val projCols = (0 until outDims).map { j =>
      val signs = (0 until d).map(i => jlSign(i, j))
      round(
        aggregate(
          zip_with(col(vecCol), typedlit(signs), (x, s) => x.cast("double") * s),
          lit(0.0), (acc, x) => acc + x) / lit(scale),
        6)
    }
    emb.select(col(idCol),
      posexplode(array(projCols: _*)).as(Seq("dim", "value")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("value"))
  }
}
