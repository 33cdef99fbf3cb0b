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
}
