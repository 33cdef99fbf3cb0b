package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted join — the manual remedy when one join key is hot enough
  * that a single reducer would receive a task-breaking share of the rows
  * (the condition [[graft.profiler.Checks.keySkew]] diagnoses) and AQE's
  * runtime skew split cannot apply (e.g. the skewed side feeds an
  * aggregation, or the planner lacks stats).
  *
  * The classic construction: every row of the SKEWED side gets a salt in
  * `[0, salts)` derived from a hash of the full row's key occurrence —
  * here `pmod(hash(monotonic row id), salts)` is deliberately NOT used
  * because it is partitioning-dependent; instead the salt hashes the
  * row's own key together with a per-row discriminator column the caller
  * names (any unique id). The REPLICATED side is exploded `salts` times.
  * The join key becomes `(key, salt)`, splitting each hot key's rows
  * across `salts` reducers. Result set is EXACTLY the plain join's (each
  * skewed row matches the single replicated copy carrying its salt).
  */
object Skew {

  /** Inner equi-join of `skewed` and `replicated` on `keyCol`, salted
    * `salts` ways. `idCol` is any column of `skewed` unique per row (used
    * only to derive a deterministic, partitioning-independent salt). */
  def saltedJoin(
      skewed: DataFrame,
      replicated: DataFrame,
      keyCol: String,
      idCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn(
      "_salt", pmod(hash(col(keyCol), col(idCol)), lit(salts)))
    val expanded = replicated.withColumn(
      "_salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(expanded, Seq(keyCol, "_salt")).drop("_salt")
  }
}
