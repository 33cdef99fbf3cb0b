package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity matching (E101) — record linkage on structured
  * keys: dirty ingest names/ids matched to a clean reference by edit
  * distance. This is the ENTITY-RESOLUTION face of dedup, distinct from
  * the text near-dup family (E2-E5): keys are short strings where one
  * typo matters, so the measure is Levenshtein, not shingle Jaccard.
  *
  * Scale shape — the classic blocking design: candidates come from an
  * EQUI-join on a cheap block key (lowercased key prefix), so the
  * quadratic all-pairs comparison never exists; Levenshtein (codegen'd
  * built-in) runs only inside blocks, and the result keeps every pair
  * within `maxDist` (a candidate REVIEW relation, like E5's). A
  * degenerate block (every key sharing one prefix) would regrow the
  * quadratic, so `maxBlockFreq` caps the REFERENCE side per block —
  * capped blocks are dropped loudly via the companion diagnostics count,
  * the E5 cap-visibility contract. Blocking recall: a typo INSIDE the
  * first `blockLen` chars escapes its block (standard trade; run a
  * second pass with a different block, e.g. a suffix, for higher
  * recall). */
object FuzzyJoin {

  /** Returns `(left_id, right_id, dist)` for every candidate pair with
    * `levenshtein <= maxDist`, block = lower prefix of length
    * `blockLen`. Null keys never match. */
  def fuzzyMatch(
      left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      leftKey: String, rightKey: String,
      blockLen: Int, maxDist: Int,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame = {
    require(blockLen >= 1, "blockLen must be positive")
    require(maxDist >= 0, "maxDist must be non-negative")
    val l = left.select(
      col(leftId).as("left_id"), col(leftKey).as("lk"),
      lower(substring(col(leftKey), 1, blockLen)).as("block"))
      .where(col("lk").isNotNull)
    val r0 = right.select(
      col(rightId).as("right_id"), col(rightKey).as("rk"),
      lower(substring(col(rightKey), 1, blockLen)).as("block"))
      .where(col("rk").isNotNull)
    val r = maxBlockFreq match {
      case Some(cap) =>
        val ok = r0.groupBy("block").agg(count(lit(1)).as("bf"))
          .where(col("bf") <= cap).select("block")
        r0.join(ok, "block")
      case None => r0
    }
    l.join(r, "block")
      .where(levenshtein(col("lk"), col("rk")) <= maxDist)
      .select(col("left_id"), col("right_id"),
        levenshtein(col("lk"), col("rk")).as("dist"))
  }

  /** Diagnostic twin of the hot-block cap (the E5 visibility contract):
    * one row — blocks dropped by `cap` and the reference rows they held. */
  def fuzzyMatchDiagnostics(
      right: DataFrame, rightKey: String,
      blockLen: Int, cap: Int): DataFrame =
    right.select(lower(substring(col(rightKey), 1, blockLen)).as("block"))
      .where(col(rightKey).isNotNull)
      .groupBy("block").agg(count(lit(1)).as("bf"))
      .agg(
        count(when(col("bf") > cap, 1)).as("blocks_dropped"),
        coalesce(sum(when(col("bf") > cap, col("bf"))), lit(0L))
          .as("rows_in_dropped_blocks"))
}
