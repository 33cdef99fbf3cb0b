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

  /** Sorted-neighborhood entity resolution (E249) — Hernández & Stolfo
    * '95: where [[fuzzyMatch]] compares ALL pairs inside an equality
    * block, the sorted-neighborhood method sorts records by a key and
    * compares each record only to its `window` nearest neighbors in
    * sort order — the classic merge/purge pass that catches pairs an
    * all-pairs block would price out, at a guaranteed ≤ window
    * comparisons per record.
    *
    * Scale shape: the textbook method sorts GLOBALLY, which on a
    * cluster is a single-partition window — the anti-pattern. This
    * implementation keys the sort by a block prefix (the fuzzyMatch
    * blocking convention) and ranks WITHIN blocks, so the plan is ONE
    * exchange on the block key and the neighborhood pairing is a
    * rank-band self-join inside each block (`0 < rank_b − rank_a ≤
    * window`) — per-record work stays ≤ window, and a cross-block typo
    * escapes exactly as it does in blocked fuzzyMatch (run a second
    * pass on a different key for recall, the standard multi-pass SNM).
    *
    * Output: `(id_a, id_b, dist, matched)` for every in-window pair,
    * `matched = dist ≤ maxDist` — rejected neighbors stay visible, the
    * review-relation convention. Ties in the sort key rank by id. */
  def sortedNeighborhood(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      blockLen: Int = 4,
      window: Int = 3,
      maxDist: Int = 1): DataFrame = {
    require(blockLen >= 1 && window >= 1 && maxDist >= 0,
      s"sortedNeighborhood: blockLen=$blockLen window=$window maxDist=$maxDist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("block").orderBy(col("k").asc, col("id").asc)
    val ranked = df
      .select(col(idCol).as("id"), lower(col(keyCol)).as("k"))
      .where(col("k").isNotNull)
      .withColumn("block", substring(col("k"), 1, blockLen))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .localCheckpoint(true) // self-joined once per side
    val a = ranked.select(col("block"), col("id").as("id_a"),
      col("k").as("ka"), col("rnk").as("ra"))
    val b = ranked.select(col("block"), col("id").as("id_b"),
      col("k").as("kb"), col("rnk").as("rb"))
    a.join(b, Seq("block"))
      .where(col("rb") - col("ra") > 0 && col("rb") - col("ra") <= window)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ka"), col("kb")).as("dist"))
      .withColumn("matched", col("dist") <= maxDist)
  }

  /** Jaro-Winkler best-match linkage (E251) — the SCORED face of the
    * entity-resolution shelf: [[fuzzyMatch]] and [[sortedNeighborhood]]
    * gate candidates by edit-distance ≤ k; real record linkage (Census
    * merge/purge, Febrl, Splink) RANKS candidates by Jaro-Winkler — the
    * [[graft.functions.JaroWinkler]] codegen expression, pinned
    * bit-for-bit to the oracle's independent implementation — and keeps
    * the best reference per dirty record with an accept threshold.
    *
    * Per dirty record: the argmax-by-score clean candidate (6-dp score;
    * ties to the smaller clean id — the knn_assign argmax convention,
    * here as one map-side-combined `max(struct)`), `accepted = score ≥
    * threshold`. Unmatched dirty records (empty block) drop out, the
    * blocked-recall trade documented on [[fuzzyMatch]].
    *
    * Scale shape: candidates from the equi-join on the lowered key
    * prefix (never all-pairs), J-W runs inside whole-stage codegen in
    * the join's scan, and the only shuffle after the join carries one
    * row per dirty record (partial argmax map-side). */
  def jaroWinklerBest(
      dirty: DataFrame, clean: DataFrame,
      dirtyId: String, cleanId: String,
      dirtyKey: String, cleanKey: String,
      blockLen: Int, threshold: Double = 0.9): DataFrame = {
    require(blockLen >= 1, "blockLen must be positive")
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaroWinklerBest: threshold=$threshold out of (0, 1]")
    graft.functions.JaroWinkler.register(dirty.sparkSession)
    val l = dirty.select(
      col(dirtyId).as("left_id"), lower(col(dirtyKey)).as("lk"))
      .where(col("lk").isNotNull)
      .withColumn("block", substring(col("lk"), 1, blockLen))
    val r = clean.select(
      col(cleanId).as("right_id"), lower(col(cleanKey)).as("rk"))
      .where(col("rk").isNotNull)
      .withColumn("block", substring(col("rk"), 1, blockLen))
    l.join(r, Seq("block"))
      .withColumn("score", round(expr("jaro_winkler(lk, rk)"), 6))
      .groupBy("left_id")
      .agg(max(struct(col("score").as("s"), (-col("right_id")).as("nr")))
        .as("b"))
      .select(
        col("left_id"),
        (-col("b.nr")).as("best_right_id"),
        col("b.s").as("score"),
        (col("b.s") >= threshold).as("accepted"))
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
