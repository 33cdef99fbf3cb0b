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
    * exchange on the block key and the neighborhood pairing reads each
    * record's next `window` neighbors straight off the sort window via
    * lead() — per-record work stays ≤ window even in a degenerate
    * single-prefix block (where a rank-band self-join would regrow the
    * quadratic), and a cross-block typo escapes exactly as it does in
    * blocked fuzzyMatch (run a second pass on a different key for
    * recall, the standard multi-pass SNM).
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
    // rank-band pairing DIRECTLY from the sort window (r16): each record
    // pairs with the next `window` records of its block via lead(), the
    // literal sorted-neighborhood definition — O(rows·window) work where
    // the former block-self-join + rank-band filter materialized O(block²)
    // candidate pairs through one task per hot block (probed 5.9 s on a
    // single-block key prefix). Identical pairs by construction: ranks
    // are consecutive, so 0 < rb − ra <= window ⟺ b is one of a's next
    // `window` rows.
    val ranked = df
      .select(col(idCol).as("id"), lower(col(keyCol)).as("k"))
      .where(col("k").isNotNull)
      .withColumn("block", substring(col("k"), 1, blockLen))
    val nexts = (1 to window).map(j => struct(
      lead(col("id"), j).over(w).as("id_b"),
      lead(col("k"), j).over(w).as("kb")).as(s"p$j"))
    ranked
      // window expressions first (a generator may not host them), ...
      .select(col("id").as("id_a") +: col("k").as("ka") +: nexts: _*)
      // ... then one explode over the materialized neighbor structs
      .select(col("id_a"), col("ka"),
        explode(array((1 to window).map(j => col(s"p$j")): _*)).as("p"))
      .where(col("p.kb").isNotNull) // past the block end
      .select(col("id_a"), col("p.id_b").as("id_b"),
        levenshtein(col("ka"), col("p.kb")).as("dist"))
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
    // broadcast hint on the dirty side (guide §3.1) was measured in r16
    // and REVERTED: at bench scale the shuffled join's single hot-block
    // task is ~0.4 s — the broadcast build + spread exchange cost more
    // than they saved (0.56 → 1.33 s in-battery). At a scale where the
    // hot block matters, AQE's skew handling and a caller-side broadcast
    // hint remain available.
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
