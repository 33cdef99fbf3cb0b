package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise prediction evaluation (E253) — the harness that closes the
  * near-dup shelf's loop: every detector here (E2 Jaccard, E3 MinHash,
  * E4 SimHash, E51 winnow, E249 sorted-neighborhood) emits candidate
  * PAIRS, and tuning any of them (threshold, bands, window) needs
  * precision/recall against known duplicates — the number a curation
  * team actually reads before picking a config. Ground truth comes from
  * PLANTED variants (the gate plants an easy tail-append set the
  * detector should catch and a hard truncation set it should miss, so
  * both error directions are exercised); predictions are restricted to
  * pairs touching the probe set — the standard planted-probe protocol,
  * under which a natural corpus near-dup does not read as a false
  * positive.
  *
  * Scale shape: both relations canonicalize to (lo, hi) pair keys, one
  * full-outer equi-join on the pair key, one global count aggregate —
  * pair-relation-sized, never corpus-sized; the metrics row is
  * metadata. */
object PairEval {

  /** Confusion counts + P/R/F1 for predicted vs true id pairs (any
    * orientation; duplicates collapse). One row: `n_truth, n_pred, tp,
    * fp, fn, precision, recall, f1` — ratios 6-dp, NULL when their
    * denominator is empty (no predictions / no truth). */
  def pairConfusion(pred: DataFrame, truth: DataFrame): DataFrame = {
    def canon(df: DataFrame, tag: String) = df
      .select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .distinct()
      .withColumn(tag, lit(1))
    val p = canon(pred, "p")
    val t = canon(truth, "t")
    val counts = p.join(t, Seq("lo", "hi"), "full_outer")
      .agg(
        sum(when(col("p") === 1 && col("t") === 1, 1).otherwise(0))
          .cast("long").as("tp"),
        sum(when(col("p") === 1 && col("t").isNull, 1).otherwise(0))
          .cast("long").as("fp"),
        sum(when(col("p").isNull && col("t") === 1, 1).otherwise(0))
          .cast("long").as("fn"))
    val tp = col("tp").cast("double")
    val precision = when(col("tp") + col("fp") > 0,
      round(tp / (col("tp") + col("fp")).cast("double"), 6))
    val recall = when(col("tp") + col("fn") > 0,
      round(tp / (col("tp") + col("fn")).cast("double"), 6))
    counts
      .withColumn("n_truth", (col("tp") + col("fn")).cast("long"))
      .withColumn("n_pred", (col("tp") + col("fp")).cast("long"))
      .withColumn("precision", precision)
      .withColumn("recall", recall)
      .withColumn("f1",
        when(precision.isNotNull && recall.isNotNull &&
            precision + recall > 0,
          round(lit(2.0) * precision * recall / (precision + recall), 6)))
      .select("n_truth", "n_pred", "tp", "fp", "fn",
        "precision", "recall", "f1")
  }
}
