package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Score calibration over the whole corpus (E131).
  *
  * Quality scores from different heuristics (E9's composite, E31's LM
  * perplexity, a classifier logit) share no scale; curation policies
  * ("drop the bottom 20%", "sample ∝ quality percentile") need the
  * PERCENTILE of each document's score, not the raw value. This computes
  * the standard `PERCENT_RANK` — (rank − 1)/(n − 1) with RANK ties (every
  * document of an equal score gets the same percentile) — without the
  * trap implementation: `percent_rank().over(Window.orderBy(score))` has
  * an empty partition spec, so Spark collapses the entire corpus into ONE
  * task (the documented single-partition warning) — the 100 TB
  * anti-pattern.
  *
  * Scale shape: rank depends only on how many documents score strictly
  * lower, so the corpus collapses map-side to the DISTINCT-score
  * histogram (6-dp scores in [0,1] → ≤10⁶+1 cells, metadata-sized at any
  * corpus scale); the running offset is a window over THAT relation, and
  * documents join their score's rank back by equi-join. Two shuffles of
  * compact keys; no global sort of the data, no single-partition stage
  * over the corpus.
  */
object Ranking {

  /** `(idCol, score, percentile)` for every row with a non-null score;
    * `scoreCol` must be engine-portable (e.g. 6-dp rounded quality).
    * Null-score rows carry no ranking signal and are excluded (the E46
    * convention). Single-row corpus ⇒ percentile 0 (the SQL
    * PERCENT_RANK convention). */
  def scorePercentile(
      df: DataFrame, idCol: String, scoreCol: String,
      maxCells: Long = WindowGuard.MaxWindowCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df
      .select(col(idCol), col(scoreCol).as("score"))
      .where(col("score").isNotNull && !isnan(col("score")))
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
    // cum_before = #docs strictly below this score: the running sum over
    // the distinct-score relation, shifted by one row
    val full = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("cum", sum(col("c")).over(wRun))
      .withColumn("n_total", sum(col("c")).over(full))
      // the 6-dp contract bounds this relation at ≤10⁶+1 cells; ENFORCED
      // (WindowGuard): un-rounded scores would silently turn the window
      // into a single task over the corpus
      .withColumn("n_cells", count(lit(1)).over(full))
      .select(
        col("score"),
        WindowGuard.guarded(col("cum") - col("c"), col("n_cells"),
          maxCells, "Ranking.scorePercentile").as("below"),
        col("n_total"))
    scored
      .join(ranked, Seq("score"))
      .select(
        col(idCol), col("score"),
        when(col("n_total") > 1L,
          round(col("below").cast(DoubleType) /
            (col("n_total") - 1L).cast(DoubleType), 6))
          .otherwise(lit(0.0d)).as("percentile"))
  }

  /** Curriculum epoch assignment (E212) — the data-ORDERING operator a
    * curriculum-training pipeline runs after scoring: documents are
    * consumed best-quality-first (score desc, id asc within ties), and
    * each document lands in epoch `floor(tokens_before / epochTokens)`
    * — "epoch 0 is the cleanest `epochTokens` tokens, epoch 1 the
    * next", the anti-curriculum variant being a sign flip the caller
    * applies to the score. Emits `(id, score, n_tokens, cum_before,
    * epoch)`.
    *
    * Scale shape — NO global sort and no corpus-sized single-partition
    * window (the 100 TB anti-pattern): the global running sum is split
    * into (a) a per-distinct-score token rollup whose ordered window is
    * metadata-sized under the repo's 6-dp score contract and ENFORCED
    * by [[WindowGuard]], and (b) a per-doc window PARTITIONED BY score
    * (parallel across score cells) ordered by id. `cum_before` =
    * better-score total + same-score-smaller-id total; both engines
    * evaluate the identical integer arithmetic, so the operator carries
    * a FULL hash oracle. */
  def curriculumEpochs(
      df: DataFrame, idCol: String, scoreCol: String, tokensCol: String,
      epochTokens: Long,
      maxCells: Long = WindowGuard.MaxWindowCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochTokens > 0, "need a positive per-epoch token budget")
    val scored = df
      .select(col(idCol).as("id"), col(scoreCol).as("score"),
        col(tokensCol).cast("long").as("n_tokens"))
      .where(col("score").isNotNull && !isnan(col("score")))
    val hist = scored.groupBy(col("score"))
      .agg(sum(col("n_tokens")).as("cell_toks"))
    val full = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wRun = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = hist
      .withColumn("cum", sum(col("cell_toks")).over(wRun))
      .withColumn("n_cells", count(lit(1)).over(full))
      .select(
        col("score"),
        WindowGuard.guarded(col("cum") - col("cell_toks"), col("n_cells"),
          maxCells, "Ranking.curriculumEpochs").as("better_toks"))
    val wIn = Window.partitionBy(col("score")).orderBy(col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("within", sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      .join(offsets, Seq("score"))
      .select(
        col("id"), col("score"), col("n_tokens"),
        (col("better_toks") + col("within")).as("cum_before"),
        // integer floor division — exact at any magnitude (a double
        // division would misround near 2^53)
        expr(s"(better_toks + within) div ${epochTokens}L").as("epoch"))
  }

  /** Per-domain top-k selection (E178) — "the best k documents from
    * every source" without a per-domain sort of the corpus: a curation
    * budget spread across domains keeps diversity while a global top-k
    * would let one high-scoring domain crowd out the rest. Keeps every
    * row whose strictly-better count within its domain is under `k`, so
    * boundary TIES are all kept (deterministic, engine-portable — no
    * arbitrary tie-break row_number would need).
    *
    * The E131/E171 scale shape: the only window runs over the
    * per-domain DISTINCT-score histogram (6-dp contract,
    * WindowGuard-enforced), never the corpus; rows join back by
    * (domain, score). Null/NaN scores are excluded. Returns
    * `(idCol, domain, score, n_better)` for kept rows. */
  def domainTopk(
      df: DataFrame, idCol: String, domainCol: String, scoreCol: String,
      k: Long,
      maxCells: Long = WindowGuard.MaxWindowCells): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val scored = df
      .select(col(idCol), col(domainCol).as("domain"),
        col(scoreCol).as("score"))
      .where(col("score").isNotNull && !isnan(col("score")))
    val hist = scored.groupBy("domain", "score").agg(count(lit(1)).as("c"))
    val full = Window.partitionBy("domain").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wAbove = Window.partitionBy("domain").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("n_better", coalesce(sum(col("c")).over(wAbove), lit(0L)))
      .withColumn("n_cells", count(lit(1)).over(full))
      .select(col("domain"), col("score"),
        WindowGuard.guarded(col("n_better"), col("n_cells"), maxCells,
          "Ranking.domainTopk").as("n_better"))
      .where(col("n_better") < k)
    scored.join(ranked, Seq("domain", "score"))
      .select(col(idCol), col("domain"), col("score"), col("n_better"))
  }

  /** CCNet-style per-language quality bucketing (E171) — the
    * head/middle/tail split CCNet cuts each language's corpus into
    * before sampling (Wenzek et al. bucket by LM perplexity tertiles;
    * the score here is any engine-portable 6-dp quality, higher =
    * better): per language, documents whose strictly-better mass is
    * under 1/3 of the language are `head`, under 2/3 `middle`, else
    * `tail`. Ties share a bucket by construction (the boundary is
    * computed on the DISTINCT-score histogram), and the comparison is
    * integer (`3·n_above < k·n_lang`) — no float at the cut.
    *
    * Scale shape (the E131 pattern): the only windows run over the
    * per-language distinct-score histogram — ≤10⁶ cells under the 6-dp
    * contract, WindowGuard-enforced — never over the corpus; documents
    * join back by (lang, score). Null/NaN scores carry no signal and
    * are excluded (the E46 convention). */
  def ccnetBuckets(
      df: DataFrame, idCol: String, langCol: String, scoreCol: String,
      maxCells: Long = WindowGuard.MaxWindowCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df
      .select(col(idCol), col(langCol).as("lang"), col(scoreCol).as("score"))
      .where(col("score").isNotNull && !isnan(col("score")))
    val hist = scored.groupBy("lang", "score").agg(count(lit(1)).as("c"))
    val full = Window.partitionBy("lang").rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wAbove = Window.partitionBy("lang").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("n_above", coalesce(sum(col("c")).over(wAbove), lit(0L)))
      .withColumn("n_lang", sum(col("c")).over(full))
      .withColumn("n_cells", count(lit(1)).over(full))
      .select(col("lang"), col("score"),
        WindowGuard.guarded(col("n_above"), col("n_cells"), maxCells,
          "Ranking.ccnetBuckets").as("n_above"),
        col("n_lang"))
    scored
      .join(ranked, Seq("lang", "score"))
      .select(
        col(idCol), col("lang"), col("score"),
        when(col("n_above") * 3 < col("n_lang"), lit("head"))
          .when(col("n_above") * 3 < col("n_lang") * 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** CCNet selection EXECUTOR (E187) — the action [[ccnetBuckets]]'s
    * verdict exists for (Wenzek et al. keep the head and middle
    * perplexity tertiles of each language and DROP the tail): every
    * `tail` document is removed, and so are documents with no score
    * (null/NaN carry no signal — the E46 convention, matched by the
    * oracle); the kept corpus returns with its bucket, sha256 content
    * pin and char length.
    *
    * Scale shape: the bucket verdict's only windows run over the
    * per-language DISTINCT-score histogram (WindowGuard-enforced, ≤10⁶
    * cells under the 6-dp contract) — never the corpus; the action side
    * projects (id, sha, length) BEFORE the verdict join, so document
    * payloads are read once and never enter an exchange even though the
    * kept set (~2/3 of the corpus) is far too large to broadcast.
    *
    * Cites reference scope: curation actions are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def ccnetSelect(
      df: DataFrame,
      idCol: String,
      langCol: String,
      scoreCol: String,
      textCol: String,
      keep: Seq[String] = Seq("head", "middle"),
      maxCells: Long = WindowGuard.MaxWindowCells): DataFrame = {
    val verdict = ccnetBuckets(
      df.select(col(idCol), col(langCol), col(scoreCol)),
      idCol, langCol, scoreCol, maxCells)
      .where(col("bucket").isin(keep: _*))
    df.select(
        col(idCol),
        sha2(col(textCol), 256).as("text_sha"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(verdict, Seq(idCol))
      .select(col(idCol), col("lang"), col("score"), col("bucket"),
        col("text_sha"), col("n_chars"))
  }

  /** Score-decile corpus report (E139) — the curation decision table one
    * level above [[scorePercentile]]: per quality decile, document count,
    * token mass and the score range — "dropping the bottom 2 deciles
    * costs N% of tokens" read directly off the relation (token-weighted,
    * because curation budgets are priced in tokens, not documents).
    * Decile = min(⌊10·percentile⌋, 9), so the p=1.0 frontier folds into
    * the top band.
    *
    * One extra keyed join (weights onto the percentile relation) and a
    * ≤10-cell map-side-combined rollup on top of the percentile plan. */
  def scoreDeciles(
      df: DataFrame, idCol: String, scoreCol: String,
      weightCol: String): DataFrame = {
    val sp = scorePercentile(df.select(col(idCol), col(scoreCol)),
      idCol, scoreCol)
    sp
      .join(df.select(col(idCol), col(weightCol).as("_w")), Seq(idCol))
      .groupBy(least(floor(col("percentile") * 10), lit(9L)).cast("long")
        .as("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_w")).as("n_tokens"),
        round(min(col("score")), 6).as("min_score"),
        round(max(col("score")), 6).as("max_score"))
  }
}
