package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** Language-model quality scoring: per-document mean token log-probability
  * under a unigram model trained on the corpus itself, and the derived
  * perplexity — the (poor man's) CCNet-style LM filter used to rank
  * scraped documents by fluency before training (Wenzek et al. 2020 rank
  * by LM perplexity; a corpus-trained unigram model is the deterministic,
  * dependency-free variant).
  *
  * Scale shape: vocabulary = one explode → map-side-combined hash agg
  * (shuffle volume ∝ distinct tokens); token scoring joins the exploded
  * corpus to the vocabulary on the token key (equi-join, no payloads);
  * per-doc reduction is a second keyed agg. The corpus total is a 1-row
  * aggregate broadcast via cross join.
  *
  * Determinism: per-token `ln(c/total)` is a pure double expression;
  * addends are quantized to DECIMAL(38,12) before the per-document sum, so
  * the reduction is order-independent and matches the DuckDB twin exactly
  * (the engine's standard exact-sum contract, cf. ScanMetrics.decSum). */
object LangModel {

  /** Returns `(id, n_tokens, avg_logprob, perplexity)` per document
    * (documents with no tokens are omitted — no distribution to score).
    * `perplexity = exp(-avg_logprob)`, rounded to 6 places. */
  def unigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(
      col(idCol).as("id"),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum("c").as("total"))
    val logp = round(
      log(col("c").cast("double") / col("total").cast("double")), 12)
      .cast(DecimalType(38, 12))
    tok.join(vocab, "t")
      .crossJoin(broadcast(total))
      .select(col("id"), logp.as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum("lp").as("slp"))
      .select(
        col("id"),
        col("n_tokens"),
        round((col("slp").cast("double") / col("n_tokens").cast("double")), 6)
          .as("avg_logprob"),
        round(exp(-(col("slp").cast("double") / col("n_tokens").cast("double"))), 6)
          .as("perplexity"))
  }

  /** Bigram-LM quality scoring (E83): per-document mean bigram
    * log-probability and perplexity under a Laplace-smoothed (add-1)
    * bigram model trained on the corpus itself — one order up from
    * [[unigramScore]], so word-salad documents whose unigram profile
    * looks fluent (common words, wrong order) finally score badly:
    * P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}·) + V), with V
    * the full corpus vocabulary.
    *
    * Scale shape: bigram construction is MAP-SIDE (per-row transform over
    * the token array — no self-join, no window, no shuffle to form
    * pairs); model counts are two map-side-combined hash aggs (shuffle ∝
    * distinct bigrams, then distinct contexts); V is a 1-row aggregate
    * broadcast via cross join; scoring joins the exploded bigram stream
    * to the count relations on equi-keys (no payloads). Smoothed
    * numerator/denominator stay in exact integer arithmetic until the
    * final double division; per-bigram addends quantize to
    * DECIMAL(38,12) (decSum contract) so the per-doc reduction is
    * partition-order independent. Documents with fewer than two tokens
    * have no transitions and are omitted, like [[unigramScore]]'s
    * empty-token rule. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(
      col(idCol).as("id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("w"))
    val bigrams = words
      .where(size(col("w")) >= 2)
      .select(col("id"), explode(expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bigramCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val contextCounts = bigramCounts.groupBy("w1").agg(sum("cb").as("cw"))
    val vocabSize = words
      .select(explode(col("w")).as("t")).agg(countDistinct("t").as("v"))
    val logp = round(
      log((col("cb") + lit(1)).cast("double") /
        (col("cw") + col("v")).cast("double")), 12)
      .cast(DecimalType(38, 12))
    bigrams
      .join(bigramCounts, Seq("w1", "w2"))
      .join(contextCounts, Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .select(col("id"), logp.as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("slp"))
      .select(
        col("id"),
        col("n_bigrams"),
        round(col("slp").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_logprob"),
        round(exp(-(col("slp").cast("double") / col("n_bigrams").cast("double"))), 6)
          .as("perplexity"))
  }

  /** Interpolated trigram perplexity (E174) — the sharpest in-engine
    * step toward the KenLM filter CCNet actually runs: per trigram
    * occurrence, `p = 0.6·p₃ + 0.3·p₂ + 0.1·p₁` with add-1-smoothed
    * components `p₃ = (c(w₁w₂w₃)+1)/(c(w₁w₂)+V)`,
    * `p₂ = (c(w₂w₃)+1)/(c(w₂)+V)`, `p₁ = (c(w₃)+1)/(T+V)` — linear
    * interpolation (Jelinek-Mercer with fixed λ) so rare trigrams back
    * off smoothly instead of hitting the uniform floor the bigram model
    * gives them.
    *
    * Scale shape: three count relations (trigram / bigram / unigram),
    * each one explode → map-side-combined hash agg; scoring joins the
    * exploded trigram stream on compact token keys only; per-doc
    * reduction is one keyed agg. Totals broadcast. Determinism: the
    * interpolation is a fixed-order double expression over BIGINT
    * counts; `ROUND(ln p, 12)` addends are DECIMAL(38,12)-summed (the
    * [[bigramScore]] contract).
    *
    * Returns `(id, n_trigrams, avg_logprob, perplexity)`; documents
    * with fewer than 3 tokens are omitted. */
  def trigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(
      col(idCol).as("id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("w"))
    val tris = words
      .where(size(col("w")) >= 3)
      .select(col("id"), explode(expr(
        "transform(slice(w, 1, size(w) - 2), " +
          "(x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2, " +
          "element_at(w, i + 3) AS w3))")).as("tg"))
      .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
    val bigs = words
      .where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> struct(x AS b1, element_at(w, i + 2) AS b2))")).as("bg"))
      .select(col("bg.b1").as("b1"), col("bg.b2").as("b2"))
    val toks = words.select(explode(col("w")).as("t"))
    val triCounts = tris.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("ct"))
    val bigCounts = bigs.groupBy("b1", "b2").agg(count(lit(1)).as("cb"))
    val uniCounts = toks.groupBy("t").agg(count(lit(1)).as("cu"))
    val totals = toks.agg(
      count(lit(1)).as("tt"), countDistinct("t").as("v"))
    def sm(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      (num + lit(1)).cast("double") / (den + col("v")).cast("double")
    val logp = round(log(
      lit(0.6) * sm(col("ct"), col("c12")) +
        lit(0.3) * sm(col("c23"), col("c2")) +
        lit(0.1) * ((col("c3u") + lit(1)).cast("double") /
          (col("tt") + col("v")).cast("double"))), 12)
      .cast(DecimalType(38, 12))
    tris
      .join(triCounts, Seq("w1", "w2", "w3"))
      .join(bigCounts.select(col("b1").as("w1"), col("b2").as("w2"),
        col("cb").as("c12")), Seq("w1", "w2"))
      .join(bigCounts.select(col("b1").as("w2"), col("b2").as("w3"),
        col("cb").as("c23")), Seq("w2", "w3"))
      .join(uniCounts.select(col("t").as("w2"), col("cu").as("c2")), Seq("w2"))
      .join(uniCounts.select(col("t").as("w3"), col("cu").as("c3u")), Seq("w3"))
      .crossJoin(broadcast(totals))
      .select(col("id"), logp.as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"), sum("lp").as("slp"))
      .select(
        col("id"),
        col("n_trigrams"),
        round(col("slp").cast("double") / col("n_trigrams").cast("double"), 6)
          .as("avg_logprob"),
        round(exp(-(col("slp").cast("double") / col("n_trigrams").cast("double"))), 6)
          .as("perplexity"))
  }

  /** Interpolated Kneser-Ney trigram perplexity (E191) — the smoothing
    * the production n-gram filters actually use (Chen & Goodman '98's
    * interpolated KN; KenLM's default, hence the CCNet perplexity
    * model's): absolute discounting with CONTINUATION counts, so a word
    * that follows many distinct contexts ("francisco" follows only
    * "san") stops being overweighted by raw frequency — the classic
    * failure [[trigramScore]]'s Jelinek-Mercer mixture inherits.
    * Per trigram occurrence, with fixed discount D:
    * `P(w₃|w₁w₂) = (max(c₁₂₃−D,0) + D·N₁₊(w₁w₂·)·P(w₃|w₂)) / Σ₃c₁₂₃`,
    * where the top-level denominator is the TRIGRAM-MASS context total
    * `Σ_w₃ c₁₂₃` (Chen-Goodman's continuation-consistent form) — NOT
    * the raw bigram count c₁₂, which also counts document-final
    * (w₁,w₂) occurrences that have no trigram continuation and would
    * leak probability mass (Σ_w₃ P(w₃|w₁w₂) < 1; ADVICE r11 fix),
    * `P(w₃|w₂) = (max(N₁₊(·w₂w₃)−D,0) + D·N₁₊(w₂·)·P(w₃)) / N₁₊(·w₂·)`,
    * `P(w₃) = N₁₊(·w₃) / N₁₊(··)` — every N₁₊ a TYPE count read off the
    * trigram/bigram count relations (a groupBy away; no extra corpus
    * pass).
    *
    * Scale shape: exactly [[trigramScore]]'s — three explode →
    * map-side-combined count relations plus four metadata-sized type
    * rollups OF those relations; scoring joins the trigram stream on
    * compact token keys only; totals broadcast. Determinism: fixed-order
    * double expression over BIGINT counts and the literal discount;
    * `ROUND(ln p, 12)` addends DECIMAL(38,12)-summed.
    *
    * Returns `(id, n_trigrams, avg_logprob, perplexity)`; documents
    * with fewer than 3 tokens are omitted. */
  /** Shared n-gram stream builders: `(id, w1, w2, w3)` trigram and
    * `(b1, b2)` bigram relations over a `(id, w)` token-array relation. */
  private def triStream(words: DataFrame): DataFrame = words
    .where(size(col("w")) >= 3)
    .select(col("id"), explode(expr(
      "transform(slice(w, 1, size(w) - 2), " +
        "(x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2, " +
        "element_at(w, i + 3) AS w3))")).as("tg"))
    .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
      col("tg.w3").as("w3"))

  private def bigStream(words: DataFrame): DataFrame = words
    .where(size(col("w")) >= 2)
    .select(explode(expr(
      "transform(slice(w, 1, size(w) - 1), " +
        "(x, i) -> struct(x AS b1, element_at(w, i + 2) AS b2))")).as("bg"))
    .select(col("bg.b1").as("b1"), col("bg.b2").as("b2"))

  def kneserNeyScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"kneserNeyScore: discount=$discount out of (0,1)")
    val words = df.select(
      col(idCol).as("id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("w"))
    val tris = words
      .where(size(col("w")) >= 3)
      .select(col("id"), explode(expr(
        "transform(slice(w, 1, size(w) - 2), " +
          "(x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2, " +
          "element_at(w, i + 3) AS w3))")).as("tg"))
      .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
    val bigs = words
      .where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(slice(w, 1, size(w) - 1), " +
          "(x, i) -> struct(x AS b1, element_at(w, i + 2) AS b2))")).as("bg"))
      .select(col("bg.b1").as("b1"), col("bg.b2").as("b2"))
    val triCounts = tris.groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c123"))
    val bigCounts = bigs.groupBy("b1", "b2").agg(count(lit(1)).as("cb"))
    // continuation-type rollups — metadata-sized relations over the
    // count relations, never another corpus pass
    val t12 = triCounts.groupBy("w1", "w2")
      .agg(count(lit(1)).as("t12"), sum("c123").as("m12"))
    val cont23 = triCounts.groupBy("w2", "w3").agg(count(lit(1)).as("n23c"))
    val ctx2 = triCounts.groupBy("w2").agg(count(lit(1)).as("ctx2"))
    val t2 = cont23.groupBy("w2").agg(count(lit(1)).as("t2"))
    val n3c = bigCounts.groupBy("b2").agg(count(lit(1)).as("n3c"))
      .withColumnRenamed("b2", "w3")
    val totals = bigCounts.agg(count(lit(1)).as("bt"))
    val d = lit(discount)
    val p1 = col("n3c").cast("double") / col("bt").cast("double")
    val p2 = (greatest(col("n23c").cast("double") - d, lit(0.0)) +
      d * col("t2").cast("double") * p1) / col("ctx2").cast("double")
    val p3 = (greatest(col("c123").cast("double") - d, lit(0.0)) +
      d * col("t12").cast("double") * p2) / col("m12").cast("double")
    val logp = round(log(p3), 12).cast(DecimalType(38, 12))
    tris
      .join(triCounts, Seq("w1", "w2", "w3"))
      .join(t12, Seq("w1", "w2"))
      .join(cont23, Seq("w2", "w3"))
      .join(ctx2, Seq("w2"))
      .join(t2, Seq("w2"))
      .join(n3c, Seq("w3"))
      .crossJoin(broadcast(totals))
      .select(col("id"), logp.as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"), sum("lp").as("slp"))
      .select(
        col("id"),
        col("n_trigrams"),
        round(col("slp").cast("double") / col("n_trigrams").cast("double"), 6)
          .as("avg_logprob"),
        round(exp(-(col("slp").cast("double") / col("n_trigrams").cast("double"))), 6)
          .as("perplexity"))
  }

  /** Cross-corpus Kneser-Ney perplexity (E197) — the setup CCNet
    * actually runs ([[kneserNeyScore]] self-scores; production filters
    * don't): the KN model is trained on a REFERENCE slice and scores a
    * DIFFERENT corpus, so unseen events are first-class. Backoff at
    * score time: a trigram context never seen in training
    * (`c(w₁w₂) = 0`, or seen only at document ends so it has no trigram
    * mass to discount — `N₁₊(w₁w₂·) = 0`) falls through to the bigram
    * level; an unseen MIDDLE context falls to the unigram; an unseen
    * LAST WORD (no continuation mass at all) is out-of-vocabulary — it
    * cannot be scored by any level and is counted, not smudged:
    * `oov_rate` is reported beside the perplexity OVER SCORED TRIGRAMS,
    * the honest split production filters use (a low-ppl doc with 40%
    * OOV is not a low-ppl doc).
    *
    * Same determinism contract as [[kneserNeyScore]] (fixed-order
    * double expr, literal D, ROUND(ln p, 12) decimal sums); the backoff
    * CASEs key on NULLness of the LEFT-joined train counts — identical
    * on both engines. Scale shape unchanged: count relations over the
    * (small) reference slice, the score side joins its trigram stream
    * on compact token keys. */
  def kneserNeyCrossScore(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"kneserNeyCrossScore: discount=$discount out of (0,1)")
    def wordsOf(df: DataFrame) = df.select(
      col(idCol).as("id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("w"))
    val tw = wordsOf(train)
    val triCounts = triStream(tw).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c123"))
    val bigCounts = bigStream(tw).groupBy("b1", "b2")
      .agg(count(lit(1)).as("cb"))
    val t12 = triCounts.groupBy("w1", "w2").agg(count(lit(1)).as("t12"))
    val cont23 = triCounts.groupBy("w2", "w3").agg(count(lit(1)).as("n23c"))
    val ctx2 = triCounts.groupBy("w2").agg(count(lit(1)).as("ctx2"))
    val t2 = cont23.groupBy("w2").agg(count(lit(1)).as("t2"))
    val n3c = bigCounts.groupBy("b2").agg(count(lit(1)).as("n3c"))
      .withColumnRenamed("b2", "w3")
    val totals = bigCounts.agg(count(lit(1)).as("bt"))
    val d = lit(discount)
    val p1 = col("n3c").cast("double") / col("bt").cast("double")
    val p2 = when(col("ctx2").isNull, p1).otherwise(
      (greatest(coalesce(col("n23c"), lit(0L)).cast("double") - d, lit(0.0)) +
        d * col("t2").cast("double") * p1) / col("ctx2").cast("double"))
    val p3 = when(col("c12").isNull || col("t12").isNull, p2).otherwise(
      (greatest(coalesce(col("c123"), lit(0L)).cast("double") - d, lit(0.0)) +
        d * col("t12").cast("double") * p2) / col("c12").cast("double"))
    val lp = round(log(p3), 12).cast(DecimalType(38, 12))
    triStream(wordsOf(score))
      .join(triCounts, Seq("w1", "w2", "w3"), "left")
      .join(bigCounts.select(col("b1").as("w1"), col("b2").as("w2"),
        col("cb").as("c12")), Seq("w1", "w2"), "left")
      .join(t12, Seq("w1", "w2"), "left")
      .join(cont23, Seq("w2", "w3"), "left")
      .join(ctx2, Seq("w2"), "left")
      .join(t2, Seq("w2"), "left")
      .join(n3c, Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        col("n3c").isNull.as("oov"),
        when(col("n3c").isNotNull, lp).as("lp"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        count(col("lp")).as("n_scored"),
        sum(col("lp")).as("slp"))
      .select(
        col("id"),
        col("n_trigrams"),
        col("n_oov"),
        round(col("n_oov").cast("double") / col("n_trigrams").cast("double"), 6)
          .as("oov_rate"),
        when(col("n_scored") > 0,
          round(col("slp").cast("double") / col("n_scored").cast("double"), 6))
          .as("avg_logprob"),
        when(col("n_scored") > 0,
          round(exp(-(col("slp").cast("double") / col("n_scored").cast("double"))), 6))
          .as("perplexity"))
  }
}
