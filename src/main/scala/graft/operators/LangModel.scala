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
}
