package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword retrieval over a document corpus: BM25 ranking (Robertson et
  * al.; the Lucene `(k1, b)` variant with the `ln(1 + (N-df+0.5)/(df+0.5))`
  * IDF) — the standard relevance score used for corpus curation passes
  * (e.g. selecting topical documents for a training mixture).
  *
  * Scale design: NOTHING here shuffles document payloads —
  *  1. per-document term frequencies come from `size(filter(tokens, …))`
  *     array expressions evaluated inside the scan projection (no explode,
  *     no `(doc, term)` shuffle);
  *  2. corpus statistics (N, Σdl, per-term document frequencies) reduce to
  *     ONE single-row aggregate, broadcast back via a 1-row cross join;
  *  3. ranking is `ORDER BY … LIMIT k` — Spark plans it as
  *     `TakeOrderedAndProject` (per-partition heaps, no global sort).
  * Two scans of the corpus total, both column-pruned to (id, text).
  *
  * Determinism: the per-document score sums the query terms in their given
  * fixed order with plain left-associated double arithmetic, and every
  * fractional constant is forced to DOUBLE in the oracle twin — bit-for-bit
  * reproducible across engines.
  */
object Search {

  /** TF-IDF keyword extraction: the `k` highest-weighted terms per document
    * (`tfidf = tf · ln(N/df)`, ties broken by token ascending) — topical
    * tagging for corpus curation (what is this document about?).
    *
    * Scale shape: three compactly-keyed shuffles — tf = hash agg on
    * `(id, token)`, df = hash agg on `token` (derived from tf, so the
    * corpus is read ONCE), score join on `token`, then a per-document
    * `row_number` window keyed on the id. All map-side combined; no
    * payloads travel. */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    val tok = df.select(
      col(idCol).as("id"),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("t"))
    val tf = tok.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDocs = df.select(col(idCol))
      .agg(count_distinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "t")
      .crossJoin(broadcast(nDocs))
      .select(
        col("id"), col("t"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("s").desc, col("t").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("t").as("token"),
        round(col("s"), 6).as("tfidf"), col("rank"))
  }

  /** BM25 top-k: `(idCol, score)` for the `k` highest-scoring documents,
    * score descending, id ascending on ties. Documents matching no query
    * term score 0 and only appear if fewer than `k` documents match. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    // document tokens are lowercased, so query terms must be too — a
    // mixed-case term would otherwise match nothing and silently score 0
    val terms = query.map(_.toLowerCase)
    // stage the token array once: each per-term tf filter referencing the
    // tokenizer expression directly would re-split the text per term
    val toks = col("_toks")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).cast("long").as(s"tf$i")
    }
    val base = df
      .select(
        col(idCol),
        TextFunctions.wsTokens(lower(col(textCol))).as("_toks"))
      .select(
        (col(idCol) +: size(toks).cast("long").as("dl") +: tfCols): _*)

    // one single-row reduction: corpus size, total token count (exact,
    // integral — no FP accumulation order to worry about), per-term df
    val statAggs =
      count(lit(1)).as("n_docs") +:
        sum(col("dl")).as("sum_dl") +:
        query.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val norm = lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl)
    val termScores: Seq[Column] = query.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val dfq = col(s"df$i").cast("double")
      val idf = log(
        (col("n_docs").cast("double") - dfq + lit(0.5)) / (dfq + lit(0.5)) + lit(1.0))
      when(col(s"tf$i") > 0, idf * tf * lit(k1 + 1.0) / (tf + norm)).otherwise(lit(0.0))
    }
    base.crossJoin(broadcast(stats))
      .select(col(idCol), termScores.reduceLeft(_ + _).as("raw"))
      .orderBy(col("raw").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("raw"), 6).as("score"))
  }

  /** Reciprocal-rank fusion (E113) — the standard hybrid-retrieval
    * combiner (Cormack et al. SIGIR 2009): given N independently-ranked
    * lists over the same id space (BM25, ANN cosine, quality priors,
    * recency …), score each id Σ 1/(k0 + rank_i) over the lists it
    * appears in and return the fused top-k. Rank-based, so wildly
    * different score scales combine without calibration — why RRF is
    * the default fuser in hybrid search.
    *
    * Each input is `(idCol, rankCol)` — a RANKED LIST (top-k retrieval
    * output, bounded), not a corpus; the union-then-groupBy therefore
    * shuffles list-sized relations keyed by id. Addends are quantized
    * to DECIMAL(38,12) before the sum (the engine's exact-sum
    * contract): with >2 lists a plain double sum would be
    * partition-order dependent. The fused order compares the exact
    * decimal score with an id ASC tie-break — deterministic across
    * engines and partitionings; `rrf_score` is the 6-dp display form. */
  def rrfFuse(
      lists: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60, k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val addend = round(
      lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double")), 12)
      .cast(dec12)
    lists.map(_.select(col(idCol).as("id"), addend.as("a")))
      .reduceLeft(_ unionAll _)
      .groupBy("id")
      .agg(count(lit(1)).as("n_lists"), sum(col("a")).as("s"))
      .orderBy(col("s").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("n_lists"),
        round(col("s").cast("double"), 6).as("rrf_score"))
  }
}
