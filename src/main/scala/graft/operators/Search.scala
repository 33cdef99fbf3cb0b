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

  /** Multi-query BM25 retrieval (E190) — [[bm25TopK]] generalized from
    * one driver-specified term list to a QUERY RELATION: every query
    * document retrieves its top-k corpus documents through a term-
    * filtered inverted index — the distributed IR shape (postings join),
    * not |Q| repeated corpus scans. The retrieval pass behind
    * dataset-level curation sweeps (topical selection per seed doc) and
    * the E23/E161 decontamination asymmetry's lexical sibling.
    *
    * Scale shape, stage by stage:
    *  1. query terms: token-level explode of the QUERY side only (a
    *     small slice by contract), DISTINCT per (query, term);
    *  2. postings: corpus tokens are pruned MAP-SIDE against the
    *     broadcast query-term set before the (term, doc) tf shuffle —
    *     the only corpus-token exchange, and it carries ids not text;
    *  3. stopping: terms with `df > maxDf` are dropped (classic IR
    *     stopping — "the" would otherwise fan a candidate per corpus
    *     doc), then each query keeps its `maxTermsPerQuery` RAREST
    *     surviving terms (df asc, term asc) — so per-query candidates
    *     are bounded by maxTermsPerQuery·maxDf ABSOLUTELY, and the
    *     per-query rank window is guarded by construction;
    *  4. scoring: the E27 Lucene-variant BM25 per (query, doc, term),
    *     each term `ROUND(·, 12)` and decimal-summed — the rank key is
    *     the EXACT decimal sum (doc-id tie-break), so both engines rank
    *     identical values; LN parity is the E27/E31 proven contract.
    *
    * Cites reference scope: no retrieval surface in awsdataprofiler
    * (README.md:1-72) — extension per SURVEY §2.E. */
  def bm25MultiTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      maxDf: Long = 1000L,
      maxTermsPerQuery: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxTermsPerQuery.toLong * maxDf <= WindowGuard.MaxWindowCells,
      s"bm25MultiTopK: maxTermsPerQuery*maxDf = " +
        s"${maxTermsPerQuery.toLong * maxDf} exceeds the window-cell " +
        s"bound ${WindowGuard.MaxWindowCells}")
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val ctoks = corpus.select(
      col(idCol).as("doc_id"),
      TextFunctions.wsTokens(lower(col(textCol))).as("w"))
    val dls = ctoks.select(
      col("doc_id"), size(col("w")).cast("long").as("dl"))
    val stats = dls.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qterms = queries.select(
        col(idCol).as("query_id"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("t"))
      .distinct()
    val termSet = qterms.select("t").distinct()
    val postings = ctoks
      .select(col("doc_id"), explode(col("w")).as("t"))
      .join(broadcast(termSet), Seq("t"))
      .groupBy("t", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val dfRel = postings.groupBy("t")
      .agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    val wTerms = Window.partitionBy("query_id")
      .orderBy(col("df").asc, col("t").asc)
    val qsel = qterms.join(dfRel, Seq("t"))
      .withColumn("trk", row_number().over(wTerms))
      .where(col("trk") <= maxTermsPerQuery)
      .select("query_id", "t", "df")
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
    val cand = qsel.join(postings, Seq("t"))
      .join(dls, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(
        col("query_id"), col("doc_id"),
        round(idf * tfD * lit(k1 + 1.0) / (tfD + norm), 12)
          .cast(dec12).as("term"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("doc_id").asc)
    cand.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("term")).as("s"))
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= k)
      .select(
        col("query_id"), col("doc_id"), col("n_terms"),
        round(col("s").cast("double"), 6).as("score"))
  }

  /** ANN recall curve (E194) — recall@k for k = 1..kMax of an
    * approximate run against the exact top-k, the standard index-tuning
    * readout (the whole curve, not one operating point: probe counts
    * and band geometries are chosen where the curve flattens). Per
    * query, `recall@k = |approx top-k ∩ exact top-k| / min(k, |exact|)`
    * — the denominator is capped at the query's exact-list size, so a
    * query whose true result list is shorter than k can still score a
    * perfect 1.0 (dividing by k unconditionally would drag mean and
    * especially min recall for short lists; ADVICE r11 fix). The
    * relation reports, per k, the query count, mean and WORST-query
    * recall (the tail is what an SLA cares about).
    *
    * Determinism: both rankings are row_number over the already-6-dp
    * scores (id tie-break); per-(query, k) recall is an integer count
    * over k, `ROUND(·, 12)` decimal-summed for the mean. Inputs are
    * top-k runs (metadata-sized); everything here is bounded by
    * |Q|·kMax. */
  def recallCurve(
      system: DataFrame,
      exact: DataFrame,
      queryCol: String,
      itemCol: String,
      scoreCol: String,
      kMax: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kMax >= 1 && kMax <= 100, s"recallCurve: kMax=$kMax out of [1,100]")
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val w = Window.partitionBy("q").orderBy(col("s").desc, col("i").asc)
    def ranked(df: DataFrame, rk: String) = df
      .select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(scoreCol).as("s"))
      .withColumn(rk, row_number().over(w))
      .where(col(rk) <= kMax)
      .select("q", "i", rk)
    val sys = ranked(system, "rs")
    val ex = ranked(exact, "re")
    val matched = sys.join(ex, Seq("q", "i"))
    val ks = ex.groupBy("q").agg(count(lit(1)).as("ne"))
      .select(col("q"), col("ne"),
        explode(sequence(lit(1), lit(kMax))).as("k"))
    val cnt = ks.alias("g")
      .join(matched.alias("m"),
        col("g.q") === col("m.q") &&
          col("m.rs") <= col("g.k") && col("m.re") <= col("g.k"), "left")
      .groupBy(col("g.q").as("q"), col("g.k").as("k"), col("g.ne").as("ne"))
      .agg(count(col("m.rs")).as("c"))
    cnt
      .select(col("q"), col("k"),
        round(col("c").cast("double") /
          least(col("k"), col("ne")).cast("double"), 12)
          .cast(dec12).as("r"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_queries"),
        round(sum(col("r")).cast("double") / count(lit(1)), 6)
          .as("mean_recall"),
        round(min(col("r")).cast("double"), 6).as("min_recall"))
  }

  /** NDCG@k retrieval evaluation (E189) — the standard graded-relevance
    * metric (Järvelin & Kekäläinen '02, linear-gain variant) computed
    * IN-ENGINE, so an index change (IVF probe count, LSH band geometry,
    * quantizer budget) is graded on the spot instead of exporting run
    * files to an offline eval tool. Pooled-judgment semantics: `system`
    * is the ranked run (query, item, score — ranked by ITS score),
    * `qrels` the judged relevance pool; retrieved-but-unjudged items
    * gain 0 (the classic trec_eval convention), negative relevances
    * clamp to 0, and IDCG ranks the pool by relevance. Per query:
    * `ndcg = DCG@k / IDCG@k` with `DCG = Σ gain_i / log2(i+1)`.
    *
    * Determinism contract: the rank discounts `1/log2(i+1)` are k
    * PRECOMPUTED double literals (a rank CASE chain — never a runtime
    * transcendental, whose libm could differ across engines), each term
    * `ROUND(gain·disc, 12)` decimal-summed, the final division 6-dp.
    * Ties rank by (score desc, item asc) on the 6-dp scores both
    * engines already agree on.
    *
    * Scale shape: inputs are per-query CANDIDATE LISTS (top-k runs and
    * judgment pools — metadata-sized by construction, ~k rows per
    * query), so the per-query rank windows are bounded by the input's
    * per-query fan-in, never a corpus; the DCG/IDCG rollup is one
    * map-side-combined agg each and one query-keyed join. Never feed a
    * corpus-sized scored relation directly — rank it with a top-k
    * operator first (the E27/E6 shapes).
    *
    * Cites reference scope: no retrieval surface in awsdataprofiler
    * (README.md:1-72) — extension per SURVEY §2.E. */
  def ndcgAtK(
      system: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      itemCol: String,
      scoreCol: String,
      relCol: String,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && k <= 100, s"ndcgAtK: k=$k out of [1,100]")
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    // discount literals: identical doubles on both engines by embedding
    // the JVM-computed value (the oracle interpolates d.toString, which
    // round-trips exactly)
    val discs = (1 to k).map(i => i -> 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    def discOf(rnk: Column): Column =
      discs.tail.foldLeft(when(rnk === discs.head._1, lit(discs.head._2))) {
        case (acc, (i, d)) => acc.when(rnk === i, lit(d))
      }.otherwise(lit(0.0))
    val qr = qrels.select(
      col(queryCol).as("q"), col(itemCol).as("i"),
      greatest(col(relCol).cast("double"), lit(0.0)).as("rel"))
    val wSys = Window.partitionBy("q")
      .orderBy(col("s").desc, col("i").asc)
    val dcg = system
      .select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(scoreCol).as("s"))
      .withColumn("rnk", row_number().over(wSys))
      .where(col("rnk") <= k)
      .join(qr, Seq("q", "i"), "left")
      .select(col("q"),
        round(coalesce(col("rel"), lit(0.0)) * discOf(col("rnk")), 12)
          .cast(dec12).as("term"))
      .groupBy("q")
      .agg(count(lit(1)).as("n_retrieved"), sum(col("term")).as("dcg"))
    val wIdeal = Window.partitionBy("q")
      .orderBy(col("rel").desc, col("i").asc)
    val idcg = qr
      .withColumn("rnk", row_number().over(wIdeal))
      .where(col("rnk") <= k)
      .select(col("q"),
        round(col("rel") * discOf(col("rnk")), 12).cast(dec12).as("term"))
      .groupBy("q")
      .agg(sum(col("term")).as("idcg"))
    dcg.join(idcg, Seq("q"))
      .select(
        col("q").as(queryCol),
        col("n_retrieved"),
        round(col("dcg").cast("double"), 6).as("dcg"),
        round(col("idcg").cast("double"), 6).as("idcg"),
        when(col("idcg") > 0,
          round(col("dcg").cast("double") / col("idcg").cast("double"), 6))
          .as("ndcg"))
  }
}
