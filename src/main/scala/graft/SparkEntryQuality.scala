package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** SparkEntry — Quality lane of the driver-contract `queries` map (split
  * from the former 4.3k-line monolith, VERDICT r13 task 5). Self-typed
  * to the aggregator so entries use the shared helpers (lineitem,
  * documents, metricQuery, cfg, ...) unqualified. */
private[graft] trait SparkEntryQuality { this: SparkEntry.type =>

  protected def qualityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-domain quantile normalization (E247): rank-normalize the E9
    // quality score WITHIN each source so "keep the top half of every
    // domain" means the same thing everywhere (the FineWeb per-dump-
    // threshold discipline); explicit (rn-1)/(n-1) percentile algebra
    "domain_quantile_norm" -> ((s, dir) =>
      graft.operators.Curate.domainQuantileNorm(
        documentsSpread(s, dir), "doc_id", "text", "source")
        .orderBy("doc_id")),
    // token-weighted quality-decile report (E139)
    "quality_deciles" -> ((s, dir) =>
      graft.operators.Ranking.scoreDeciles(
        documentsSpread(s, dir).select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score"),
          TextFunctions.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "score", "n_tokens")
        .orderBy("decile")),
    // DSIR importance weights (E157): every document scored by the log
    // importance ratio of its hashed unigram+bigram profile against the
    // English-labeled target slice — the principled quality-filter
    // replacement (sample ∝ w); fully hash-oracled
    "dsir_weights" -> ((s, dir) =>
      Sampling.dsirWeights(
        documents(s, dir), "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id")),
    // DSIR's action half: Gumbel top-k over the log weights draws the
    // without-replacement sample ∝ w — deterministic noise from the
    // engine's sha256 bucket, so the selection is fully hash-oracled
    "dsir_select" -> ((s, dir) =>
      Sampling.dsirSelect(
        documents(s, dir), "doc_id", "text", col("lang") === "en", k = 100)),
    // composite quality gate (E198): Gopher rules AND ccnet tertile AND
    // one-pass NB classifier — three independent verdicts, conjunctive
    // keep, every stage's verdict kept in the row
    "quality_gate" -> ((s, dir) =>
      graft.operators.Curate.qualityGate(documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // Naive-Bayes quality filter (E196, in-engine training #5 — the
    // ONE-PASS one): per-bucket class counts + priors learned in a
    // single corpus scan; keep on the exact decimal log-odds
    "naive_bayes_filter" -> ((s, dir) =>
      graft.operators.QualityModel.naiveBayesFilter(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // classifier calibration table (E175): reliability diagram for a
    // 6-dp probability column vs the is-English label - here a fixed
    // logistic over the quality score (in production: logregTrain's
    // final-weight sigmoid); mean_p vs frac_pos per tenth-bucket
    "calibration_table" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val q = round(TextFunctions.qualityScore(col("text")), 6)
      val p = round(
        lit(1.0) / (lit(1.0) + exp(-(lit(8.0) * (q - lit(0.5))))), 6)
      val scored = documentsSpread(s, dir).select(p.as("p"),
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
      graft.operators.QualityModel.calibrationTable(scored, "p", "y")
        .orderBy("bucket")
    }),
    // corpus card (r9): the one-row dataset summary a curator exports —
    // size, token volume, language mix, exact-dup rate, quality level,
    // median length — every number riding an already-proven cross-engine
    // contract (integer counts, decSum quality mean, percentile
    // bit-parity, deterministic argmax tie-break), so the whole card is
    // hash-oracled. One wide agg + one lang rollup. SCALE LIMIT (ADVICE
    // r9): every term scales as a scan EXCEPT p50_tokens, whose exact
    // `percentile` buffer is the token-count value set — fine for a card
    // over any real corpus (token counts are a bounded-ish domain), but
    // at 100 TB the documented path swaps that one term for the E19 KLL
    // median and keeps the rest of the card unchanged.
    "corpus_card" -> ((s, dir) => {
      // exact-dup rate distinct-counts the 32-byte SHA-256 of the text,
      // NOT the text itself (the E1 doctrine): countDistinct(text) made
      // the grouping key the document body — at 100 TB the whole corpus
      // crossed the wire for one scalar (VERDICT r10 "What's wrong" #2).
      // Same answer (collision-free at any real corpus size), metadata-
      // sized shuffle; the oracle distinct-counts sha256(text) likewise.
      // NOT documentsSpread: this key's plan is asserted (PlanAuditSpec)
      // to carry only 32-byte hashes through exchanges, never text
      val base = documents(s, dir).select(
        col("lang"), sha2(col("text"), 256).as("text_h"),
        TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"))
      val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
      val m = base.agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("text_h").as("n_distinct_texts"),
        round(sum(col("q").cast(Dec)).cast("double") / count(col("q")), 6)
          .as("mean_quality"),
        round(percentile(col("ws_tokens").cast("double"), lit(0.5)), 6)
          .as("p50_tokens"))
      val top = base.groupBy("lang").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang").asc).limit(1)
        .select(col("lang").as("top_lang"), col("c").as("top_docs"))
      m.crossJoin(broadcast(top)).select(
        col("n_docs"), col("total_ws_tokens"), col("n_langs"),
        col("top_lang"),
        round(col("top_docs").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"),
        round((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs"), 6).as("exact_dup_rate"),
        col("mean_quality"), col("p50_tokens"))
    }),
    // in-engine logistic-regression quality/language classifier (E164):
    // 6 full-batch GD iterations, decimal-quantized gradient terms —
    // model TRAINING with a full hash oracle (6 chained CTE replay)
    "quality_logreg" -> ((s, dir) => {
      val f = graft.operators.QualityModel.docFeatures(
        documentsSpread(s, dir), "text", "lang")
      graft.operators.QualityModel.logregTrain(
        f, Seq("x1", "x2", "x3"), "y", iterations = 6)
        .orderBy("iter")
    }),
    // quality-filter EXECUTOR (E180): the E164 action — train the linear
    // filter in-engine against the reference-quality label (fastText
    // recipe), keep every doc the model accepts (z >= 0, the logit
    // threshold), sha256-pin the kept corpus; map-only scoring, no join
    "quality_filter_execute" -> ((s, dir) =>
      graft.operators.QualityModel.qualityFilterExecute(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // EL2N data-diet selection (E223): |sigma(z) - y| under the E180-
    // trained filter, top-100 hardest examples by physical top-k —
    // training = 6 metadata collects, scoring map-only, no join
    "el2n_select" -> ((s, dir) =>
      graft.operators.QualityModel.el2nSelect(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("rank")),
    // example-forgetting statistics (E227): per-doc prediction-flip
    // counts across the 6-step hash-oracled training trajectory — all
    // weight snapshots inlined as literals, ONE map-only pass
    "forgetting_events" -> ((s, dir) =>
      graft.operators.QualityModel.forgettingEvents(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // RHO-loss selection (E230): reducible holdout loss — main-model
    // loss minus the irreducible loss under a model trained on the
    // deterministic 20% sha256 holdout; two training chains (6 metadata
    // collects each), scoring map-only with both weight vectors inlined,
    // physical top-k + coalesce(1) rank (the E223 pattern)
    "rholoss_select" -> ((s, dir) =>
      graft.operators.QualityModel.rhoLossSelect(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("rank")),
    // TracIn attribution (E231): per-example influence on the id%97
    // probe set, summed over the 6 training checkpoints — closed-form
    // logistic gradients, one probe agg + one map-only scoring pass
    "tracin_scores" -> ((s, dir) =>
      graft.operators.QualityModel.tracinScores(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // quality-signal ensemble (E236): heuristic + trained logit + char
    // entropy, min-max standardized and averaged — six exact min/max
    // scalars inlined as literals, map-only fusion, no window/rank
    "quality_ensemble" -> ((s, dir) =>
      graft.operators.QualityModel.qualityEnsemble(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // dataset cartography (E232): confidence / variability / correctness
    // across the training trajectory + the Data Maps region verdict —
    // all 6 checkpoints literal-inlined, ONE map-only pass (E227 shape)
    "data_map" -> ((s, dir) =>
      graft.operators.QualityModel.dataMap(
        documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // Group-DRO robust training (E182, in-engine training #4): per-source
    // mean losses, multiplicative mixture-weight updates q <- q*e^(0.5*l)
    // (normalized), q-weighted gradient steps — the DoReMi domain-weight
    // learner; one per-domain agg + metadata collect per iteration
    "groupdro_train" -> ((s, dir) =>
      graft.operators.QualityModel.groupDroTrain(
        graft.operators.QualityModel.docFeaturesWith(
          documentsSpread(s, dir), "text", "lang", Seq("source")),
        Seq("x1", "x2", "x3"), "y", "source")
        .orderBy("iter", "domain")),
    // DoReMi selection (E184): the E182 action — Group-DRO over language
    // domains, then each domain keeps a deterministic hash slice
    // proportional to its learned mixture weight (max-q domain whole);
    // training is metadata collects, selection one map-only pass
    "doremi_select" -> ((s, dir) =>
      graft.operators.QualityModel.doremiSelect(
        documentsSpread(s, dir), "doc_id", "text", "lang", "lang")
        .orderBy("doc_id")),
    // end-to-end curation pipeline (E183): near-dup drop -> in-engine
    // trained quality filter (on the deduped corpus) -> deterministic
    // 90/5/5 split -> per-(split, shard) content-addressed manifest,
    // ONE declarative plan with one chained hash oracle
    "corpus_curate" -> ((s, dir) =>
      graft.operators.Curate.corpusCurate(documentsSpread(s, dir), "doc_id", "text")
        .orderBy("split", "shard")),
    // end-to-end DATA RECIPE (E237, VERDICT r15 #5): normalized dedup ->
    // quality ensemble (E236) -> RHO-loss selection (E230) -> token-
    // budget pack (E46) as ONE declarative plan — the DataComp/DCLM
    // curation shape with a FULL chained hash oracle (three training
    // chains + entropy + prefix-sum pack in one DuckDB statement)
    "data_recipe" -> ((s, dir) =>
      graft.operators.Curate.dataRecipe(documentsSpread(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // CCNet-style per-language quality tertiles (E171): head/middle/tail
    // by strictly-better mass over the per-lang DISTINCT-score histogram
    // (WindowGuard-enforced), integer comparison at the cut
    "ccnet_buckets" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documentsSpread(s, dir).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.ccnetBuckets(scored, "doc_id", "lang", "score")
        .orderBy("doc_id")
    }),
    // CCNet selection EXECUTOR (E187): drop the tail tertile of every
    // language (and unscored docs); (id, sha, length) projected BEFORE
    // the verdict join so document payloads never enter an exchange
    "ccnet_select" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documentsSpread(s, dir).select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.ccnetSelect(
        scored, "doc_id", "lang", "score", "text")
        .orderBy("doc_id")
    }),
    // per-domain top-k with ties (E178): strictly-better mass under k
    // over the per-domain distinct-score histogram - no corpus sort
    "domain_topk" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documentsSpread(s, dir).select(col("doc_id"), col("source"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.domainTopk(
        scored, "doc_id", "source", "score", 20L)
        .orderBy("doc_id")
    }),
    // per-source curation report card: volume, language spread, mean
    // quality, exact-dup exposure (E74)
    "domain_stats" -> ((s, dir) =>
      graft.operators.CorpusStats.domainReport(
        documentsSpread(s, dir), "source", "lang", "text")
        .orderBy("domain")),
    // token-distribution JSD between the E21 hash splits (E75)
    "split_divergence" -> ((s, dir) =>
      graft.operators.CorpusStats.splitDivergence(
        documentsSpread(s, dir), "doc_id", "text",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .orderBy("split_a", "split_b")),
    // curation funnel: survivors per cumulative filter stage, one scan
    "filter_funnel" -> ((s, dir) =>
      graft.operators.Funnel.filterFunnel(
        documentsSpread(s, dir), Seq(
          "has_text" -> (length(col("text")) > 0),
          "min_tokens_10" -> (TextFunctions.wsTokenCount(col("text")) >= 10),
          "lang_known" -> (TextFunctions.langId(col("text")) =!= "und"),
          "quality_045" -> (round(TextFunctions.qualityScore(col("text")), 6) >= 0.45)))),
    // quality-ranked top-10 documents per language (E107)
    "topk_by_quality" -> ((s, dir) => {
      val scored = documentsSpread(s, dir).select(
        col("doc_id"), col("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Sampling.topKByScore(
        scored, "lang", "doc_id", col("score"), k = 10)
        .orderBy("lang", "doc_id")
    }),
    // source-concentration Gini over per-domain token volume (E106)
    "gini_concentration" -> ((s, dir) =>
      graft.operators.CorpusStats.giniConcentration(
        documentsSpread(s, dir), "source", "text")),
    // one-pass CUBE rollup with grouping flags (E90)
    "corpus_cube" -> ((s, dir) =>
      graft.operators.CorpusStats.corpusCube(
        documentsSpread(s, dir), "lang", "source", "text")
        .orderBy("g_lang", "g_source", "lang", "source"))
  )
}
