package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** SparkEntry — Sampling lane of the driver-contract `queries` map (split
  * from the former 4.3k-line monolith, VERDICT r13 task 5). Self-typed
  * to the aggregator so entries use the shared helpers (lineitem,
  * documents, metricQuery, cfg, ...) unqualified. */
private[graft] trait SparkEntrySampling { this: SparkEntry.type =>

  protected def samplingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // quality-proportional deterministic sampling (E142)
    "quality_weighted_sample" -> ((s, dir) =>
      Sampling.qualityWeightedSample(
        documentsSpread(s, dir).select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score")),
        "doc_id", "score")
        .orderBy("doc_id")),
    // deterministic corpus curation (documents table): engine-portable
    // hash-bucket sampling + stable train/valid/test splits
    "sample_deterministic" -> ((s, dir) =>
      Sampling.deterministicSample(documentsSpread(s, dir), "doc_id", rate = 0.1)
        .select("doc_id").orderBy("doc_id")),
    // mixture balancing: up to 10 docs per char-length stratum, picked in
    // deterministic hash order
    "stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
        documentsSpread(s, dir), "doc_id",
        expr("length(text) div 100").cast("long"), perStratum = 10)
        .select(col("doc_id"), col("stratum").cast("long").as("stratum"))
        .orderBy("doc_id")),
    "dataset_split" -> ((s, dir) =>
      Sampling.hashSplit(
        documentsSpread(s, dir), "doc_id",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split").orderBy("doc_id")),
    // temperature-weighted mixture rebalance: languages resampled at
    // p ∝ share^0.5 keeping the corpus size constant in expectation —
    // dominant en downsampled, low-resource langs kept (rates cap at 1)
    "mixture_resample" -> ((s, dir) =>
      Sampling.mixtureResample(
        documentsSpread(s, dir), "doc_id", col("lang"), alpha = 0.5)
        .select("doc_id", "lang").orderBy("doc_id")),
    // leakage-safe split: near-dup cluster members share one split label
    // (split key = canonical cluster id, singletons split by own id)
    "leakage_safe_split" -> ((s, dir) => {
      val docs = documentsSpread(s, dir)
      val clusters = graft.operators.Clustering.dedupClusters(
        Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5))
      Sampling.leakageSafeSplit(
        docs, "doc_id", clusters,
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split").orderBy("doc_id")
    }),
    // context-window packing: distributed prefix sum over token counts in
    // doc_id order; pack = floor(tokens-before / 1000)
    "sequence_packing" -> ((s, dir) =>
      graft.operators.Packing.packSequences(
        documentsSpread(s, dir).select(
          col("doc_id"), TextFunctions.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 1000)
        .orderBy("doc_id")),
    // training-mixture composition report: docs + tokens per split x language
    "mixture_stats" -> ((s, dir) => {
      val d = Sampling.hashSplit(
        documentsSpread(s, dir), "doc_id",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select(
          col("split"),
          TextFunctions.langId(col("text")).as("lang"),
          TextFunctions.wsTokenCount(col("text")).as("ntok"))
      d.groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
        .orderBy("split", "lang")
    }),
    // reproducible-export shard manifest (E176): sha256-bucket routing,
    // order-free XOR content digest - map-side-combined, no sort
    "shard_manifest" -> ((s, dir) =>
      graft.operators.Sampling.shardManifest(documentsSpread(s, dir), "doc_id", "text")
        .orderBy("shard")),
    // UniMax budget waterfilling across languages (E166): metadata-sized
    // domain rollup, driver recursion, integer-exact
    "unimax_mix" -> ((s, dir) =>
      Sampling.unimaxAllocation(documentsSpread(s, dir), "lang", budget = 400L)
        .orderBy("domain")),
    // E212: curriculum epoch assignment — best-quality-first consumption
    // order, each doc lands in floor(tokens_before / 20000); the global
    // running sum is a WindowGuarded per-score rollup + per-score
    // partitioned windows, never a corpus-sized single task.
    "curriculum_epochs" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val d = documentsSpread(s, dir).select(
        col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"),
        TextFunctions.wsTokenCount(col("text")).as("toks"))
      graft.operators.Ranking.curriculumEpochs(
        d, "doc_id", "q", "toks", epochTokens = 20000L)
        .orderBy("id")
    }),
    // E210: temperature-scaled sampling mix (the mT5 alpha=0.3 recipe)
    // over languages — the baseline mixture E166's UniMax replaces.
    "temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(
        documentsSpread(s, dir), "lang", alpha = 0.3, targetTotal = 10000L)
        .orderBy("domain")),
    // E245: Hedge/multiplicative-weights ONLINE mixing replay over time
    // batches (deterministic full-information bandit) — where E182/E184
    // learn weights from a proxy model's loss, this tunes the mixture
    // from a model-free per-batch reward stream
    "hedge_mix" -> ((s, dir) =>
      graft.operators.QualityModel.hedgeMix(
        documentsSpread(s, dir), "doc_id", "text", "lang", "source")
        .orderBy("round", "domain")),
    // greedy token-budget curation: best-quality prefix within 20k tokens
    "budget_select" -> ((s, dir) =>
      graft.operators.Packing.selectUnderBudget(
        documentsSpread(s, dir).select(
          col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).as("n_tokens"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score")),
        "doc_id", "n_tokens", "score", budget = 20000L)
        .orderBy("doc_id")),
    // deterministic training-order shuffle into 16 hash shards
    "corpus_shuffle" -> ((s, dir) =>
      Sampling.shuffleShards(documentsSpread(s, dir), "doc_id", nShards = 16)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")),
    // dedup-weighted effective corpus size (E89)
    "effective_tokens" -> ((s, dir) =>
      graft.operators.CorpusStats.effectiveTokens(
        documentsSpread(s, dir), "doc_id", "text"))
  )
}
