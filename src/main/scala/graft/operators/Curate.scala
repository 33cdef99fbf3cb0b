package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation (E183) — the whole pipeline a
  * training-data export actually runs, composed as ONE declarative
  * plan: near-dup drop (the E181 rule over E2's exact Jaccard verdict)
  * → in-engine-trained quality filter (the E180 train-then-act step,
  * learned on the ALREADY-DEDUPED corpus — the order production
  * pipelines use, so boilerplate mass can't steer the classifier) →
  * deterministic 90/5/5 split (E21's cumulative hash bounds) →
  * per-(split, shard) content-addressed manifest (E176's commutative
  * XOR digest). A user of the pieces runs four jobs and plumbs four
  * intermediate datasets; this is the same algebra as one Catalyst plan
  * with one hash oracle over the final manifest.
  *
  * Scale shape, stage by stage: the removal set is ids only and
  * BROADCAST anti-joins onto the corpus (duplicate-count-sized — never
  * a payload shuffle); split, shard, per-doc fingerprint and length are
  * computed IN THE SAME map pass as the classifier features, so after
  * the one corpus scan everything downstream — the 6 training
  * aggregations, the scoring filter, the final rollup — runs over a
  * metadata-sized checkpointed relation (features + ids + 8-byte
  * fingerprints; document bodies are read once and never move). The
  * manifest digest is the E176 order-free XOR, map-side partial.
  *
  * Determinism: every stage is the proven algebra of its standalone
  * operator — E2's pair relation, E180's fixed-order logit with 6-dp
  * literal weights, the shared sha256 bucket for split/shard routing,
  * the 60-bit `sha256(id:text)` fingerprint — so DuckDB replays the
  * ENTIRE pipeline (jaccard CTEs → anti join → training chain over the
  * deduped relation → scoring → split/shard rollup) and the manifest
  * hash-matches cell for cell.
  *
  * Cites reference scope: the reference profiles tables one at a time
  * (Profiler.scala:166-253) and takes no curation action — extension
  * per SURVEY §2.E. */
object Curate {

  /** Returns the export manifest `(split, shard, n_docs, total_chars,
    * min_id, max_id, digest)` of the curated corpus. */
  def corpusCurate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      jaccardN: Int = 3,
      jaccardThreshold: Double = 0.5,
      iterations: Int = 6,
      lr: Double = 8.0,
      nShards: Int = 8): DataFrame = {
    val id = col(idCol)
    val removed = Dedup
      .ngramJaccard(docs, idCol, textCol, jaccardN, jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val deduped = docs.join(broadcast(removed), Seq(idCol), "left_anti")
    val fp = conv(substring(sha2(concat(
      id.cast("string"), lit(":"), col(textCol)), 256), 1, 15), 16, 10)
      .cast("long")
    val annotated = Sampling
      .hashSplit(deduped, idCol,
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
      .withColumn("_shard", Sampling.hashBucket(id, "shard") % nShards)
      .withColumn("_fp", fp)
      .withColumn("_len", length(col(textCol)).cast("long"))
    val fid = QualityModel.docFeaturesLabeled(
      annotated, textCol, QualityModel.qualityLabel(textCol),
      Seq(idCol, "split", "_shard", "_fp", "_len"))
      .localCheckpoint(true) // training chain + scoring read this, not the corpus
    val last = QualityModel.logregTrain(
      fid.select("x1", "x2", "x3", "y"), Seq("x1", "x2", "x3"), "y",
      iterations, lr)
      .orderBy(col("iter").desc).head()
    val w = (0 to 3).map(j => last.getAs[Double](s"w$j"))
    val z = lit(w(0)) + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    fid
      .where(z >= 0)
      .groupBy(col("split"), col("_shard").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_len")).as("total_chars"),
        min(id).as("min_id"),
        max(id).as("max_id"),
        expr("bit_xor(_fp)").as("digest"))
  }

  /** Composite quality gate (E198) — the modern three-stage web-corpus
    * gate (the FineWeb/RefinedWeb recipe): heuristic RULES
    * ([[CorpusStats.gopherRules]], integer cuts) ∧ per-language
    * perplexity-proxy TERTILE ([[Ranking.ccnetBuckets]], drop the tail
    * and the unscored) ∧ learned CLASSIFIER
    * ([[QualityModel.naiveBayesFilter]], one-pass NB on the exact
    * decimal log-odds) — three independent verdicts with different
    * failure modes (a rule battery can't see fluency; a perplexity
    * tertile is relative, not absolute; a classifier inherits its
    * label), composed conjunctively with every stage's verdict kept in
    * the row so a curator reads WHY a document fell.
    *
    * Scale shape: each verdict is its own sub-DAG over the same source
    * scan — the rules map-only, the tertile windowing its per-language
    * DISTINCT-score histogram, NB its ≤-buckets histogram — and the
    * composition is an id-keyed join of METADATA relations ((id, bool,
    * bucket, odds) + the sha/length projected in the same map pass as
    * the source read); document payloads never enter an exchange.
    *
    * Cites reference scope: curation gates are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def qualityGate(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val rules = CorpusStats.gopherRules(df, idCol, textCol)
      .select(col(idCol), col("keep").as("rules_ok"))
    val scored = df.select(
      col(idCol),
      TextFunctions.langId(col(textCol)).as("lang"),
      round(TextFunctions.qualityScore(col(textCol)), 6).as("score"))
    val buckets = Ranking.ccnetBuckets(scored, idCol, "lang", "score")
      .select(col(idCol), col("bucket"))
    val nb = QualityModel.naiveBayesFilter(df, idCol, textCol)
      .select(col(idCol), col("keep").as("nb_ok"), col("log_odds"))
    val bkt = coalesce(col("bucket"), lit("none"))
    df.select(
        col(idCol),
        sha2(col(textCol), 256).as("text_sha"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(rules, Seq(idCol))
      .join(buckets, Seq(idCol), "left")
      .join(nb, Seq(idCol))
      .select(
        col(idCol), col("rules_ok"), bkt.as("bucket"),
        col("nb_ok"), col("log_odds"),
        (col("rules_ok") && col("nb_ok") &&
          bkt =!= "tail" && bkt =!= "none").as("keep"),
        col("text_sha"), col("n_chars"))
  }

  /** Per-domain dedup caps on the REGISTERED domain (E238) — the
    * CCNet/RefinedWeb step the E53 raw-host grouping approximates: every
    * URL keys to its PSL-semantics registrable domain
    * ([[graft.functions.DomainFunctions]] — second-level ccTLDs,
    * wildcards, exceptions, punycode, userinfo/ports stripped), and each
    * domain keeps at most `cap` documents in deterministic id order.
    * Hosts with NO registrable domain (bare public suffixes, single
    * labels) and IP literals cap per host.
    *
    * Scale shape: host/domain extraction is one codegen'd map pass (no
    * UDF); the cap is one window keyed by the domain (the E107
    * `topKByScore` pattern, same caveat: a pathologically hot domain
    * sorts within one task — pre-trim with the E52 key-skew profile
    * when a domain outgrows task memory). Returns every input row with
    * its verdict so the curator reads what fell and why. */
  def domainCaps(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      cap: Long): DataFrame = {
    require(cap > 0, s"domainCaps: cap=$cap")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.DomainFunctions.hostOf(col(urlCol))
    val base = df.select(
      col(idCol), h.as("host"),
      graft.functions.DomainFunctions.registeredDomain(h)
        .as("registered_domain"))
    val key = coalesce(col("registered_domain"), col("host"), lit(""))
    val w = Window.partitionBy(key).orderBy(col(idCol))
    base
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("domain_rank") <= cap)
  }

  /** End-to-end data recipe (E237) — the DataComp/DCLM curation shape
    * (VERDICT r15 #5), composing the selection shelf WITHOUT a
    * driver-side seam: normalized near-exact dedup (E138's rule) →
    * quality-signal ensemble over the survivors (E236 — heuristic +
    * trained logit + char entropy, min-max fused, keep ≥ 0.5) →
    * RHO-loss selection over the ensemble-kept corpus (E230 — reducible
    * holdout loss, top-`topK`) → token-budget pack of the selection
    * (E46's distributed prefix sum, ranked by the ensemble score).
    * Returns the final manifest: one row per packed document with every
    * stage's signal (`ensemble`, `rho`, `sel_rank`, `n_tokens`,
    * `cum_tokens`).
    *
    * Scale shape, stage by stage: the dedup removal set is
    * duplicate-count-sized ((hash, id) metadata shuffle, then a
    * BROADCAST anti-join — the E183 pattern; payloads never move for
    * dedup); the ensemble verdict is corpus-sized, so filtering to the
    * kept corpus is the pipeline's ONE id-keyed payload exchange
    * (unavoidable: the verdict needs two corpus statistics passes);
    * both RHO training chains are 6 metadata-sized collects each over
    * the checkpointed kept relation; the selection is a physical top-k
    * (`TakeOrderedAndProject`, never a full sort); the pack runs over
    * ≤ `topK` rows via [[Packing.selectUnderBudget]]'s two-phase prefix
    * sum. Three training chains total (ensemble model + RHO main + RHO
    * irreducible), 18 metadata collects, two corpus scans per stage
    * relation — all stage relations localCheckpointed so no stage
    * rescans another's plan.
    *
    * Determinism: every stage is its standalone operator's proven
    * algebra (E138 sha-grouped min-id, E236 fixed-order fusion over
    * exact min/max, E230 6-dp loss difference, E46 (score DESC, id)
    * prefix sum), so DuckDB replays the ENTIRE pipeline in one
    * statement — a FULL hash oracle for a four-stage curation run.
    *
    * Cites reference scope: curation recipes are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def dataRecipe(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 150,
      budget: Long = 8000L,
      iterations: Int = 6,
      lr: Double = 8.0): DataFrame = {
    require(topK > 0, s"dataRecipe: topK=$topK")
    require(budget > 0, s"dataRecipe: budget=$budget")
    // stage 1 — normalized near-exact dedup (E138's canonicalization:
    // lower → \s+ collapse → trim; survivors keep the min id per key)
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    val keyed = docs.select(
      col(idCol).as("_id"),
      sha2(coalesce(norm, lit("null")), 256).as("_h"))
    val mins = keyed.groupBy("_h").agg(min(col("_id")).as("_keep"))
    val removed = keyed.join(mins, Seq("_h"))
      .where(col("_id") =!= col("_keep"))
      .select(col("_id").as(idCol))
    val survivors = docs.join(broadcast(removed), Seq(idCol), "left_anti")
      .localCheckpoint(true) // consumers: ensemble (training + signals)
    // stage 2 — quality ensemble over the survivors; keep fused ≥ 0.5
    val ens = QualityModel.qualityEnsemble(
      survivors, idCol, textCol, iterations, lr)
    val kept = survivors
      .join(ens.where(col("keep")).select(col(idCol), col("ensemble")),
        Seq(idCol))
      .localCheckpoint(true) // consumers: two RHO chains + token projection
    // stage 3 — RHO-loss selection over the ensemble-kept corpus
    val sel = QualityModel.rhoLossSelect(
      kept, idCol, textCol, iterations, lr, topK)
      .select(col(idCol), col("rho"), col("rank").as("sel_rank"))
    // stage 4 — token-budget pack of the ≤ topK selected docs, ranked
    // by the ensemble score (quality-per-token curation)
    val packIn = kept
      .select(col(idCol), col("ensemble"),
        graft.functions.TextFunctions.wsTokenCount(col(textCol))
          .as("n_tokens"))
      .join(broadcast(sel), Seq(idCol))
    Packing.selectUnderBudget(packIn
        .select(col(idCol), col("n_tokens"), col("ensemble")),
        idCol, "n_tokens", "ensemble", budget)
      .join(broadcast(sel), Seq(idCol))
      .select(col(idCol), col("ensemble"), col("rho"), col("sel_rank"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Per-domain quantile normalization of a quality score (E247) — the
    * FineWeb/CCNet per-dump-threshold discipline: a GLOBAL quality cut
    * lets verbose domains crowd out terse ones because raw scores are
    * not comparable across domains; rank-normalizing WITHIN each domain
    * (explicit percentile `pr = (rn−1)/(n−1)`, 0 for a singleton) makes
    * "keep the top half of every domain" mean the same thing
    * everywhere. Scores are the 6-dp E9 quality signal; rank ties break
    * by id, so the percentile — and the `selected = pr ≥ 1 − keepFrac`
    * verdict — is a pure function of the corpus, hash-replayable (the
    * percentile algebra is written out rather than delegated to
    * engine-defined PERCENT_RANK edge semantics).
    *
    * Scale shape: one window keyed by domain (rank + count share the
    * partitioning — ONE shuffle of (id, domain, score) triples, the
    * payload never moves); domains are web-dump-sized, not row-sized,
    * and the per-domain sort is the windowed sort a 1000-executor
    * cluster already does for any ranked selection. */
  def domainQuantileNorm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      keepFrac: Double = 0.5): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0,
      s"domainQuantileNorm: keepFrac=$keepFrac out of (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col(idCol), col(domainCol).as("domain"),
        round(graft.functions.TextFunctions.qualityScore(col(textCol)), 6)
          .as("quality"))
      .where(col("quality").isNotNull)
    val w = Window.partitionBy("domain")
      .orderBy(col("quality").asc, col(idCol).asc)
    base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("domain")))
      .withColumn("pct_rank",
        round(when(col("n") > 1,
          (col("rn") - 1).cast("double") / (col("n") - 1).cast("double"))
          .otherwise(lit(0.0)), 6))
      .withColumn("selected", col("pct_rank") >= 1.0 - keepFrac)
      .select(col(idCol), col("domain"), col("quality"),
        col("pct_rank"), col("selected"))
  }
}
