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
}
