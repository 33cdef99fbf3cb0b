package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Spark's `df.sample` is seeded per-partition: the selected rows change
  * with partitioning, cluster size and Spark version — useless for
  * reproducible corpus curation. These operators instead derive a hash
  * bucket in [0, 10000) from SHA-256 of (key ++ salt), so
  *   - membership is a pure function of the row's key: stable across runs,
  *     partitionings, engines (DuckDB computes the identical bucket —
  *     oracle-verified), and resilient to data reordering;
  *   - a sample is a strict subset of any larger-rate sample with the same
  *     salt (nested samples for scaling-law runs);
  *   - train/validation/test splits are disjoint by construction and stay
  *     stable when the corpus grows (a document's split never changes).
  *
  * Scale shape: pure map-side scan + filter/projection — no shuffle, no
  * state; the plan is a single WholeStageCodegen over the scan (asserted
  * by PlanAuditSpec).
  */
object Sampling {

  /** Bucket granularity: rates resolve to 0.01% steps. */
  val Buckets = 10000

  /** Hash bucket in [0, Buckets) — first 8 hex chars of
    * `sha256(key ++ salt)` read as an unsigned int (identical in DuckDB:
    * `('0x' || substr(sha256(k || salt), 1, 8))::BIGINT % 10000`). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(sha2(concat(key.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Reproducible-export shard manifest (E176) — the content-addressed
    * plan a training-data EXPORT ships with: documents route to
    * `nShards` shards by the deterministic sha256 bucket (so any engine
    * reproduces the routing), and each shard row carries the counts a
    * reader validates against plus a commutative 60-bit content digest
    * — XOR of per-document fingerprints `sha256(id:text)[0,15]` — that
    * changes if ANY document's id or body changes, yet needs no sort
    * and no ordered concatenation (order-free, so the shard never
    * materializes in one place; the bit_xor combine is map-side
    * partial). Returns `(shard, n_docs, total_chars, min_id, max_id,
    * digest)`. */
  def shardManifest(
      df: DataFrame, idCol: String, textCol: String,
      nShards: Int = 16): DataFrame = {
    require(nShards >= 1)
    val fp = conv(substring(sha2(concat(
      col(idCol).cast("string"), lit(":"), col(textCol)), 256), 1, 15), 16, 10)
      .cast("long")
    df
      .select(
        (hashBucket(col(idCol), "shard") % nShards).as("shard"),
        col(idCol).as("_id"),
        length(col(textCol)).cast("long").as("_len"),
        fp.as("_fp"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_len")).as("total_chars"),
        min(col("_id")).as("min_id"),
        max(col("_id")).as("max_id"),
        expr("bit_xor(_fp)").as("digest"))
  }

  /** Keep rows whose bucket falls below `rate` — a deterministic,
    * reproducible `rate`-fraction sample keyed on `keyCol`. */
  def deterministicSample(
      df: DataFrame, keyCol: String, rate: Double, salt: String = "graft"): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    df.where(hashBucket(col(keyCol), salt) < math.round(rate * Buckets))
  }

  /** Quality-weighted deterministic sampling (E142) — keep each row with
    * probability ∝ its own score (the DCLM-style "sample by quality, not
    * by threshold" curation move: a hard cutoff discards the whole
    * mid-quality stratum; proportional sampling keeps a calibrated
    * slice of every band). The coin is the same [[hashBucket]] hash —
    * `bucket(key) < round(score·10000)` — so the sample is a pure
    * function of (key, score): reproducible across runs, engines and
    * partitionings, and AUDITABLE (the oracle replays the exact
    * decision). Null/NaN scores carry no keep-probability and drop.
    *
    * `scoreCol`'s domain is [0, 1] — a score IS the keep-probability.
    * Out-of-domain scores clamp to the nearest edge (an explicit
    * `least/greatest` on the bucket bound, mirrored in the oracle):
    * > 1 saturates to keep-always, < 0 to drop-always — the probability
    * semantics extended continuously, never a silent wraparound of the
    * bucket comparison.
    *
    * One shuffle-free map-side filter at any scale; `scoreCol` must be
    * engine-portable (6-dp rounded). */
  def qualityWeightedSample(
      df: DataFrame, keyCol: String, scoreCol: String,
      salt: String = "graft"): DataFrame = {
    val score = col(scoreCol)
    val keepBound = least(
      greatest(round(score * Buckets).cast("long"), lit(0L)),
      lit(Buckets))
    df
      .where(score.isNotNull && !isnan(score))
      .where(hashBucket(col(keyCol), salt) < keepBound)
  }

  /** Stratified sampling: keep up to `perStratum` rows per stratum, chosen
    * in deterministic hash order (`(hashBucket, key)` — reproducible across
    * runs/partitionings/engines, like [[deterministicSample]]) — the
    * mixture-balancing step of corpus curation (equalize domains/languages
    * before training).
    *
    * Scale shape: one shuffle keyed on the stratum + a per-stratum
    * `row_number` window. A single stratum sorts within one task — fine up
    * to ~10⁸ rows per stratum; for strata far beyond that, pre-trim
    * map-side with `hashPrefilter = Some(bucketBound)` (keeps only rows
    * with bucket < bound before the window — EXACT as long as every
    * stratum retains ≥ perStratum rows, since the window order is the
    * bucket itself: the kept prefix in hash order is unchanged). */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: Column,
      perStratum: Int,
      salt: String = "graft",
      hashPrefilter: Option[Int] = None): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    val b = hashBucket(col(keyCol), salt)
    val pre = hashPrefilter match {
      case Some(bound) => df.where(b < bound)
      case None => df
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(b.asc, col(keyCol).asc)
    pre.withColumn("stratum", strataCol)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
      .drop("rn")
  }

  /** Assign each row a split label by consecutive bucket ranges, e.g.
    * `Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)`. Fractions must
    * sum to 1 (within bucket granularity); ranges are disjoint and
    * exhaustive, so every row with a non-null key gets exactly one label.
    * NULL keys have no hash bucket, hence no membership: their label is
    * null — consistent with [[deterministicSample]], which excludes them
    * (membership is a pure function of the key, and NULL has none). */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split fractions must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    // bounds from CUMULATIVE fractions: per-split rounding would reject
    // legitimate sets (three 1/3s each round to 3333, summing to 9999)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(cum => math.round(cum * Buckets))
    require(bounds.last == Buckets, s"internal: ${bounds.last}")
    val b = hashBucket(col(keyCol), salt)
    val label = splits.map(_._1).zip(bounds).init
      .foldLeft(when(lit(false), lit(""))) { case (acc, (name, hi)) =>
        acc.when(b < hi, lit(name))
      }
      .otherwise(lit(splits.last._1))
    df.withColumn("split", when(col(keyCol).isNotNull, label))
  }

  /** Deterministic corpus shuffle + sharding: assign every row a shard
    * (`bucket mod nShards` — exactly balanced when `nShards` divides
    * [[Buckets]]) and a position within the shard in FULL-hash order
    * (`sha256(key ++ salt)` hex, key tie-break). This is the "global
    * shuffle" step before training-data serialization: hash order is
    * statistically random with respect to any source ordering, yet a pure
    * function of the key — re-runs, engine ports and incremental rebuilds
    * produce the identical training order.
    *
    * The sort key must be the FULL digest, not the 10⁴-value bucket: with
    * only 10000 order values, a billion-row shard would contain ~10⁵-row
    * runs ordered by `keyCol` — i.e. long stretches of SOURCE order
    * (chronological ids, single-crawl runs), exactly what a training
    * shuffle exists to destroy. The hex digest string orders identically
    * in DuckDB, keeping the oracle exact.
    *
    * Scale shape: one shuffle keyed on the shard; each shard sorts
    * independently (a within-task sort at ~corpus/nShards rows — raise
    * `nShards` with corpus size so shards stay task-sized). */
  def shuffleShards(
      df: DataFrame, keyCol: String, nShards: Int, salt: String = "graft"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val b = hashBucket(col(keyCol), salt)
    val hx = sha2(concat(col(keyCol).cast("string"), lit(salt)), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(hx.asc, col(keyCol).asc)
    df.where(col(keyCol).isNotNull)
      .withColumn("shard", (b % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Leakage-safe dataset split: every member of a near-dup CLUSTER gets
    * the SAME split label — the guard against eval leakage that a plain
    * per-document [[hashSplit]] cannot give (near-identical documents A
    * and A' landing in train and test silently inflate eval scores; the
    * standard decontamination failure). The split key is the cluster's
    * canonical id for clustered documents ([[Clustering.dedupClusters]]
    * output) and the document's own key for singletons, then bucketed by
    * the engine-portable [[hashBucket]] — so splits stay disjoint,
    * deterministic, and stable as the corpus grows, and a whole duplicate
    * cluster moves between splits as one atom.
    *
    * `clusters` is a `(doc_id, cluster_id)` relation covering only
    * clustered docs (dedupClusters' shape — singletons absent). Scale
    * shape: one left equi-join on the id (clusters is proportional to the
    * duplicated subset, typically ≪ corpus; Catalyst broadcasts when
    * small) + the map-side bucket filter — no extra shuffle of the
    * corpus. NULL keys get a null label, like [[hashSplit]]. */
  def leakageSafeSplit(
      df: DataFrame,
      keyCol: String,
      clusters: DataFrame,
      splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    val keyed = df.join(
      clusters.select(col("doc_id").as(keyCol), col("cluster_id")),
      Seq(keyCol), "left")
      .withColumn("_split_key", coalesce(col("cluster_id"), col(keyCol)))
    hashSplit(keyed, "_split_key", splits, salt)
      .drop("_split_key", "cluster_id")
  }

  /** Temperature-weighted mixture resampling (the multilingual/domain
    * rebalancing step of corpus curation — XLM-R §3.1 / mBERT exponential
    * smoothing): each stratum (language, source domain) is re-sampled at
    * `p_i ∝ q_i^alpha` where `q_i` is its corpus share, normalized so the
    * EXPECTED kept size is `targetRows` (`None` = the corpus size — pure
    * rebalance). `alpha < 1` flattens the mixture: dominant strata are
    * downsampled, low-resource strata keep (up to) everything — per-stratum
    * rates cap at 1, so this operator never upsamples (duplicate-free by
    * construction; repeat-to-upsample belongs to the training loader).
    *
    * Membership reuses [[hashBucket]]: a pure function of the row's key, so
    * the kept set is stable across runs/partitionings/engines and NESTED
    * across alphas for a fixed stratum profile (a lower rate keeps a strict
    * subset). Rows with a NULL key or NULL stratum have no bucket/rate and
    * are dropped.
    *
    * Determinism contract (the engine-portability edge that makes this
    * oracle-exact): shares and the normalizer avoid any FP whose value
    * could differ across engines — `q_i^alpha` is computed in double
    * (IEEE-correctly-rounded for the sqrt case `alpha = 0.5`; document your
    * own alpha's portability before relying on cross-engine hashes),
    * QUANTIZED to DECIMAL(38,6) (the engine's established cross-engine
    * contract), and summed exactly as decimal, so the final
    * `round(rate · 10⁴)` bucket bound is bit-identical in DuckDB.
    *
    * Scale shape: one tiny stratum-count aggregation (map-side combined),
    * two single-row cross joins on metadata-sized relations, then ONE
    * broadcast join + codegen'd filter over the corpus — no corpus shuffle,
    * no state. */
  def mixtureResample(
      df: DataFrame,
      keyCol: String,
      strataCol: Column,
      alpha: Double,
      targetRows: Option[Long] = None,
      salt: String = "graft"): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    import java.math.{BigDecimal => JBigDecimal, RoundingMode}
    // stratum profile: metadata-sized (one row per language/domain) — the
    // bound arithmetic runs driver-side on the collected counts, the
    // Correlation precedent. Every step is cross-engine exact: double
    // division and pow (correctly rounded for alpha = 0.5) on identical
    // inputs, quantization via setScale(6, HALF_UP) == Spark's
    // double→DECIMAL(38,6) cast, exact decimal sum for the normalizer.
    val counts = df.where(strataCol.isNotNull)
      .groupBy(strataCol.as("_stratum")).agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => (r.get(0), r.getLong(1)))
    require(counts.nonEmpty, "no non-null strata")
    val total = counts.map(_._2).sum
    // quantization floor: a stratum whose smoothed share rounds to
    // 0.000000 at scale 6 (share < ~1e-12 at alpha=0.5 — routine among
    // long-tail domains of a 10^9-row corpus) must not silently drop to
    // rate 0; it is exactly the low-resource stratum the operator
    // promises to keep. Clamp to one quantum (1e-6): the stratum's rate
    // then caps at 1 as intended, the normalizer stays nonzero (no NaN
    // rate), and the oracle mirrors with GREATEST.
    val floorQ = new JBigDecimal("0.000001")
    val smoothed = counts.map { case (stratum, n) =>
      val sd = JBigDecimal.valueOf(math.pow(n.toDouble / total.toDouble, alpha))
        .setScale(6, RoundingMode.HALF_UP).max(floorQ)
      (stratum, n, sd)
    }
    val normalizer = smoothed.map(_._3).reduce(_.add(_))
    val target = targetRows.map(_.toDouble).getOrElse(total.toDouble)
    val bounds = smoothed.map { case (stratum, n, sd) =>
      val rate = math.min(
        1.0, sd.doubleValue() / normalizer.doubleValue() * target / n.toDouble)
      val bound = JBigDecimal.valueOf(rate * Buckets)
        .setScale(0, RoundingMode.HALF_UP).longValueExact()
      (stratum, bound)
    }
    val spark = df.sparkSession
    val strataType = df.select(strataCol.as("_stratum")).schema.head.dataType
    val boundsDf = spark.createDataFrame(
      java.util.Arrays.asList(
        bounds.map(b => org.apache.spark.sql.Row(b._1, b._2)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_stratum", strataType),
        org.apache.spark.sql.types.StructField(
          "_bound", org.apache.spark.sql.types.LongType, nullable = false))))
    df.join(broadcast(boundsDf), strataCol === col("_stratum"))
      .where(hashBucket(col(keyCol), salt) < col("_bound"))
      .drop("_stratum", "_bound")
  }

  /** Quality-ranked top-k per group (E107) — curation's final cut: keep
    * the BEST `k` documents of every domain/language by a score column
    * (vs [[stratifiedSample]]'s hash-ordered cap, which is fair but
    * quality-blind). Deterministic total order (score DESC, key ASC) so
    * ties cannot flap across runs/engines. One stratum-keyed shuffle +
    * per-group rank window; a pathologically hot group sorts within one
    * task — pre-trim with a score threshold filter (map-side, exact as
    * long as ≥ k rows survive per group) when a group outgrows task
    * memory. */
  def topKByScore(
      df: DataFrame, groupCol: String, keyCol: String, scoreCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(scoreCol.desc, col(keyCol).asc)
    df.withColumn("_rank", row_number().over(w))
      .where(col("_rank") <= k)
      .drop("_rank")
  }

  /** Exact-quantile bucket assignment (E88) — curriculum/stratification
    * prep: each row labeled with which of `nBuckets` equal-population
    * value buckets it falls in (deciles for nBuckets=10), using EXACT
    * interpolated percentile boundaries, not hash pseudo-strata.
    *
    * Scale shape: the n−1 boundaries are ONE aggregation row (the exact
    * percentile aggregate, the N8-twin contract) broadcast back over the
    * corpus scan; assignment is a codegen'd comparison chain — no second
    * shuffle, no sort. Boundaries are quantized to 6 dp BEFORE the
    * comparison on BOTH engines, so a last-ulp interpolation difference
    * between implementations cannot flip a value across a bucket edge.
    * Null values get a null bucket. */
  def quantileBuckets(
      df: DataFrame, idCol: String, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least two buckets")
    val v = col(valueCol)
    val boundAggs = (1 until nBuckets).map(i =>
      round(percentile(v, lit(i.toDouble / nBuckets)), 6).as(s"_q$i"))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    val bucket = (1 until nBuckets)
      .map(i => when(v > col(s"_q$i"), 1).otherwise(0))
      .reduce(_ + _)
    df.select(col(idCol), v)
      .crossJoin(broadcast(bounds))
      .select(col(idCol), v,
        when(v.isNull, lit(null).cast("int"))
          .otherwise(bucket).as("bucket"))
  }

  /** DSIR importance weights (E157) — Data Selection via Importance
    * Resampling (Xie et al., NeurIPS '23): score every raw document by
    * how target-like its hashed n-gram profile is,
    * `log w(doc) = Σ_b c_b(doc) · (log p̂_target(b) − log p̂_raw(b))`,
    * the log importance ratio under bag-of-hashed-ngrams unigram models.
    * Downstream, sampling ∝ w (Gumbel top-k over `log_weight`) selects a
    * raw subset distributionally close to the target — the principled
    * replacement for hard quality-threshold filters.
    *
    * Features are the paper's: word unigrams AND bigrams, hashed into
    * `buckets` buckets ([[graft.functions.RollingHash]], codegen'd — the
    * oracle recomputes the identical 31-adic fold) — collisions are part
    * of the MODEL (hashing trick), not an approximation to audit.
    * `p̂_target` counts feature occurrences of documents matching
    * `isTarget` (null → false), `p̂_raw` counts ALL documents, both
    * Laplace-smoothed (+1 per bucket).
    *
    * Cross-engine determinism: per-bucket log-ratios are computed once
    * (ln of the same double division on both engines), quantized
    * `ROUND(·,12) → DECIMAL(38,12)` so per-document sums are exact and
    * order-independent (the bigram-LM contract), rendered
    * `ROUND(double, 6)`.
    *
    * Scale shape: one tokenize+explode pass; the histogram is a
    * `buckets`-row aggregate (map-side combined); the ratio table
    * BROADCASTS back onto the feature stream; the per-document sum is
    * one shuffle of (id, decimal-partial) pairs. Linear in corpus size,
    * no pairwise anything; `buckets` (10⁴–10⁶ in production) never
    * leaves executor memory.
    *
    * Cites reference scope: data selection is absent from awsdataprofiler
    * (Profiler.scala:166-253 profiles only) — extension per SURVEY §2.E. */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 64): DataFrame = {
    require(buckets > 0, "need a positive bucket count")
    graft.functions.RollingHash.register(df.sparkSession)
    val toks = col("_toks")
    val bigrams = when(
      size(toks) >= 2,
      transform(
        sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))
    ).otherwise(array())
    // one tokenize pass; features = unigrams ++ bigrams, exploded, hashed
    val feats = graft.profiler.ScanMetrics.spread(df)
      .select(
        col(idCol).as("id"),
        coalesce(isTarget, lit(false)).as("is_t"),
        graft.functions.TextFunctions.wsTokens(lower(col(textCol))).as("_toks"))
      .select(
        col("id"), col("is_t"),
        explode(concat(toks, bigrams)).as("f"))
      .select(
        col("id"), col("is_t"),
        pmod(call_function("rolling_hash", col("f")), lit(buckets.toLong))
          .as("bucket"))
      .localCheckpoint(true) // two consumers: histogram + per-doc sum
    val hist = feats.groupBy("bucket").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = hist.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lr = hist.crossJoin(broadcast(tot)).select(
      col("bucket"),
      round(
        log((col("ct") + 1L).cast("double") / (col("nt") + buckets).cast("double"))
          - log((col("cr") + 1L).cast("double") / (col("nr") + buckets).cast("double")),
        12).cast("decimal(38,12)").as("lr"))
    val perDoc = feats
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("s"))
    // zero-feature documents (empty text) carry the empty product: log 1 = 0
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("s"), lit(0)).cast("double"), 6).as("log_weight"))
  }

  /** DSIR selection (the ACTION half of [[dsirWeights]]): the paper's
    * Gumbel top-k trick — adding independent Gumbel(0,1) noise to each
    * document's log weight and keeping the k largest keys draws a
    * WITHOUT-REPLACEMENT sample distributed ∝ w (Vieira '14; Xie et al.
    * §2.2 use exactly this for the resampling step). The noise is
    * deterministic here: `u = (hashBucket(id, salt) + 0.5) / 10000`
    * (the engine's reproducible-sampling primitive — mid-bucket so u is
    * never 0 or 1), `g = −ln(−ln u)`, quantized ROUND(·,12) before the
    * sum and ROUND(·,6) at the key so both engines rank identical
    * doubles.
    *
    * Scale shape: [[dsirWeights]]' linear pipeline + one global
    * top-k (TakeOrderedAndProject — per-partition heaps of k, never a
    * global sort). Returns the k selected `(idCol, log_weight,
    * select_key)` rows, best first. */
  def dsirSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      k: Int,
      salt: String = "graft",
      buckets: Int = 64): DataFrame = {
    require(k > 0, "need a positive selection size")
    val u = (hashBucket(col(idCol), salt).cast("double") + 0.5) / Buckets
    dsirWeights(df, idCol, textCol, isTarget, buckets)
      .withColumn("_g", round(-log(-log(u)), 12))
      .select(
        col(idCol), col("log_weight"),
        round(col("log_weight") + col("_g"), 6).as("select_key"))
      .orderBy(col("select_key").desc, col(idCol))
      .limit(k)
  }

  /** UniMax budget allocation (E166) — the multi-domain sampling budget
    * allocator (Chung et al., "UniMax: Fairer and More Effective Language
    * Sampling", ICLR '23, applied to domains instead of languages):
    * given a total document budget, spread it as UNIFORMLY as possible
    * across domains, capping each domain at its available count — the
    * principled alternative to temperature sampling's tail starvation.
    * Classic waterfilling: visit domains by (count asc, domain asc);
    * each gets `min(count, floor(remaining / domains_left))` — small
    * domains take what they have, the freed budget re-spreads over the
    * rest. Integer arithmetic end-to-end (floor division), so the
    * allocation is engine-exact; the floor remainders stay unallocated
    * (≤ #domains docs, reported via the allocation sum).
    *
    * Scale shape: ONE map-side-combined domain rollup (the corpus
    * relation reduces to ≤ #domains rows); the waterfill runs over that
    * metadata-sized relation driver-side (the hybrid-CC / funnel
    * precedent) and the result is the per-domain sampling plan a
    * [[mixtureResample]]-style pass consumes. Returns
    * `(domain, n_docs, allocated, saturated)` — `saturated` marks
    * domains whose full count was taken. */
  /** Temperature-scaled sampling mix (E210) — the mT5/multilingual
    * baseline [[unimaxAllocation]] (E166) was designed to replace, still
    * the mixture every ablation reports against: domain i is sampled
    * proportionally to `c_i^α` (α < 1 flattens the head and upweights
    * the tail; α = 1 is proportional, α → 0 uniform). Emits per domain:
    * count, the temperature weight, the proportional weight it
    * replaces, the boost ratio (tail languages read > 1), and the
    * integer target allocation under `targetTotal`.
    *
    * Determinism: `c^α` is `EXP(α·LN(c))` on BOTH engines (the repo's
    * LN/EXP parity contract — no POWER call, whose rounding differs),
    * per-domain scores ROUND(·, 6), the normalizer the EXACT
    * DECIMAL(38,6) sum of those 6-dp scores, one double division per
    * weight, targets `FLOOR(targetTotal·w)`. Scale shape: one
    * map-side-combined groupBy + a broadcast 1-row normalizer — never a
    * driver collect (domains can be URL hosts, not just languages). */
  def temperatureMix(
      df: DataFrame,
      domainCol: String,
      alpha: Double = 0.3,
      targetTotal: Long = 10000L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureMix: alpha=$alpha out of (0,1]")
    require(targetTotal >= 0, "need a non-negative target")
    val Dec6 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val scored = df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("domain"), col("n_docs"),
        round(exp(lit(alpha) * log(col("n_docs").cast("double"))), 6)
          .as("score"))
    val tot = scored.agg(
      sum(col("score").cast(Dec6)).as("z"),
      sum(col("n_docs")).as("nt"))
    scored.crossJoin(broadcast(tot))
      .select(col("domain"), col("n_docs"),
        round(col("score").cast("double") / col("z").cast("double"), 6)
          .as("weight"),
        round(col("n_docs").cast("double") / col("nt").cast("double"), 6)
          .as("prop_weight"))
      .select(col("domain"), col("n_docs"), col("weight"), col("prop_weight"),
        round(col("weight") / col("prop_weight"), 6).as("boost"),
        floor(lit(targetTotal.toDouble) * col("weight")).cast("long")
          .as("target_n"))
  }

  def unimaxAllocation(
      df: DataFrame, domainCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "need a non-negative budget")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.where(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (dom, c) => (c, dom) }
    var remaining = budget
    val rows = counts.zipWithIndex.map { case ((dom, c), i) =>
      val left = counts.length - i
      val share = remaining / left // floor
      val alloc = math.min(c, share)
      remaining -= alloc
      (dom, c, alloc, alloc == c)
    }
    rows.toSeq.toDF("domain", "n_docs", "allocated", "saturated")
  }
}
