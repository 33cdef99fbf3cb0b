package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — MinHash signatures, banded LSH, calibration, incremental state + StateStore
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupMinhashOps { this: Dedup.type =>

  /** MinHash signatures: `numHashes` independent permutations simulated by
    * seeded xxhash64; one groupBy computes all minima — a single shuffle
    * keyed on document id. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash merge-associativity audit (E150) — the property that makes
    * MinHash the INCREMENTAL dedup sketch at 100 TB: a signature is an
    * elementwise minimum, so per-batch signatures merge by `least()`
    * without ever revisiting earlier batches' shingles (the E17/E19
    * mergeable-state story, for resemblance). Splits every document's
    * shingle set into two disjoint batches by shingle hash, computes
    * per-batch signatures, merges them (full outer join + null-skipping
    * `least` — a doc whose shingles all landed in one batch has no row
    * in the other), and pins:
    *
    *   - `merge_equals_whole` — merged signature equals the whole-set
    *     signature on every component of every document;
    *   - `docs_preserved` — the merged relation covers exactly the
    *     whole-set document set;
    *   - `partition_independent` — recomputing the whole-set signature
    *     from a differently-partitioned shingle relation changes
    *     nothing (min is commutative/associative). */
  def minhashMergeAudit(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = shingles(df, idCol, textCol, n).persist()
    try {
      val whole = minhashSignatures(sh, numHashes)
      val sigA = minhashSignatures(
        sh.where(pmod(xxhash64(col("shingle")), lit(2)) === 0), numHashes)
      val sigB = minhashSignatures(
        sh.where(pmod(xxhash64(col("shingle")), lit(2)) === 1), numHashes)
      val hs = (0 until numHashes).map(i => s"h$i")
      val merged = sigA.select(col("id") +: hs.map(h => col(h).as(s"a_$h")): _*)
        .join(sigB.select(col("id") +: hs.map(h => col(h).as(s"b_$h")): _*),
          Seq("id"), "full_outer")
        .select(col("id") +:
          hs.map(h => least(col(s"a_$h"), col(s"b_$h")).as(h)): _*)
      val eqAll = hs.map(h => col(s"m_$h") === col(s"w_$h")).reduce(_ && _)
      val cmp = merged.select(col("id") +: hs.map(h => col(h).as(s"m_$h")): _*)
        .join(whole.select(col("id") +: hs.map(h => col(h).as(s"w_$h")): _*),
          Seq("id"), "full_outer")
      val mismatches = cmp.where(!coalesce(eqAll, lit(false))).count()
      val docsWhole = whole.count()
      val docsMerged = merged.count()
      val reShuffled = minhashSignatures(sh.repartition(7), numHashes)
      val shuffleDiff = reShuffled.exceptAll(whole).count() +
        whole.exceptAll(reShuffled).count()
      Seq(
        ("docs_preserved", docsMerged == docsWhole),
        ("merge_equals_whole", mismatches == 0L),
        ("partition_independent", shuffleDiff == 0L))
        .toDF("property", "ok").orderBy("property")
    } finally { sh.unpersist(); () }
  }

  /** Drop bucket keys shared by more than `cap` rows before a bucket
    * self-join: the guard against quadratic blowup on one hot key (mirrors
    * `maxDocFreq` in [[ngramJaccard]]). A boilerplate-heavy corpus where
    * 10^5 near-identical docs share one band hash would otherwise generate
    * 10^10 candidate pairs on a single key; with the cap, per-key work is
    * bounded by cap² and the dropped pairs are exactly the ones exact
    * verification would have to score anyway. */
  private[operators] def capHotBuckets(
      buckets: DataFrame, keys: Seq[String], cap: Option[Int]): DataFrame =
    cap match {
      case Some(c) =>
        // localCheckpoint (r16): the bucket relation (band/block keys +
        // id — compact by construction) is consumed by the frequency
        // rollup here AND by both branches of every caller's candidate
        // self-join; uncheckpointed, each consumer re-ran the whole
        // signature pipeline above it (probed: three ~0.5-0.9 s 32-task
        // jobs per minhash key)
        val b = buckets.localCheckpoint(true)
        val ok = b.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("bf"))
          .where(col("bf") <= c)
          .select(keys.map(col): _*)
        b.join(ok, keys)
      case None => buckets
    }

  /** Observability companion to [[capHotBuckets]]: one row summarizing what
    * the cap WOULD drop — `(hot_buckets, hot_rows, max_bucket)`. Capping is
    * silent by design (the capped relation cannot carry a side channel), so
    * degenerate corpora (a mega-cluster swallowing whole buckets) are
    * detectable from this relation instead of only by reading scaladoc.
    * One aggregation over the bucket relation — same cost shape as the cap
    * itself. */
  private[graft] def hotBucketStats(
      buckets: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    buckets.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bf"))
      .agg(
        coalesce(sum(when(col("bf") > cap, 1L)), lit(0L)).as("hot_buckets"),
        coalesce(sum(when(col("bf") > cap, col("bf"))), lit(0L)).as("hot_rows"),
        coalesce(max(col("bf")), lit(0L)).as("max_bucket"))

  /** MinHash + LSH banding: signatures split into `bands` bands of
    * `rowsPerBand` rows; docs colliding on any band's hash become candidate
    * pairs; candidates are verified with EXACT Jaccard so the threshold
    * filter has no false positives (false negatives follow the standard
    * LSH S-curve). Returns `(id_a, id_b, jaccard)`.
    *
    * `maxBandFreq` caps the number of docs per (band, hash) bucket — see
    * [[capHotBuckets]]; the default bounds any key's join fan-out at 10^8
    * pairs while being a no-op on non-degenerate corpora. */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBandFreq: Option[Int] = Some(10000)): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // r8: verification moved to per-doc ARRAY intersection; signatures
    // KEEP the [[shingles]]-fed groupBy. Both alternatives were built
    // and measured at sf0.1 before settling here (2-iteration min):
    //   - map-side signatures (32 × array_min(transform)): 3.25 s vs
    //     0.63 s — higher-order lambdas evaluate interpreted;
    //   - signatures from explode(arrays) without the global distinct:
    //     6.0 s vs 0.63 s — the 32-min aggregation lands in the same
    //     stage as the interpreted shingle-transform instead of after
    //     the distinct Exchange's clean codegen'd rows.
    // The arrays relation feeds ONLY the verify stage (one extra
    // map-only tokenize pass, ~0.3 s), where it replaces three
    // shingle-level pair joins + a size groupBy with two
    // candidate-sized joins (2.99 s → 0.99 s measured).
    val sh = shingles(df, idCol, textCol, n)
    val sig = minhashSignatures(sh, numHashes)
    val buckets = capHotBuckets(
      bandBuckets(sig, numHashes, bands), Seq("band", "bh"), maxBandFreq)
    val candidates = buckets.alias("x")
      .join(buckets.alias("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    verifiedJaccard(shingleArrays(df, idCol, textCol, n), candidates)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash estimate calibration (E215) — the trust readout behind
    * every signature-estimated verdict ([[incrementalLsh]],
    * [[graft.streaming.StreamingProfile.streamingStateDedup]]): over
    * the banded candidate pairs, compare the signature-estimated
    * Jaccard (matching components / k) against the EXACT Jaccard
    * (shingle-array intersection — candidate-sized work, not a corpus
    * pass), rolled up per estimate decile: pair count, mean estimate,
    * mean exact, mean and max absolute error. A decile whose mean
    * error approaches the binomial σ = √(J(1−J)/k) says "raise k or
    * verify exactly above this band"; the readout that prices the
    * store-only dedup mode. Estimate band 10 = the est-1.0 pairs. */
  def minhashCalibration(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBandFreq: Option[Int] = Some(10000)): DataFrame = {
    val Dec = org.apache.spark.sql.types.DecimalType(38, 12)
    calibrationPairs(df, idCol, textCol, n, numHashes, bands, maxBandFreq)
      .select(col("est"), col("exact"),
        floor(col("est") * 10).cast("long").as("est_band"),
        abs(col("est") - col("exact")).as("err"))
      .groupBy("est_band")
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum(round(col("est"), 12).cast(Dec)).cast("double") /
          count(lit(1)), 6).as("mean_est"),
        round(sum(round(col("exact"), 12).cast(Dec)).cast("double") /
          count(lit(1)), 6).as("mean_exact"),
        round(sum(round(col("err"), 12).cast(Dec)).cast("double") /
          count(lit(1)), 6).as("mean_abs_err"),
        round(max(col("err")), 6).as("max_abs_err"))
  }

  /** Pair half of [[minhashCalibration]] — `(id_a, id_b, est, exact)`
    * per banded candidate; exposed so the audit can pin pair-level
    * properties (exact ≡ the [[ngramJaccard]] value, rollup mass). */
  private[graft] def calibrationPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int,
      maxBandFreq: Option[Int]): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val hs = (0 until numHashes).map(i => s"h$i")
    // localCheckpoint (r16): the signature relation (one row of k longs
    // per doc — compact by construction) has THREE independent consumers
    // (band buckets, the id_a estimate join, the id_b estimate join);
    // uncheckpointed, each re-ran the shingle+groupBy signature pipeline
    // (probed as 3 sequential full passes, the key's dominant cost)
    val sig = minhashSignatures(shingles(df, idCol, textCol, n), numHashes)
      .localCheckpoint(true)
    val buckets = capHotBuckets(
      bandBuckets(sig, numHashes, bands), Seq("band", "bh"), maxBandFreq)
    val cands = buckets.alias("x").join(buckets.alias("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val estExpr = round(
      hs.map(h => when(col(s"a_$h") === col(s"b_$h"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / lit(numHashes.toDouble), 6)
    // est feeds both the exact-verify candidate list and the final join —
    // candidate-pair-sized, checkpoint instead of recompute
    val est = cands
      .join(sig.select((col("id").as("id_a") +:
        hs.map(h => col(h).as(s"a_$h"))): _*), Seq("id_a"))
      .join(sig.select((col("id").as("id_b") +:
        hs.map(h => col(h).as(s"b_$h"))): _*), Seq("id_b"))
      .select(col("id_a"), col("id_b"), estExpr.as("est"))
      .localCheckpoint(true)
    val exact = verifiedJaccard(
      shingleArrays(df, idCol, textCol, n),
      est.select("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("exact"))
    est.join(exact, Seq("id_a", "id_b"))
  }

  /** Near-dup pair EXPLAIN artifact (E217) — what a human reviewer (or
    * an incident write-up) needs next to a drop verdict: for the
    * `topPairs` highest-Jaccard pairs, the shared-shingle count and the
    * `sampleShingles` lexicographically-smallest shared shingles as a
    * '|'-joined evidence string. The pair list is a TakeOrdered over
    * the duplicate-mass relation (never a corpus sort); the evidence is
    * one `array_intersect` per selected pair. */
  def dupPairExplain(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      topPairs: Int = 20, sampleShingles: Int = 5): DataFrame = {
    require(topPairs >= 1 && topPairs <= 1000,
      s"dupPairExplain: topPairs=$topPairs out of [1,1000]")
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold)
      .orderBy(col("jaccard").desc, col("id_a").asc, col("id_b").asc)
      .limit(topPairs)
    val arrs = shingleArrays(df, idCol, textCol, n)
    pairs
      .join(arrs.select(col("id").as("id_a"), col("sh_arr").as("sa")),
        Seq("id_a"))
      .join(arrs.select(col("id").as("id_b"), col("sh_arr").as("sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"),
        array_sort(array_intersect(col("sa"), col("sb"))).as("shared"))
      .select(
        col("id_a"), col("id_b"), col("jaccard"),
        size(col("shared")).cast("long").as("n_shared"),
        concat_ws("|", slice(col("shared"), 1, sampleShingles))
          .as("shared_sample"))
  }

  /** Duplicate-arrival rate by ingest batch (E218) — the drift line a
    * production dedup pipeline alarms on: per batch, how many documents'
    * CONTENT was already seen in an earlier batch (or earlier in the
    * same batch — first occurrence wins by (batch, id)), and the dup
    * rate. A rate that climbs across batches means the crawl is
    * re-visiting; a step change means a source started mirroring.
    * Content identity is the 32-byte SHA-256; the first occurrence per
    * content is one min(struct(batch, id)) hash agg, re-joined on the
    * hash — payloads never shuffle, exactly the [[exact]] cost shape
    * plus one metadata-sized batch rollup. */
  def dedupRateByBatch(
      df: DataFrame, idCol: String, textCol: String,
      batchCol: String): DataFrame = {
    val keyed = df.select(
      col(idCol).as("id"), col(batchCol).cast("long").as("batch"),
      sha2(coalesce(col(textCol).cast("string"), lit("null")), 256).as("h"))
    val first = keyed.groupBy("h")
      .agg(min(struct(col("batch"), col("id"))).as("f"))
      .select(col("h"), col("f.batch").as("fb"), col("f.id").as("fi"))
    keyed.join(first, Seq("h"))
      .select(col("batch"),
        (col("batch") > col("fb") ||
          (col("batch") === col("fb") && col("id") > col("fi")))
          .cast("long").as("is_dup"))
      .groupBy("batch")
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"))
      .select(col("batch"), col("n_docs"), col("n_dups"),
        round(col("n_dups").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"))
  }

  /** Cross-source duplication matrix (E214) — the curation readout that
    * decides which source to dedup FIRST: for every pair of sources,
    * how many distinct document CONTENTS they share, each side's
    * distinct-content count, and the Jaccard overlap of the two content
    * sets. A crawl slice that is 40% contained in an existing source is
    * a dedup target, not new data. Payloads reduce to 32-byte SHA-256
    * hashes immediately; the matrix is a self-equi-join on the hash of
    * the DISTINCT (hash, source) relation — per-content fan-out is
    * bounded by C(|sources|, 2), never by duplicate mass.
    *
    * Cites reference scope: cross-table overlap is absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles one table at a
    * time) — extension per SURVEY §2.E. */
  def crossDedupMatrix(
      df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val hg = df
      .where(col(groupCol).isNotNull)
      .select(
        sha2(coalesce(col(textCol).cast("string"), lit("null")), 256).as("h"),
        col(groupCol).cast("string").as("g"))
      .distinct()
      .localCheckpoint(true) // self-join + per-source totals read it
    val totals = hg.groupBy(col("g")).agg(count(lit(1)).as("n"))
    hg.alias("a").join(hg.alias("b"), Seq("h"))
      .where(col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("g").as("source_a"), col("n").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(totals.select(col("g").as("source_b"), col("n").as("n_b"))),
        Seq("source_b"))
      .select(
        col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"), 6)
          .as("content_jaccard"))
  }

  /** LSH band-bucket relation `(id, band, bh)` over a minhash signature
    * relation — the banding step shared by [[minhashLsh]] (fresh
    * whole-corpus candidates) and [[incrementalLsh]] (batch vs PERSISTED
    * state): one struct-array explode, band hash = xxhash64 of the
    * band's signature components. Rows whose signature is null (a doc
    * too short to shingle) emit no buckets. */
  private[graft] def bandBuckets(
      sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { bi =>
      val cols = (bi * rows until (bi + 1) * rows).map(i => col(s"h$i"))
      struct(lit(bi).as("band"), xxhash64(cols: _*).as("bh"))
    }
    sig.where(col("h0").isNotNull)
      .select(col("id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  /** Persisted dedup state for one ingest batch (E205): one row per
    * document — its 32-byte SHA-256 content hash (the [[exact]] key)
    * plus its `numHashes`-component MinHash signature (null components
    * for docs too short to shingle). This is the ONLY artifact later
    * batches need: [[minhashMergeAudit]] pins that signatures are pure
    * per-document functions (merge = row union, no cross-batch state),
    * so a production ingest appends this relation to the signature
    * store and never revisits the batch's payloads again. ~(32 + 8·k)
    * bytes per document — at 100 TB the whole store is a few hundred GB
    * of compact fixed-width rows, joinable without touching a payload. */
  def dedupState(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 32): DataFrame = {
    val ch = df.select(
      col(idCol).as("id"),
      sha2(coalesce(col(textCol).cast("string"), lit("null")), 256)
        .as("content_hash"))
    val sig = minhashSignatures(shingles(df, idCol, textCol, n), numHashes)
    ch.join(sig, Seq("id"), "left")
  }

  /** Cross-batch incremental near-dup dedup EXECUTOR (E205) — the
    * operator a production ingest actually runs: dedup batch N+1
    * against the PERSISTED signature store ([[dedupState]] rows of
    * batches 1..N) without rescanning any earlier batch. Two stages,
    * both payload-free on the known side:
    *
    *   - **exact**: batch content hashes probe an in-plan Bloom filter
    *     built from the store's hashes ([[graft.profiler.Integrity
    *     .bloomFilter]], no false negatives) — only bloom-positive rows
    *     (true dups + fpp·|batch| false positives) reach the hash
    *     semi-join, so the overwhelmingly-new common case never
    *     shuffles against the store;
    *   - **near**: batch signatures are LSH-banded ([[bandBuckets]],
    *     the [[minhashLsh]] geometry) and equi-joined against the
    *     store's banded signatures; the hot-bucket cap applies to the
    *     UNION bucket relation (state ∪ batch — exactly the buckets a
    *     fresh whole-corpus run would see, which is what makes the
    *     incremental result provably equal to the from-scratch one, see
    *     the audit); candidates are scored by SIGNATURE-ESTIMATED
    *     Jaccard (matching components / numHashes — the store holds no
    *     payloads, so exact re-verification is impossible BY DESIGN;
    *     the estimate is unbiased with σ = √(J(1−J)/k)).
    *
    * Returns one verdict row per batch document: `(id, dup_exact,
    * near_dup, match_id, est_jaccard)` — `match_id` the best-estimate
    * (ties → smallest id) known neighbor at est ≥ `threshold`, null if
    * none. Batch-internal duplicates are out of scope (run [[exact]] /
    * [[minhashLsh]] within the batch first); this operator answers
    * "which of these new documents does the CORPUS already have".
    *
    * Scale shape: the store never rescans payloads (it has none); the
    * only payload pass is the batch's own shingle/tokenize stage; all
    * joins are equi-joins on compact keys (32-byte hash, 16-byte band
    * key, 8-byte ids); the bloom bitset broadcasts as one row. At 10×
    * corpus the state side grows linearly but the candidate volume is
    * band-bucket-occupancy-bounded like every LSH lane in the repo.
    *
    * Cites reference scope: curation actions are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def incrementalLsh(
      batch: DataFrame,
      state: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBandFreq: Option[Int] = Some(10000),
      bloomFpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val hs = (0 until numHashes).map(i => s"h$i")
    require(state.columns.contains("content_hash") &&
      hs.forall(state.columns.contains),
      "incrementalLsh: state must be a dedupState relation " +
        s"(content_hash + ${numHashes} signature components)")
    val bstate = dedupState(batch, idCol, textCol, n, numHashes)
      .localCheckpoint(true) // read by the exact stage, banding and scoring
    // ---- exact stage: bloom pre-filter, then hash semi-join on survivors
    // Bloom sizing wants only an UPPER bound on store cardinality; a
    // caller holding a StateStore artifact passes its maintained row
    // count (`expectedItems`) and this stays a lazy plan-construction —
    // the counted fallback is an extra O(|store|) job a production
    // store should answer from metadata (ADVICE r12 / VERDICT r12 #2).
    val nState = math.max(1L, expectedItems.getOrElse(
      state.select("content_hash").distinct().count()))
    val (bf, bloomHit) = graft.profiler.Integrity.bloomFilter(
      state, "content_hash", nState, bloomFpp)
    val probed = bstate.select(col("id"), col("content_hash"))
      .crossJoin(broadcast(bf))
      .withColumn("maybe", bloomHit(col("content_hash")))
    val seen = state.select(col("content_hash")).distinct()
      .withColumn("_dup", lit(true))
    val exactFlag = probed.where(col("maybe"))
      .join(seen, Seq("content_hash"), "left")
      .select(col("id"), coalesce(col("_dup"), lit(false)).as("dup_exact"))
      .unionByName(probed.where(!col("maybe"))
        .select(col("id"), lit(false).as("dup_exact")))
    // ---- near stage: band both sides, cap on the UNION bucket relation
    val scored = incrementalEstPairs(
      bstate, state, threshold, numHashes, bands, maxBandFreq)
    val best = scored.groupBy("id")
      .agg(min(struct(
        (-col("est_jaccard")).as("neg"), col("match_id"),
        col("est_jaccard"))).as("b"))
      .select(col("id"), col("b.match_id").as("match_id"),
        col("b.est_jaccard").as("est_jaccard"))
    exactFlag
      .join(best, Seq("id"), "left")
      .select(
        col("id"), col("dup_exact"),
        col("match_id").isNotNull.as("near_dup"),
        col("match_id"), col("est_jaccard"))
  }

  /** Signature-store compaction (E220) — the maintenance pass a
    * [[dedupState]] store needs after many appended batches: re-ingested
    * identical content accumulates one store row per occurrence, growing
    * the store and the banded join fan-out with ZERO added information
    * (identical bytes ⇒ identical signature). Keep the MINIMUM-id row
    * per content hash (the representative every executor's larger-id
    * rule would keep anyway) and report how many rows it absorbed.
    * Detection against the compacted store returns the SAME dup_exact /
    * near_dup verdicts (the audit pins it): the exact stage joins on
    * the surviving hash, and every dropped row's band buckets and
    * signature were byte-identical to the survivor's. One
    * min(struct)-agg over the store — map-side combined, hash keys
    * only. */
  def compactState(state: DataFrame, numHashes: Int = 32): DataFrame = {
    val hs = (0 until numHashes).map(i => s"h$i")
    require(state.columns.contains("content_hash") &&
      hs.forall(state.columns.contains),
      "compactState: input must be a dedupState relation")
    state.groupBy("content_hash")
      .agg(
        min(struct((col("id") +: hs.map(col)): _*)).as("r"),
        count(lit(1)).as("n_copies"))
      .select((col("r.id").as("id") +: col("content_hash") +:
        col("n_copies") +: hs.map(h => col(s"r.$h").as(h))): _*)
  }

  /** Persisted signature-store I/O (VERDICT r12 tasks 3+6) — the
    * artifact face of [[dedupState]] (and of the media signature
    * relations: the store is SCHEMA-AGNOSTIC, any payload-free
    * `(id, content_hash, …signature)` relation rides it). Parquet rows
    * plus ONE metadata file `_graft_state_meta` carrying the maintained
    * row count: bloom sizing at detection time needs only an upper
    * bound on store cardinality, and re-deriving it costs an
    * O(|store|) job per query — the count belongs to MAINTENANCE time
    * (write/append/compact, each already a store pass), after which
    * every [[incrementalLsh]]/[[incrementalSimhash]] call passes
    * `expectedItems = rows(…)` and stays a lazy plan construction.
    * The underscore filename keeps the parquet reader blind to the
    * sidecar (the `_SUCCESS` convention). Hadoop FS API throughout, so
    * the same code addresses local disk, HDFS or an object store. */
  object StateStore {
    import org.apache.hadoop.fs.Path
    private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    private def metaPath(path: String) = new Path(path, "_graft_state_meta")

    /** Re-derive and persist the row count — called by every mutation;
      * an empty-projection parquet count, i.e. footer-priced. */
    private def refreshMeta(
        spark: org.apache.spark.sql.SparkSession, path: String): Long = {
      val n = spark.read.parquet(path).count()
      val out = fs(spark, path).create(metaPath(path), true)
      try out.write(s"n_rows=$n\n".getBytes("UTF-8")) finally out.close()
      n
    }

    /** Create/replace the store with `state`; returns the row count now
      * recorded in the artifact. */
    def write(state: DataFrame, path: String): Long = {
      state.write.mode("overwrite").parquet(path)
      refreshMeta(state.sparkSession, path)
    }

    /** Append one batch's state rows (the ingest path: batches 1..N are
      * never rescanned — only the footer count runs over the store). */
    def append(state: DataFrame, path: String): Long = {
      state.write.mode("append").parquet(path)
      refreshMeta(state.sparkSession, path)
    }

    def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
      spark.read.parquet(path)

    /** The maintained row count — None when the artifact predates the
      * meta file (fall back to a counted probe, or re-[[write]]). */
    def rows(spark: org.apache.spark.sql.SparkSession, path: String): Option[Long] = {
      val p = metaPath(path)
      val f = fs(spark, path)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        s.linesIterator.collectFirst {
          case l if l.startsWith("n_rows=") => l.stripPrefix("n_rows=").trim.toLong
        }
      }
    }

    /** In-place [[compactState]] of a TEXT-signature store artifact:
      * read → min-id-per-hash compact → write beside → recoverable swap
      * (never overwrite a parquet dir while a plan still reads it) →
      * refresh the count. Returns the compacted row count.
      *
      * Swap order (ADVICE r13): rename the LIVE dir aside first, rename
      * the compacted dir into place, only then delete the old copy — a
      * crash between any two steps leaves a complete store at `path` or
      * at `path__old`, never "data only in a `__compacting` temp with
      * the meta sidecar already gone". A leftover `__old` from a prior
      * crash is cleared up front (it is by construction a superset of
      * the live compacted store). */
    def compact(spark: org.apache.spark.sql.SparkSession, path: String,
        numHashes: Int = 32): Long = {
      val hs = (0 until numHashes).map(i => s"h$i")
      val keep = "id" +: "content_hash" +: hs
      val tmp = path.stripSuffix("/") + "__compacting"
      val old = path.stripSuffix("/") + "__old"
      compactState(read(spark, path), numHashes)
        .select(keep.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      val f = fs(spark, path)
      f.delete(new Path(old), true) // stale crash leftover, if any
      if (!f.rename(new Path(path), new Path(old)))
        throw new java.io.IOException(
          s"StateStore.compact: rename $path -> $old failed")
      if (!f.rename(new Path(tmp), new Path(path))) {
        // roll the live store back before failing — the caller keeps a
        // readable (uncompacted) store either way
        f.rename(new Path(old), new Path(path))
        throw new java.io.IOException(
          s"StateStore.compact: rename $tmp -> $path failed")
      }
      val n = refreshMeta(spark, path)
      f.delete(new Path(old), true)
      n
    }
  }
}
