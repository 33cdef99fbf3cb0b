package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — 64-bit SimHash: pigeonhole blocks, exact Hamming verify, incremental media lane
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupSimhashOps { this: Dedup.type =>

  /** Cross-batch incremental near-dup dedup for a SINGLE-WORD perceptual
    * signature store (VERDICT r12 task 6) — [[incrementalLsh]]'s shape
    * for the media lanes: the persisted state is `(id, content_hash,
    * simhash)` rows (dHash / energy-envelope hash, null for payloads the
    * decoder rejected), batch N+1 of images or audio dedups against
    * persisted 8-byte signatures without any earlier payload being
    * rescanned. Exact stage identical to the text lane (bloom
    * pre-filter on the store's content hashes, then the verifying hash
    * semi-join); near stage bands both sides with the SimHash pigeonhole
    * blocks ([[simhashBlocks]] — any pair within `maxHamming` must
    * collide on one of `maxHamming+1` blocks), caps the UNION bucket
    * relation (the incremental ≡ from-scratch property, as E205), and —
    * unlike the MinHash estimate — verifies candidates EXACTLY:
    * `bit_count(a XOR b) <= maxHamming` is the definition, not an
    * estimator, because the signature IS the store's whole knowledge of
    * the payload. Returns one verdict row per batch document:
    * `(id, dup_exact, near_dup, match_id, hamming)` — `match_id` the
    * closest known neighbor (ties → smallest id), null if none. */
  def incrementalSimhash(
      batchState: DataFrame,
      state: DataFrame,
      maxHamming: Int = 5,
      maxBlockFreq: Option[Int] = Some(10000),
      bloomFpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    Seq("id", "content_hash", "simhash").foreach { c =>
      require(batchState.columns.contains(c) && state.columns.contains(c),
        s"incrementalSimhash: both sides need ($c) — signature-state relations")
    }
    val bstate = batchState.localCheckpoint(true)
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
    val scored = incrementalSimhashPairs(
      bstate.where(col("simhash").isNotNull).select("id", "simhash"),
      state.where(col("simhash").isNotNull).select("id", "simhash"),
      maxHamming, maxBlockFreq)
    val best = scored.groupBy("id")
      .agg(min(struct(col("hamming"), col("match_id"))).as("b"))
      .select(col("id"), col("b.match_id").as("match_id"),
        col("b.hamming").as("hamming"))
    exactFlag
      .join(best, Seq("id"), "left")
      .select(
        col("id"), col("dup_exact"),
        col("match_id").isNotNull.as("near_dup"),
        col("match_id"), col("hamming"))
  }

  /** Batch-vs-store half of [[incrementalSimhash]]'s near stage — the
    * [[incrementalEstPairs]] shape over single-word signatures: block
    * both sides, cap the UNION bucket relation, equi-join new × known,
    * verify exactly. Returns `(id, match_id, hamming)` within
    * `maxHamming`. */
  private[graft] def incrementalSimhashPairs(
      batchSig: DataFrame,
      stateSig: DataFrame,
      maxHamming: Int,
      maxBlockFreq: Option[Int]): DataFrame = {
    val allBuckets = capHotBuckets(
      simhashBlocks(stateSig, maxHamming).withColumn("known", lit(true))
        .unionByName(
          simhashBlocks(batchSig, maxHamming).withColumn("known", lit(false))),
      Seq("block", "bv"), maxBlockFreq)
    allBuckets.where(!col("known")).alias("x")
      .join(allBuckets.where(col("known")).alias("y"), Seq("block", "bv"))
      .select(
        col("x.id").as("id"), col("y.id").as("match_id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Pair half of [[incrementalLsh]]'s near stage, shared with the
    * streaming counterpart ([[graft.streaming.StreamingProfile
    * .streamingStateDedup]]'s parity audit): batch-vs-store banded
    * candidates with the hot-bucket cap applied to the UNION bucket
    * relation, scored by signature-estimated Jaccard. Returns
    * `(id, match_id, est_jaccard)` at est ≥ `threshold`. */
  private[graft] def incrementalEstPairs(
      bstate: DataFrame,
      state: DataFrame,
      threshold: Double,
      numHashes: Int,
      bands: Int,
      maxBandFreq: Option[Int]): DataFrame = {
    val hs = (0 until numHashes).map(i => s"h$i")
    val stateSig = state.select((col("id") +: hs.map(col)): _*)
    val allBuckets = capHotBuckets(
      bandBuckets(stateSig, numHashes, bands)
        .withColumn("known", lit(true))
        .unionByName(bandBuckets(bstate, numHashes, bands)
          .withColumn("known", lit(false))),
      Seq("band", "bh"), maxBandFreq)
    val cands = allBuckets.where(!col("known")).alias("x")
      .join(allBuckets.where(col("known")).alias("y"), Seq("band", "bh"))
      .select(col("x.id").as("id"), col("y.id").as("match_id"))
      .distinct()
    val estExpr = round(
      hs.map(h => when(col(s"a_$h") === col(s"b_$h"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / lit(numHashes.toDouble), 6)
    cands
      .join(bstate.select((col("id") +: hs.map(h => col(h).as(s"a_$h"))): _*),
        Seq("id"))
      .join(stateSig.select(
        (col("id").as("match_id") +: hs.map(h => col(h).as(s"b_$h"))): _*),
        Seq("match_id"))
      .select(col("id"), col("match_id"), estExpr.as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash per document over lowercased whitespace tokens: each
    * token votes ±1 on every bit of its xxhash64; the signature's bit i is
    * 1 iff the vote sum is positive. One explode + one groupBy = one
    * shuffle on the id. */
  def simhash(dfIn: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = graft.profiler.ScanMetrics.spread(dfIn) // see shingles note
    val tok = df.select(
      col(idCol).as("id"),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val bits = (0 until 64).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance `maxHamming`: the
    * 64-bit signature is cut into `maxHamming + 1` blocks (pigeonhole: any
    * pair within the distance agrees on at least one block), pairs are
    * generated per colliding block, then filtered by exact
    * `bit_count(a XOR b)`. Returns `(id_a, id_b, hamming)`. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame =
    simhashPairsFromSignatures(simhash(df, idCol, textCol), maxHamming, maxBlockFreq)

  /** Pigeonhole block explode of a 64-bit `(id, simhash)` relation:
    * `maxHamming+1` equal-width bit blocks per signature (any pair
    * within `maxHamming` bits must agree on at least one block).
    * Shared by the one-shot pair scan ([[simhashPairsFromSignatures]])
    * and the store-backed incremental stage
    * ([[incrementalSimhashPairs]]). */
  private[graft] def simhashBlocks(sig: DataFrame, maxHamming: Int): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    sig.select(
      col("id"), col("simhash"),
      explode(array((0 until blocks).map { bi =>
        struct(
          lit(bi).as("block"),
          when(lit(bi) === blocks - 1, shiftright(col("simhash"), bi * width))
            .otherwise(shiftright(col("simhash"), bi * width)
              .bitwiseAND((1L << width) - 1)).as("bv"))
      }: _*)).as("b"))
      .select(col("id"), col("simhash"),
        col("b.block").as("block"), col("b.bv").as("bv"))
  }

  /** Pair generation half of [[simhashPairs]] over a precomputed
    * `(id, simhash)` relation — lets a caller that already holds the
    * signatures (or needs them for something else, e.g. the
    * `simhash_audit` brute-force twin) skip the token shuffle. The
    * signature relation is referenced twice (the band self-join), so a
    * caller reusing `sigIn` should persist + materialize it FIRST — a
    * persist here could not protect the lazy result and would evict the
    * caller's warmed cache at plan-construction time. */
  def simhashPairsFromSignatures(
      sig: DataFrame,
      maxHamming: Int = 3,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame = {
    val banded = capHotBuckets(
      simhashBlocks(sig, maxHamming), Seq("block", "bv"), maxBlockFreq)
    banded.alias("x").join(banded.alias("y"), Seq("block", "bv"))
      .where(col("x.id") < col("y.id"))
      .select(
        col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
