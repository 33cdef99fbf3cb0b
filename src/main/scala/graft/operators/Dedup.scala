package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact (content
  * hash), n-gram Jaccard (exact pairwise over shared shingles), MinHash+LSH
  * (banded candidate generation + exact verification) and SimHash (64-bit,
  * block-banded Hamming candidates).
  *
  * Scale design: every operator shuffles on compact derived keys (32-byte
  * hashes, 64-bit minhash band signatures), never on document payloads; the
  * pairwise stages only materialize pairs that share at least one
  * shingle/band/block, so complexity follows actual overlap rather than
  * |docs|². All hashing is `xxhash64` with pinned seeds — deterministic
  * across runs and cluster layouts.
  */
object Dedup {

  /** Exact dedup via SHA-256 content hash: the shuffle key is 32 bytes
    * regardless of payload size, so at 100 TB the document text never
    * travels. Output: one row per distinct content with the smallest id as
    * representative and the group size.
    *
    * Key encoding: each key column is hashed separately and NULL is mapped
    * to a sentinel that cannot collide with a 64-char hex digest, so
    * `("a", null)` / `(null, "a")` stay distinct and a NULL key never
    * collides with the empty string (`concat_ws` alone silently drops
    * NULLs). The grouping partition therefore equals grouping by the raw
    * key tuple with NULL as its own group — exactly DuckDB's `GROUP BY`. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val enc = keyCols.map(c => coalesce(sha2(col(c).cast("string"), 256), lit("null")))
    df.groupBy(sha2(concat_ws("|", enc: _*), 256).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(idCol, "dup_count")
  }

  /** Cross-snapshot incremental dedup: split a new ingest batch into rows
    * whose content already exists in the reference corpus (`dup` = true)
    * and genuinely new rows — the daily-ingest mode of [[exact]], where
    * the existing corpus never rescans its payloads: both sides reduce to
    * 32-byte content hashes and meet in a semi-join (Spark plans the
    * `dup` flag as one hash join on the hash key; the hash relation of
    * the existing corpus would be a persisted artifact in production).
    * Returns the batch's `(idCol, dup)`. */
  def incrementalExact(
      batch: DataFrame,
      existing: DataFrame,
      idCol: String,
      keyCols: Seq[String]): DataFrame = {
    def hash(df: DataFrame): Column = {
      val enc = keyCols.map(c => coalesce(sha2(col(c).cast("string"), 256), lit("null")))
      sha2(concat_ws("|", enc: _*), 256)
    }
    val seen = existing.select(hash(existing).as("h")).distinct()
    batch.select(col(idCol), hash(batch).as("h"))
      .join(seen.withColumn("dup", lit(true)), Seq("h"), "left")
      .select(col(idCol), coalesce(col("dup"), lit(false)).as("dup"))
  }

  /** Distinct word n-gram shingles per document: `(id, shingle)`.
    * Tokens are lowercased whitespace tokens; documents shorter than `n`
    * tokens contribute no shingles. Distinctness is PER DOCUMENT, so it
    * runs as a map-side `array_distinct` before the explode
    * ([[shingleArrays]]) — no global distinct() shuffle; the relation is
    * identical.
    *
    * SINGLE-REFERENCE use only: a plan referencing this relation from
    * several branches (self-joins, size joins) re-runs the tokenize
    * pipeline per branch — there is no exchange for Spark to reuse.
    * Multi-branch operators materialize [[shingleArrays]] once
    * (`localCheckpoint`) and derive the exploded form from the blocks. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleArrays(df, idCol, textCol, n)
      .select(col("id"), explode(col("sh")).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs: join documents on shared shingles,
    * count the intersection, compute J exactly, keep pairs ≥ threshold.
    *
    * `maxDocFreq` (off when None — required for oracle parity) drops
    * shingles appearing in more than that many documents before pairing:
    * the standard guard against hot-shingle pair explosion at scale (a
    * boilerplate phrase shared by 10^5 docs would otherwise generate 10^10
    * candidate pairs on one key).
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    // materialize the arrays ONCE: this relation feeds both self-join
    // sides and the size lookup — without the checkpoint each branch
    // re-runs the tokenize pipeline (measured 4x at sf0.1, r6). On a
    // cluster a reliable checkpoint serves the same purpose; the footprint
    // equals the shuffle files the old distinct()-based form wrote anyway.
    val arrays = shingleArrays(df, idCol, textCol, n).localCheckpoint(true)
    val shAll = arrays.select(col("id"), explode(col("sh")).as("shingle"))
    // set sizes straight off the arrays — map-only, no groupBy exchange
    val sizes = arrays.select(col("id"), size(col("sh")).as("n_sh"))
    val sh = maxDocFreq match {
      case Some(cap) =>
        val rare = shAll.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select("shingle")
        shAll.join(rare, "shingle")
      case None => shAll
    }
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: training documents sharing at least
    * `minShared` word n-gram shingles with any benchmark/eval document —
    * the standard contamination check run before training on scraped
    * corpora (an eval question leaking into the training set inflates
    * scores). Returns `(train_id, bench_id, shared)`.
    *
    * Scale shape mirrors [[ngramJaccard]]: the join key is the shingle
    * (compact string), the benchmark side is tiny relative to the corpus
    * (Catalyst broadcasts it), and `maxDocFreq` drops ubiquitous shingles
    * ("the of the") from the train side before pairing — at 100 TB the
    * pair count follows genuine overlap, not corpus size. */
  def contamination(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minShared: Int = 2,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val trainSh = maxDocFreq match {
      case Some(cap) =>
        // materialized once: the doc-frequency filter and the bench join
        // both reference the relation (see ngramJaccard note)
        val all = shingleArrays(corpus, idCol, textCol, n)
          .localCheckpoint(true)
          .select(col("id"), explode(col("sh")).as("shingle"))
        val rare = all.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select("shingle")
        all.join(rare, "shingle")
      case None => shingles(corpus, idCol, textCol, n)
    }
    // the eval set is tiny by definition — broadcast EXPLICITLY: with the
    // map-only shingle pipeline there is no pre-join shuffle stage whose
    // runtime stats would let AQE discover that, and a static planner
    // estimate keeps the corpus side out of a sort-merge shuffle
    val benchSh = shingles(bench, idCol, textCol, n)
      .select(col("id").as("bench_id"), col("shingle"))
    trainSh.select(col("id").as("train_id"), col("shingle"))
      .join(broadcast(benchSh), "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Per-document DISTINCT shingle ARRAYS `(id, sh)` — the map-only twin
    * of [[shingles]]: no explode, no distinct shuffle; empty-shingle docs
    * dropped. The array stays co-located with its id, so signatures and
    * set sizes derive as pure per-row expressions. */
  private def shingleArrays(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = col("_toks")
    graft.profiler.ScanMetrics.spread(df)
      .select(
        col(idCol).as("id"),
        TextFunctions.wsTokens(lower(col(textCol))).as("_toks"))
      .select(
        col("id"),
        array_distinct(
          when(
            size(toks) >= n,
            transform(
              sequence(lit(0), size(toks) - n),
              i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("sh"))
      .where(size(col("sh")) > 0)
  }

  /** MinHash signatures: `numHashes` independent permutations simulated by
    * seeded xxhash64; one groupBy computes all minima — a single shuffle
    * keyed on document id (partial aggregation collapses each doc's
    * shingles map-side, so the exchange carries ~one row per doc). */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
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
        val ok = buckets.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("bf"))
          .where(col("bf") <= c)
          .select(keys.map(col): _*)
        buckets.join(ok, keys)
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
    * Scale shape (round 6 rewrite): everything up to the band-bucket join
    * is MAP-ONLY — per-doc distinct shingle arrays ([[shingleArrays]]),
    * signatures as `numHashes` per-row `array_min` transforms (a min over
    * a multiset equals the min over its set, so no distinct shuffle is
    * needed), band hashes from the signature columns. The only exchanges
    * carry the compact `(id, band, bh)` bucket relation and the candidate
    * pairs; exact verification joins the (few, capped) candidates back to
    * the persisted arrays and intersects per row — the previous
    * formulation paid a full corpus-wide distinct shuffle of every
    * `(id, shingle)` pair before anything else.
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
    // materialized once (NOT persist + finally-unpersist: the returned
    // DataFrame is lazy, so an unpersist on the way out would drop the
    // cache before the caller ever executes it and every branch — the
    // signature path and both verification sides — would re-run the
    // tokenize pipeline)
    val docs = shingleArrays(df, idCol, textCol, n).localCheckpoint(true)
    val sigCols = (0 until numHashes).map(i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s))).as(s"h$i"))
    val sig = docs.select(col("id") +: sigCols: _*)
    val bandStructs = (0 until bands).map { bi =>
      val cols = (bi * rows until (bi + 1) * rows).map(i => col(s"h$i"))
      struct(lit(bi).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val buckets = capHotBuckets(
      sig.select(col("id"), explode(array(bandStructs: _*)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh")),
      Seq("band", "bh"), maxBandFreq)
    val candidates = buckets.alias("x")
      .join(buckets.alias("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val sets = docs.select(col("id"), col("sh"), size(col("sh")).as("nsh"))
    candidates
      .join(
        sets.select(col("id").as("id_a"), col("sh").as("sha"), col("nsh").as("na")),
        "id_a")
      .join(
        sets.select(col("id").as("id_b"), col("sh").as("shb"), col("nsh").as("nb")),
        "id_b")
      .select(
        col("id_a"), col("id_b"),
        round(
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            (col("na") + col("nb") - size(array_intersect(col("sha"), col("shb")))),
          6).as("jaccard"))
      .where(col("jaccard") >= threshold)
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
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame = {
    val blocks = maxHamming + 1
    val width = 64 / blocks
    val sig = simhash(df, idCol, textCol).persist()
    try {
      val banded = capHotBuckets(
        sig.select(
          col("id"), col("simhash"),
          explode(array((0 until blocks).map { bi =>
            struct(
              lit(bi).as("block"),
              when(lit(bi) === blocks - 1, shiftright(col("simhash"), bi * width))
                .otherwise(shiftright(col("simhash"), bi * width)
                  .bitwiseAND((1L << width) - 1)).as("bv"))
          }: _*)).as("b"))
          .select(col("id"), col("simhash"), col("b.block").as("block"), col("b.bv").as("bv")),
        Seq("block", "bv"), maxBlockFreq)
      banded.alias("x").join(banded.alias("y"), Seq("block", "bv"))
        .where(col("x.id") < col("y.id"))
        .select(
          col("x.id").as("id_a"), col("y.id").as("id_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
        .distinct()
        .where(col("hamming") <= maxHamming)
    } finally { sig.unpersist(); () }
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD'03): hash every character `k`-gram, slide a window of `w`
    * consecutive hashes, select each window's minimum (rightmost position
    * on hash ties) — guaranteeing any shared substring of length ≥ k+w−1
    * between two documents shares a selected fingerprint, at ~2/(w+1)
    * storage density. The local-substring-matching complement of whole-doc
    * ([[graft.functions.RollingHash]]) and set-based (MinHash) signatures.
    *
    * (hash, position) pairs are packed into one BIGINT — `hash·2²⁰ +
    * (2²⁰−1−pos)` — so the select-min-with-rightmost-tie-break rule
    * becomes a plain `array_min`, identical in DuckDB (`list_min`), with
    * no struct-comparison semantics to align across engines. The packing
    * caps documents at 2²⁰−1 chars, and the cap is ENFORCED: an oversize
    * document raises an error naming the offending id instead of silently
    * corrupting the packed key (position bleeding into hash bits) — chunk
    * long documents first ([[graft.functions.TextFunctions.chunkDocuments]]).
    *
    * Scale shape: pure per-row expression work (the k-gram hashes and the
    * token array are staged columns — referencing an expression tree from
    * inside a lambda re-evaluates it per element) + one explode of the
    * DISTINCT selected fingerprints (≈ 2/(w+1) of positions); no shuffle,
    * no state. Returns `(id, pos, hash)` rows. */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "need positive k and w")
    graft.functions.RollingHash.register(df.sparkSession)
    val PosBase = 1L << 20
    val text = col("_t")
    val keys = col("_keys")
    graft.profiler.ScanMetrics.spread(df) // see shingles note
      .select(
        col(idCol).as("id"),
        // enforce the packing cap: beyond 2^20-1 chars the position term
        // would go negative and bleed into the hash bits — fail loudly.
        // coalesce: length(NULL) is NULL, which would otherwise make the
        // condition NULL and mis-route null text into raise_error — null
        // text must keep flowing to the empty-fingerprint branch below
        when(coalesce(length(col(textCol)), lit(0)) < lit(PosBase), col(textCol))
          .otherwise(raise_error(concat(
            lit("winnowFingerprints: document "), col(idCol).cast("string"),
            lit(" has length "), length(col(textCol)).cast("string"),
            lit(s" >= 2^20 (packing cap); chunk long documents first"))))
          .as("_t"))
      .select(
        col("id"),
        when(length(text) >= k,
          transform(
            sequence(lit(1), length(text) - k + 1),
            i => call_function("rolling_hash", substr(text, i, lit(k))) * lit(PosBase)
              + (lit(PosBase - 1) - i)))
          .otherwise(array().cast("array<bigint>")).as("_keys"))
      .select(
        col("id"),
        explode(
          when(size(keys) >= 1,
            array_distinct(transform(
              sequence(lit(1), greatest(size(keys) - w + 1, lit(1))),
              j => array_min(slice(keys, j, lit(w))))))
            .otherwise(array().cast("array<bigint>"))).as("enc"))
      .select(
        col("id"),
        (lit(PosBase - 1) - pmod(col("enc"), lit(PosBase))).as("pos"),
        expr(s"enc div $PosBase").as("hash"))
  }
}
