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

  /** Normalized near-exact dedup (E138) — [[exact]] after text
    * canonicalization (lowercase, whitespace runs → one space, edge
    * trim): the C4-style "same document modulo formatting" pass that
    * catches re-encoded mirrors, reflowed HTML extractions and
    * case-variant copies byte-exact dedup misses, at byte-exact cost
    * (still one 32-byte hash shuffle — no pair join, no shingles).
    * Returns one row per normalized-content group: representative id,
    * group size, and how many RAW variants the group collapsed
    * (`n_raw_variants` > 1 = normalization caught what [[exact]]
    * could not — the operator's yield metric). */
  def normalizedExact(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df
      .select(col(idCol).as("_id"), col(textCol).as("_t"),
        coalesce(norm, lit("null")).as("_n"))
      .groupBy(sha2(col("_n"), 256).as("h"))
      .agg(
        min(col("_id")).as(idCol),
        count(lit(1)).as("dup_count"),
        countDistinct(col("_t")).as("n_raw_variants"))
      .select(col(idCol), col("dup_count"), col("n_raw_variants"))
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
    * tokens contribute no shingles.
    *
    * DESIGN NOTE (measured, r6): the global `distinct()` looks wasteful
    * (distinctness is per-document, expressible as a map-side
    * `array_distinct`), but it is load-bearing: its Exchange is what
    * ReuseExchange computes ONCE and shares across every downstream plan
    * branch (self-join sides, size lookups), and its finished query stage
    * gives AQE the runtime stats to broadcast small sides. A map-only
    * rewrite (per-doc arrays + eager localCheckpoint + explicit
    * broadcasts) was built and A/B-measured ~2x SLOWER across the whole
    * dedup family at sf0.1 (15.2 s -> 27.4 s over 6 queries, 3-iteration
    * min) — re-tokenization per branch and checkpoint I/O cost more than
    * the shuffle they replaced. Keep the shuffle. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // tokenize into a materialized column FIRST: slicing the tokenizer
    // EXPRESSION from inside the transform lambda would re-split the text
    // once per shingle (lambda bodies sit outside common-subexpression
    // elimination), turning the linear pass quadratic in document length
    val toks = col("_toks")
    val grams = when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))
    ).otherwise(array())
    // spread: a single-row-group source would run the tokenize+explode
    // phase (the expensive part) on one core — see ScanMetrics.spread
    graft.profiler.ScanMetrics.spread(df)
      .select(
        col(idCol).as("id"),
        TextFunctions.wsTokens(lower(col(textCol))).as("_toks"))
      .select(col("id"), explode(grams).as("shingle")).distinct()
  }

  /** Per-document DISTINCT shingle ARRAYS `(id, sh_arr)` — the map-only
    * sibling of [[shingles]]: same tokenize + n-gram slice, but the
    * distinctness that matters (per document) is an `array_distinct`
    * inside the row, so the relation never shuffles at all. This is the
    * spine of [[minhashLsh]] (r8): candidate verification intersects
    * candidate docs' arrays directly ([[verifiedJaccard]]), replacing
    * three shingle-level pair joins + a size groupBy with two
    * candidate-sized joins — at tiny sf that removed ~6 sequential
    * AQE stage materializations (the actual bottleneck: per-stage
    * scheduling overhead, not data volume), and at scale nothing but
    * candidate docs' arrays ever shuffles.
    *
    * A map-side signature path over these arrays (32 ×
    * `array_min(transform(...))`) was built and measured 5× SLOWER than
    * the explode+groupBy aggregation (3.25 s vs 0.63 s at sf0.1):
    * higher-order lambda expressions are CodegenFallback — evaluated
    * interpreted per element — so [[minhashSignatures]] keeps the
    * codegen'd explode+groupBy form. */
  def shingleArrays(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = col("_toks")
    val grams = when(
      size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " "))
    ).otherwise(array())
    graft.profiler.ScanMetrics.spread(df)
      .select(
        col(idCol).as("id"),
        TextFunctions.wsTokens(lower(col(textCol))).as("_toks"))
      .select(col("id"), array_distinct(grams).as("sh_arr"))
  }

  /** Shingle-set sizes `(id, n_sh)`. */
  private def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy("id").agg(count(lit(1)).as("n_sh"))

  /** Exact Jaccard from a pair-candidate relation `(id_a, id_b)` and the
    * per-doc shingle ARRAY relation ([[shingleArrays]]): each side's
    * array is joined onto the pair and J = |A∩B| / (|A|+|B|−|A∩B|)
    * falls out of one `array_intersect` per pair — a plain (non-lambda)
    * collection expression, evaluated where the pair sits.
    *
    * The LSH candidate set is tiny relative to the corpus (pairs that
    * collided on a band hash), so the array relation is
    * semi-join-filtered down to candidate docs BEFORE the two pair
    * joins: nothing but candidate docs' arrays ever moves, and AQE
    * broadcasts the pair side while it is small. This replaced the r7
    * shingle-level form (two exploded pair joins + intersection groupBy
    * + two size joins): same exact answer, but six fewer sequential
    * stage materializations — which, measured, were the query's actual
    * cost at benchmark sf (stage scheduling, not data). */
  private def verifiedJaccard(
      arrays: DataFrame, pairs: DataFrame): DataFrame = {
    val candIds = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    val ca = arrays.join(candIds, Seq("id"), "leftsemi")
    pairs
      .join(ca.select(col("id").as("id_a"), col("sh_arr").as("arr_a")), "id_a")
      .join(ca.select(col("id").as("id_b"), col("sh_arr").as("arr_b")), "id_b")
      .withColumn("c", size(array_intersect(col("arr_a"), col("arr_b"))))
      .select(
        col("id_a"), col("id_b"),
        (col("c").cast("double") /
          (size(col("arr_a")) + size(col("arr_b")) - col("c")))
          .as("jaccard"))
  }

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
      maxDocFreq: Option[Int] = None): DataFrame =
    ngramJaccardFrom(shingles(df, idCol, textCol, n), threshold, maxDocFreq)

  /** [[ngramJaccard]] over a prebuilt `(id, shingle)` relation — the
    * entry [[shingleFamilyRollup]] feeds ONE staged shingle relation
    * through (r8): every shingle-family operator has a `*From` twin so
    * a combined run tokenizes the corpus once, not once per report. */
  private[graft] def ngramJaccardFrom(
      shAll: DataFrame,
      threshold: Double,
      maxDocFreq: Option[Int]): DataFrame = {
    val sizes = shingleSizes(shAll)
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

  /** Dedup survival curve (E202) — the threshold-picking decision
    * artifact in front of every near-dup pass: for each candidate
    * threshold t ∈ {0.1 … 0.9}, the pair count at J ≥ t, how many
    * documents the per-pair larger-id drop rule ([[jaccardDedupExecute]])
    * would remove, and how many survive — "0.5 keeps 98.1%, 0.3 keeps
    * 91.4%" read directly off one relation instead of nine re-runs.
    * Survivor counts are exact, not pair-count heuristics: a doc in
    * many pairs is still removed once.
    *
    * Scale shape: the pair relation is built ONCE at the lowest
    * threshold (same shared-shingle equi-join and caps as
    * [[ngramJaccard]]) and checkpointed, then rolled up to ≤9-row
    * per-threshold-band relations (pair counts band the pair's J;
    * removal counts band each id_b's MAX J — a doc is removed at t iff
    * its best smaller-id neighbor reaches t, so the per-doc max makes
    * the distinct-count cumsum-able). The nine slices are cumulative
    * sums over those ≤9-row relations via a 9-row grid non-equi join —
    * the duplicate-mass relation itself is never broadcast and never
    * re-read per slice (ADVICE r11: the old LEFT non-equi join against
    * a broadcast-hinted preserved side actually broadcast the PAIR
    * relation). Corpus size enters as one broadcast scalar. Band cuts
    * reuse the grid's exact doubles (b/10.0 = the decimal literal, both
    * correctly rounded), so `band(j) ≥ b ⟺ j ≥ t` bit-for-bit.
    *
    * Cites reference scope: threshold sweeps are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def dedupSurvival(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold = 0.1,
      maxDocFreq = maxDocFreq)
      .localCheckpoint(true) // both band rollups read it
    val total = df.agg(count(lit(1)).as("n_docs"))
    // largest grid threshold b/10.0 a given J satisfies; all pairs have
    // J >= 0.1 by construction, so the fall-through band is 1
    def bandOf(j: Column): Column = (2 to 9).foldLeft(lit(1L)) {
      // fold low→high so the HIGHEST satisfied threshold is outermost
      (acc, b) => when(j >= lit(b.toDouble / 10.0), lit(b.toLong)).otherwise(acc)
    }
    val pairBands = pairs
      .groupBy(bandOf(col("jaccard")).as("band"))
      .agg(count(lit(1)).as("np"))
    val remBands = pairs
      .groupBy("id_b").agg(max(col("jaccard")).as("mj"))
      .groupBy(bandOf(col("mj")).as("band"))
      .agg(count(lit(1)).as("nr"))
    val grid = df.sparkSession.range(1, 10)
      .select(col("id").as("tb"),
        (col("id").cast("double") / lit(10.0).cast("double")).as("t"))
    grid
      .join(broadcast(pairBands), col("band") >= col("tb"), "left")
      .groupBy("tb", "t")
      .agg(sum(coalesce(col("np"), lit(0L))).as("n_pairs"))
      .join(
        grid.join(broadcast(remBands), col("band") >= col("tb"), "left")
          .groupBy("tb")
          .agg(sum(coalesce(col("nr"), lit(0L))).as("n_removed")),
        Seq("tb"))
      .crossJoin(broadcast(total))
      .select(
        round(col("t"), 1).as("threshold"),
        col("n_pairs"), col("n_removed"),
        (col("n_docs") - col("n_removed")).as("n_survivors"))
  }

  /** LSH recall curve (E203) — the empirical S-curve every MinHash-LSH
    * deployment is tuned against: per Jaccard band (floor(10·J) over the
    * exact pair relation at J ≥ threshold), how many pairs the banded
    * sketch stage actually caught, and the per-band recall. The
    * theoretical capture probability 1−(1−s^r)^b is what the (bands,
    * rows) geometry PROMISES; this relation is what it DELIVERS on the
    * corpus at hand — the readout that decides whether to add bands
    * (recall sag near the threshold) or rows (too many sub-threshold
    * candidates upstream, visible in [[minhashLsh]]'s cap diagnostics).
    *
    * Scale shape: one exact pair relation + one LSH pair relation,
    * a pair-keyed left join and a ≤10-group rollup. The LSH side is
    * capped by `maxBandFreq`; the exact side's shared-shingle join is
    * capped by `maxDocFreq` (default None = uncapped — on
    * boilerplate-heavy corpora SET IT, and note the asymmetry when
    * reading the curve: a capped exact relation undercounts `n_exact`
    * on hot-shingle pairs, so recall reads HIGH there). Path-dependent
    * (band hashes) →
    * rows-only in the gate; the `lsh_recall_audit` all-true twin pins
    * caught ⊆ exact per band, deterministic full capture of the J = 1
    * band, and that every LSH pair lands in exactly one band. */
  def lshRecallCurve(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBandFreq: Option[Int] = Some(10000),
      maxDocFreq: Option[Int] = None): DataFrame = {
    val exact = ngramJaccard(df, idCol, textCol, n, threshold,
      maxDocFreq = maxDocFreq)
    val lsh = minhashLsh(
      df, idCol, textCol, n, threshold, numHashes, bands, maxBandFreq)
      .select(col("id_a"), col("id_b"), lit(1L).as("_c"))
    exact
      .withColumn("band", floor(col("jaccard") * 10).cast("long"))
      .join(lsh, Seq("id_a", "id_b"), "left")
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("_c"), lit(0L))).as("n_caught"))
      .select(
        col("band"), col("n_exact"), col("n_caught"),
        round(col("n_caught").cast("double") / col("n_exact").cast("double"), 6)
          .as("recall"))
  }

  /** N-gram-Jaccard dedup EXECUTOR (E181) — the drop action for [[ngramJaccard]]'s
    * verdict relation: every document with a SMALLER-id neighbor at
    * J ≥ `threshold` is removed (the deterministic per-pair larger-id
    * rule E170 uses for substring spans: the minimum id of any connected
    * duplicate component has no smaller-id neighbor and is never
    * removed, so every near-dup cluster keeps at least that member —
    * no connected-components pass needed for the safety property). The
    * kept corpus returns sha256-pinned with its char length — the E169
    * executor output convention.
    *
    * Scale shape: candidate generation is [[ngramJaccard]] verbatim
    * (shared-shingle equi-join, optional `maxDocFreq` hot-shingle cap);
    * the removal set is ids only (8 bytes/doc) and anti-joins back onto
    * the corpus — document payloads never shuffle, and the removal side
    * is duplicate-count-sized, broadcastable in any real corpus.
    *
    * Cites reference scope: curation actions are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def jaccardDedupExecute(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val removed = ngramJaccard(df, idCol, textCol, n, threshold, maxDocFreq)
      .select(col("id_b").as(idCol)).distinct()
    df.join(removed, Seq(idCol), "left_anti")
      .select(
        col(idCol),
        sha2(col(textCol), 256).as("text_sha"),
        length(col(textCol)).cast("long").as("n_chars"))
  }

  /** MinHash-LSH dedup EXECUTOR (E185) — [[jaccardDedupExecute]]'s
    * 100 TB sibling: the same per-pair larger-id drop rule applied to
    * [[minhashLsh]]'s VERIFIED pair relation instead of the exact
    * all-shared-shingle join. Because minhashLsh re-checks every banded
    * candidate against the true shingle-set Jaccard before emitting it,
    * the pair relation is a SUBSET of the exact one (minhash_audit pins
    * this) — so every removal here is a removal the exact executor would
    * also make (soundness by construction); what LSH can miss is
    * candidates, i.e. this executor may KEEP a borderline near-dup the
    * exact rule would drop, never the reverse. Identical documents
    * (J = 1) have identical signatures, hence identical band hashes, and
    * are caught deterministically.
    *
    * Scale shape: candidate generation is banded bucket equi-joins with
    * the absolute `maxBandFreq` hot-bucket cap — work bounded by bucket
    * occupancy, never corpus²; verification touches candidate pairs
    * only; the removal set is ids-only and broadcast anti-joins back.
    * This is the executor to run when the exact pair join's shared-
    * shingle fan-out (even capped) is the bottleneck.
    *
    * Path-dependent (band hashes) → rows-only in the gate; the
    * `minhash_dedup_execute_audit` all-true twin pins soundness
    * (removed ⊆ exact-removed), the corpus partition property, and
    * deterministic capture of identical-document pairs.
    *
    * Cites reference scope: curation actions are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def minhashDedupExecute(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      maxBandFreq: Option[Int] = Some(10000)): DataFrame = {
    val removed = minhashLsh(
      df, idCol, textCol, n, threshold, numHashes, bands, maxBandFreq)
      .select(col("id_b").as(idCol)).distinct()
    df.join(broadcast(removed), Seq(idCol), "left_anti")
      .select(
        col(idCol),
        sha2(col(textCol), 256).as("text_sha"),
        length(col(textCol)).cast("long").as("n_chars"))
  }

  /** Asymmetric n-gram containment pairs (E128) — the near-dup relation
    * Jaccard structurally under-reports: a short document quoted whole
    * inside a long one has C(sub→super) = |A∩B|/|A| ≈ 1 while J =
    * |A∩B|/|A∪B| stays far below any dedup threshold (the snippet/
    * boilerplate-inclusion case — press-release bodies inside news
    * rollups, README fragments inside vendored trees). Emits DIRECTED
    * rows `(id_sub, id_super, n_shared, containment)` with containment
    * = c/|sub| ≥ threshold; a mutual pair (two near-identical docs)
    * yields both directions, exactly like the underlying set algebra.
    *
    * Scale shape is [[ngramJaccard]]'s verbatim: one shared-shingle
    * equi-join bounded by actual overlap (`maxDocFreq` hot-shingle cap
    * available), sizes joined back on compact ids, one cheap unionAll to
    * direct the undirected intersection relation — no second shingle
    * pass. */
  def ngramContainment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxDocFreq: Option[Int] = None): DataFrame =
    ngramContainmentFrom(
      shingles(df, idCol, textCol, n), threshold, maxDocFreq)

  /** [[ngramContainment]] over a prebuilt shingle relation — see
    * [[ngramJaccardFrom]]. */
  private[graft] def ngramContainmentFrom(
      shAll: DataFrame,
      threshold: Double,
      maxDocFreq: Option[Int]): DataFrame = {
    val sizes = shingleSizes(shAll)
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
    val directed = inter
      .select(col("id_a").as("id_sub"), col("id_b").as("id_super"), col("c"))
      .unionAll(inter.select(col("id_b").as("id_sub"),
        col("id_a").as("id_super"), col("c")))
    directed
      .join(sizes.select(col("id").as("id_sub"), col("n_sh").as("n_sub")),
        "id_sub")
      .select(
        col("id_sub"), col("id_super"), col("c").as("n_shared"),
        round(col("c").cast("double") / col("n_sub").cast("double"), 6)
          .as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Similarity-threshold sweep (E135) — how many near-dup pairs each
    * Jaccard band holds: the decision table for CHOOSING a dedup
    * threshold (the E2/E3 operators take the threshold as given; this
    * shows what each setting would sweep in — a fat 0.5-0.7 band means
    * the corpus has a large fuzzy-boilerplate stratum and the threshold
    * choice moves millions of documents). Buckets are
    * floor(round(J,6)·10) over all shared-shingle pairs with J ≥
    * `minJaccard`, bucket 10 = exact duplicates (J = 1).
    *
    * Scale shape: the [[ngramJaccard]] pair relation (same equi-join
    * bounded by real overlap, same `maxDocFreq` guard) collapsed
    * map-side to ≤11 cells — the report adds NO shuffle beyond the pair
    * computation itself. */
  def jaccardHistogram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.1,
      maxDocFreq: Option[Int] = None): DataFrame =
    jaccardHistogramFrom(
      shingles(df, idCol, textCol, n), minJaccard, maxDocFreq)

  /** [[jaccardHistogram]] over a prebuilt shingle relation — see
    * [[ngramJaccardFrom]]. */
  private[graft] def jaccardHistogramFrom(
      shAll: DataFrame,
      minJaccard: Double,
      maxDocFreq: Option[Int]): DataFrame =
    ngramJaccardFrom(shAll, minJaccard, maxDocFreq)
      .groupBy(floor(col("jaccard") * 10).cast("long").as("bucket"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(min(col("jaccard")), 6).as("min_jaccard"),
        round(max(col("jaccard")), 6).as("max_jaccard"))

  /** Per-document n-gram novelty (E129) — what fraction of a document's
    * distinct n-grams exist NOWHERE else in the corpus: the inverse face
    * of the dedup suite (E1-E5 find what repeats; this scores what
    * doesn't). Low novelty without a near-dup partner is the templated-
    * text fingerprint (mad-libs boilerplate whose every phrase appears
    * elsewhere without any single document matching), and novelty-mass
    * tracking across ingest batches is the standard "is new data still
    * new" curation signal next to E71's vocabulary growth.
    *
    * Scale shape: the ONE shingle relation feeds both sides — a
    * map-side-combined corpus frequency per shingle and a per-doc
    * reduce; the join between them carries (shingle, df) against the
    * distinct (doc, shingle) relation, bounded by Σ|doc vocabularies|.
    * Documents with no n-grams (shorter than n tokens) are absent, the
    * LM-scorer convention. */
  def ngramNovelty(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame =
    ngramNoveltyFrom(shingles(df, idCol, textCol, n))

  /** [[ngramNovelty]] over a prebuilt shingle relation — see
    * [[ngramJaccardFrom]]. */
  private[graft] def ngramNoveltyFrom(sh: DataFrame): DataFrame = {
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(freq, "shingle")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_ngrams"),
        count(when(col("df") === 1L, lit(1))).as("n_unique"))
      .select(
        col("id"), col("n_ngrams"), col("n_unique"),
        round(col("n_unique").cast("double") / col("n_ngrams").cast("double"),
          6).as("novelty"))
  }

  /** Near-dup graph degree histogram (E147) — the pair-explosion
    * diagnostic BEFORE clustering: how many near-dup partners each
    * document has, as a (degree, n_nodes) histogram. A heavy tail here
    * is the boilerplate hub — the node that makes the CC pair relation
    * quadratic and the thing `maxDocFreq`/`maxBandFreq` caps exist to
    * bound; reading this histogram is how those caps get SET. Two
    * strictly-shrinking reduces over the [[ngramJaccard]] pair relation
    * (pairs → per-node degrees → histogram). */
  def dupGraphDegrees(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame =
    dupGraphDegreesFrom(shingles(df, idCol, textCol, n), threshold)

  /** [[dupGraphDegrees]] over a prebuilt shingle relation — see
    * [[ngramJaccardFrom]]. */
  private[graft] def dupGraphDegreesFrom(
      sh: DataFrame, threshold: Double): DataFrame = {
    val pairs = ngramJaccardFrom(sh, threshold, None)
    pairs.select(col("id_a").as("id"))
      .unionAll(pairs.select(col("id_b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Shared-shingle dedup family rollup (r8) — the E17 never-rescan
    * story applied to the dedup suite: E2 (jaccard pairs), E128
    * (containment), E129 (novelty), E135 (threshold sweep) and E147
    * (degree histogram) each need the SAME `(id, shingle)` relation,
    * and a monitoring pipeline that runs them as five separate queries
    * tokenizes the corpus five times. This entry stages the shingle
    * relation ONCE (persist + eager materialize — the five consumers
    * then plan InMemoryTableScans, pinned by PlanAuditSpec), reduces
    * each report to its metadata-sized summary row, and unpersists
    * before returning:
    *
    *   `(family, n_rows, check_sum)` — check_sum is the family's
    *   DECIMAL(38,6)-quantized score sum (order-independent, so it
    *   hash-matches the DuckDB twin cell-for-cell), giving the oracle a
    *   full-content handle on all five computations in one relation.
    *
    * The summaries are computed eagerly (metadata-sized aggregates
    * only — never row data) so the staged relation's lifetime is
    * contained inside the call, the audit-entry convention. */
  def shingleFamilyRollup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      jaccardThreshold: Double = 0.5,
      containThreshold: Double = 0.8,
      minJaccard: Double = 0.1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val Dec6 = org.apache.spark.sql.types.DecimalType(38, 6)
    val sh = shingles(df, idCol, textCol, n).persist()
    try {
      sh.count() // materialize: downstream plans read the cached relation
      def summarize(dfx: DataFrame, scoreSum: Column): (Long, Double) = {
        val r = dfx.agg(
          count(lit(1)).as("c"),
          round(coalesce(scoreSum, lit(0).cast(Dec6)), 6)
            .cast("double").as("s")).head()
        (r.getLong(0), r.getDouble(1))
      }
      Seq(
        ("containment", summarize(
          ngramContainmentFrom(sh, containThreshold, None),
          sum(col("containment").cast(Dec6)))),
        ("degrees", summarize(
          dupGraphDegreesFrom(sh, jaccardThreshold),
          sum((col("degree") * col("n_nodes")).cast(Dec6)))),
        ("histogram", summarize(
          jaccardHistogramFrom(sh, minJaccard, None),
          sum(col("n_pairs").cast(Dec6)))),
        ("jaccard", summarize(
          ngramJaccardFrom(sh, jaccardThreshold, None),
          sum(col("jaccard").cast(Dec6)))),
        ("novelty", summarize(
          ngramNoveltyFrom(sh),
          sum(col("novelty").cast(Dec6)))))
        .map { case (f, (rows, s)) => (f, rows, s) }
        .toDF("family", "n_rows", "check_sum")
        .orderBy("family")
    } finally { sh.unpersist(); () }
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
    val trainShAll = shingles(corpus, idCol, textCol, n)
    val trainSh = maxDocFreq match {
      case Some(cap) =>
        val rare = trainShAll.groupBy("shingle").agg(count(lit(1)).as("df"))
          .where(col("df") <= cap).select("shingle")
        trainShAll.join(rare, "shingle")
      case None => trainShAll
    }
    val benchSh = shingles(bench, idCol, textCol, n)
      .select(col("id").as("bench_id"), col("shingle"))
    trainSh.select(col("id").as("train_id"), col("shingle"))
      .join(benchSh, "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Per-eval-document soft contamination (E93) — the GPT-3-style
    * decontamination REPORT that complements [[contamination]]'s pair
    * list: for each benchmark/eval document, what fraction of its
    * distinct word n-grams appears ANYWHERE in the training corpus. The
    * pair view answers "which train docs leaked"; this answers "how dirty
    * is each eval item" — the number eval-set filtering thresholds on.
    *
    * Scale shape: the train side collapses to a DISTINCT shingle relation
    * (compact strings, one map-side-combined distinct — no doc ids, no
    * payloads); the eval side is tiny relative to the corpus, so the
    * membership left join broadcasts it and streams the train relation
    * past it. Eval documents with fewer than n tokens have no n-grams and
    * are omitted (the LM scorers' empty-input rule). */
  def contaminationRatio(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val trainSh = shingles(corpus, idCol, textCol, n)
      .select("shingle").distinct()
    val benchSh = shingles(bench, idCol, textCol, n)
    benchSh.join(trainSh.withColumn("hit", lit(1)), Seq("shingle"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_ngrams"),
        count(col("hit")).as("n_contaminated"))
      .select(
        col("id"), col("n_ngrams"), col("n_contaminated"),
        round(col("n_contaminated").cast("double") /
          col("n_ngrams").cast("double"), 6).as("contaminated_ratio"))
  }

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
    val sig = minhashSignatures(shingles(df, idCol, textCol, n), numHashes)
    val buckets = capHotBuckets(
      bandBuckets(sig, numHashes, bands), Seq("band", "bh"), maxBandFreq)
    val cands = buckets.alias("x").join(buckets.alias("y"), Seq("band", "bh"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val estExpr = round(
      hs.map(h => when(col(s"a_$h") === col(s"b_$h"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / lit(numHashes.toDouble), 6)
    val est = cands
      .join(sig.select((col("id").as("id_a") +:
        hs.map(h => col(h).as(s"a_$h"))): _*), Seq("id_a"))
      .join(sig.select((col("id").as("id_b") +:
        hs.map(h => col(h).as(s"b_$h"))): _*), Seq("id_b"))
      .select(col("id_a"), col("id_b"), estExpr.as("est"))
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
      * read → min-id-per-hash compact → write beside → atomic-ish swap
      * (never overwrite a parquet dir while a plan still reads it) →
      * refresh the count. Returns the compacted row count. */
    def compact(spark: org.apache.spark.sql.SparkSession, path: String,
        numHashes: Int = 32): Long = {
      val hs = (0 until numHashes).map(i => s"h$i")
      val keep = "id" +: "content_hash" +: hs
      val tmp = path.stripSuffix("/") + "__compacting"
      compactState(read(spark, path), numHashes)
        .select(keep.map(col): _*)
        .write.mode("overwrite").parquet(tmp)
      val f = fs(spark, path)
      f.delete(new Path(path), true)
      if (!f.rename(new Path(tmp), new Path(path)))
        throw new java.io.IOException(
          s"StateStore.compact: rename $tmp -> $path failed")
      refreshMeta(spark, path)
    }
  }

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
    * Scale shape: ONE codegen'd expression per row
    * ([[graft.functions.WinnowSelect]] — the former higher-order-function
    * pipeline evaluated its lambdas interpreted, allocating per k-gram;
    * r10 measured 4.6 s → ~1 s for the pass at the 10× lane point) + one
    * explode of the DISTINCT selected fingerprints (≈ 2/(w+1) of
    * positions); no shuffle, no state. Returns `(id, pos, hash)` rows. */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4): DataFrame = {
    require(k > 0 && w > 0, "need positive k and w")
    graft.functions.WinnowSelect.register(df.sparkSession)
    val PosBase = graft.functions.WinnowSelect.PosBase
    graft.profiler.ScanMetrics.spread(df) // see shingles note
      .select(
        col(idCol).as("id"),
        // enforce the packing cap HERE too (the expression re-checks, but
        // only this site can name the offending document id). coalesce:
        // length(NULL) is NULL, which would otherwise make the condition
        // NULL and mis-route null text into raise_error — null text must
        // keep flowing to the null → zero-rows explode branch below
        when(coalesce(length(col(textCol)), lit(0)) < lit(PosBase), col(textCol))
          .otherwise(raise_error(concat(
            lit("winnowFingerprints: document "), col(idCol).cast("string"),
            lit(" has length "), length(col(textCol)).cast("string"),
            lit(s" >= 2^20 (packing cap); chunk long documents first"))))
          .as("_t"))
      .select(
        col("id"),
        explode(call_function("winnow_select",
          col("_t"), lit(k), lit(w))).as("enc"))
      .select(
        col("id"),
        (lit(PosBase - 1) - pmod(col("enc"), lit(PosBase))).as("pos"),
        expr(s"enc div $PosBase").as("hash"))
  }

  /** Near-duplicate pairs by shared winnowing fingerprints (E73) — the
    * MOSS-style complement to MinHash (E3): where MinHash estimates
    * whole-document set resemblance, winnowing fingerprints are LOCAL
    * (every ≥w+k−1-char match is guaranteed a shared fingerprint), so this
    * catches documents sharing long verbatim passages even when their
    * overall shingle Jaccard is low — contracts with swapped clauses,
    * code files sharing a license header plus real logic.
    *
    * Similarity contract: STOP-FINGERPRINTS are dropped from BOTH sides
    * of the measure first — any fingerprint whose document frequency
    * exceeds `maxHashFreq` (default [[DefaultHotFingerprintCap]] = 32:
    * a k-gram window shared verbatim by more than 32 documents is
    * corpus boilerplate — license headers, templates — not resemblance
    * signal, REGARDLESS of corpus size; the testdata's template-heavy
    * generator made the sensitivity measurable — median 8-gram df is 14
    * and Σ df² at cap 128 is 5× the cap-32 volume for the SAME 25-pair
    * answer at sf0.01, so 32 is where signal stops paying for
    * candidates). The cap is also the scale
    * guard: candidate pairs are Σ df², and only an ABSOLUTE cap bounds
    * that at `#fingerprints · cap²` — linear in corpus size. The r9
    * corpus-RELATIVE default (`docFreqFraction` of the doc count,
    * reachable with `maxHashFreq = None`) left Σ df² quadratic in N
    * (worst-case per-fingerprint fan-out (0.02·N)² — measured as 25×
    * wall-time at 10× data in the r9 scale lane, VERDICT r9) and
    * survives only as the documented small-corpus/IDF-study mode.
    *
    * PREFIX-FILTERED pair generation (r10, after the absolute cap cut
    * the r9 quadratic to linear and the lane showed the operator was
    * then CANDIDATE-VOLUME-bound — 47.7M candidate rows through a
    * shuffle for 2.6k result pairs at the 10× point): the standard
    * set-similarity-join prefix filter (Chaudhuri et al. SSJoin '06;
    * Bayardo et al. WWW '07). Under ANY global element order, two sets
    * with Jaccard ≥ t must share an element within the first
    * `n − ceil(t·n) + 1` elements of each — so only that PREFIX is
    * indexed into the candidate self-join, and ordering ascending by
    * document frequency puts each document's RAREST fingerprints in its
    * prefix: documents made of unique content index df=1 fingerprints
    * and generate ZERO candidates; candidate volume tracks the true
    * near-dup mass instead of Σ df². Candidates are then verified
    * EXACTLY against per-document sorted full fingerprint sets
    * (`array_intersect` — the r8 minhashLsh verification shape), so the
    * filter is lossless by the prefix theorem and the oracle keeps
    * computing the plain full join.
    *
    * PRE-FLIGHT GUARD (r10): before the candidate join is even planned,
    * one frequency aggregation over the PREFIX relation computes the
    * EXACT candidate count Σ pf·(pf−1)/2; past `maxCandidatePairs` the
    * call fails loudly with the count and the knobs to turn (the
    * [[hotBucketStats]] observability precedent: degenerate corpora are
    * detected up front, not discovered from a hung quadratic join).
    * Cost: one metadata-sized aggregation over an already-materialized
    * relation; `None` skips it.
    *
    * Over the surviving
    * per-document distinct fingerprint sets: exact Jaccard
    * c/(nₐ+n_b−c), threshold-filtered.
    *
    * Scale shape: the candidate join carries (hash, id) longs only —
    * text and positions never shuffle; the hash-frequency cap bounds any
    * key's fan-out (the same [[capHotBuckets]] machinery as E3/E4) and
    * the prefix filter bounds candidate VOLUME; the per-doc ranking is a
    * doc-partitioned window (each partition is one document's ≤2²⁰
    * fingerprints — never a global window); verification joins are
    * candidate-sized. The fingerprint relation and the ranked relation
    * are each materialized exactly once (localCheckpoint — on a cluster
    * the blocks live on executors, GC-cleaned with the plan).
    *
    * Cites reference scope: dedup is absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  val DefaultHotFingerprintCap: Int = 32

  def winnowNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      threshold: Double = 0.5,
      maxHashFreq: Option[Int] = Some(DefaultHotFingerprintCap),
      docFreqFraction: Double = 0.02,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    // relative fallback mode: one metadata-cheap count; mirror the
    // oracle's CEIL(COUNT(*) * fraction) double algebra exactly
    val cap = maxHashFreq.getOrElse {
      val nDocs = df.count()
      math.max(2L, math.ceil(nDocs * docFreqFraction).toLong).toInt
    }
    import org.apache.spark.sql.expressions.Window
    // ONE fingerprint pass, materialized: the (id, hash) relation feeds
    // the frequency table, the ranking window and the verification sets —
    // recomputing the k-gram hash expressions for each consumer was ~5
    // scans of per-row expression work (measured 26 s → 9 s at the 10×
    // lane point). localCheckpoint truncates to the ~16-byte-per-row
    // long pairs.
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("hash")).distinct()
      .localCheckpoint(true)
    val freq = fp.groupBy("hash").agg(count(lit(1)).as("bf"))
    val kept = fp.join(
      freq.where(col("bf") <= cap).select(col("hash"), col("bf")),
      Seq("hash"))
    // rank each doc's surviving fingerprints under the global
    // (df asc, hash asc) order; nf rides the same doc-partitioned window
    val byDoc = Window.partitionBy("id")
    val ranked = kept
      .withColumn("nf", count(lit(1)).over(byDoc))
      .withColumn("rn",
        row_number().over(byDoc.orderBy(col("bf"), col("hash"))))
      .select("id", "hash", "nf", "rn")
      .localCheckpoint(true)
    // prefix theorem (Jaccard ≥ t ⇒ prefixes of length n − ceil(t·n) + 1
    // under a common order intersect): index only the prefix. The bound
    // is computed on a 6-dp-rounded product: raw double t·n can land one
    // ulp ABOVE an exact-integer product (100·0.07 = 7.000000000000001),
    // and ceil of that overestimates the required overlap by 1 — a
    // one-too-short prefix that silently breaks losslessness for pairs
    // with exactly the minimum qualifying overlap (ADVICE r10).
    val prefix = ranked
      .where(col("rn") <=
        col("nf") - ceil(round(col("nf") * lit(threshold), 6)) + lit(1))
      .select("id", "hash")
    maxCandidatePairs.foreach { bound =>
      val est = prefix.groupBy("hash").agg(count(lit(1)).as("pf"))
        .agg(coalesce(
          sum(col("pf") * (col("pf") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"winnowNearDup pre-flight: $est prefix candidate pairs under " +
          s"hot-fingerprint cap $cap exceed maxCandidatePairs=$bound — " +
          "refusing the quadratic join; lower maxHashFreq (the " +
          "boilerplate cap) or raise maxCandidatePairs deliberately")
    }
    val cands = prefix.select(col("id").as("id_a"), col("hash"))
      .join(prefix.select(col("id").as("id_b"), col("hash")), Seq("hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // exact verification against the full per-doc sorted sets — the
    // prefix filter is lossless, this is where every candidate earns
    // (or loses) its jaccard
    val sets = ranked.groupBy("id").agg(
      sort_array(collect_list(col("hash"))).as("fset"),
      max(col("nf")).as("nf"))
    cands
      .join(sets.select(col("id").as("id_a"), col("fset").as("fa"),
        col("nf").as("na")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("fset").as("fb"),
        col("nf").as("nb")), Seq("id_b"))
      .withColumn("c", size(array_intersect(col("fa"), col("fb"))).cast("long"))
      .select(
        col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact-substring duplicate spans (E156) — the dedup family the
    * suffix-array literature calls exact substring deduplication (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * ACL '22): find pairs of documents sharing a VERBATIM run of at least
    * `minLen` characters and report the maximal such span. Where
    * [[winnowNearDup]] scores whole-document resemblance from shared
    * fingerprints, this returns the overlap itself — start offsets and
    * length — the unit a curation pipeline actually cuts.
    *
    * Not a distributed suffix array: the same detection guarantee comes
    * from winnowing anchors at a join's cost. By the winnowing theorem
    * (Schleimer et al., SIGMOD '03), any common substring of length
    * ≥ w+k−1 contains a full window of k-grams in both documents, and the
    * window's minimum-hash k-gram is selected in BOTH (the packed
    * position tie-break changes which occurrence is kept, never which
    * hash value wins a window) — so every qualifying overlap surfaces as
    * an equi-join hit on a shared anchor hash, and maximal extension
    * around the anchor ([[graft.functions.CommonExtend]], codegen'd)
    * recovers the span's full extent. Detection is EXHAUSTIVE above
    * w+k−1 chars, modulo anchors suppressed by the boilerplate cap.
    *
    * Hash collisions (31-adic mod 2³¹−1) cannot fabricate spans: the
    * extension kernel re-checks the anchor verbatim and returns −1 on
    * mismatch.
    *
    * Per pair, ONE maximal span is reported — lexicographic max of
    * `(len, start_a, start_b)` — plus `n_spans`, the count of DISTINCT
    * maximal spans of length ≥ k the pair shares (a width signal:
    * templated pairs share many short runs, plagiarized pairs one long
    * one). Note the floor is k, not w+k−1: spans of length k..w+k−2
    * are counted whenever winnowing happened to anchor them — only
    * DETECTION above w+k−1 is guaranteed-exhaustive (ADVICE r10: the
    * two engines count identically either way; this doc states the
    * implemented floor).
    *
    * Scale shape: anchors are the winnowing fingerprints (≈2/(w+1) of
    * positions); the ABSOLUTE occurrence cap `maxOccFreq` (default
    * [[DefaultHotFingerprintCap]]) drops boilerplate anchors BEFORE the
    * join, bounding candidates at #hashes·cap² — linear in corpus size
    * (the r10 winnow doctrine); the optional pre-flight guard computes
    * the exact candidate count and refuses a blow-up loudly. Texts ship
    * only to surviving candidates (two equi-joins on id), so payload
    * movement is candidate-bounded, not corpus-bounded.
    *
    * Cites reference scope: dedup is absent from awsdataprofiler
    * (Profiler.scala:166-253 profiles only) — extension per SURVEY §2.E. */
  def substringDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"substringDup: minLen=$minLen below the winnowing detection " +
        s"guarantee w+k-1=${w + k - 1}; shorter overlaps are not " +
        "exhaustively found — lower k/w instead")
    substringDupSpans(df, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs)
      .groupBy("id_a", "id_b")
      .agg(
        // the REPORTED span is the LONGEST (ties → largest start_a, then
        // start_b): lexicographic struct max
        max(struct(col("len"), col("start_a"), col("start_b"))).as("best"),
        count(lit(1)).as("n_spans"))
      .select(
        col("id_a"), col("id_b"),
        col("best.len").as("overlap_len"),
        col("best.start_a").as("start_a"),
        col("best.start_b").as("start_b"),
        col("n_spans"))
      .where(col("overlap_len") >= minLen)
  }

  /** The full DISTINCT maximal-span relation behind [[substringDup]]:
    * `(id_a, id_b, start_a, start_b, len)` — every maximal common
    * substring found through a surviving winnowing anchor, of ANY length
    * (callers filter; detection is exhaustive from w+k−1 up). Shared by
    * [[substringDup]] (per-pair longest) and [[substringDupCoverage]]
    * (per-document interval union). */
  def substringDupSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    graft.functions.CommonExtend.register(df.sparkSession)
    // anchor sites: (id, pos, hash) — positions kept, unlike the
    // near-dup path's per-doc distinct sets
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .localCheckpoint(true)
    // ABSOLUTE occurrence cap: a k-gram window appearing more than
    // maxOccFreq times across the corpus is boilerplate (license
    // headers, templates) — and occurrence (not document) frequency is
    // what bounds the candidate join, Σ occ² ≤ #hashes·cap²
    val kept = fp.join(
      fp.groupBy("hash").agg(count(lit(1)).as("occ"))
        .where(col("occ") <= maxOccFreq)
        .select("hash"),
      Seq("hash"))
    maxCandidatePairs.foreach { bound =>
      val est = kept.groupBy("hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"substringDup pre-flight: $est anchor candidate pairs under " +
          s"occurrence cap $maxOccFreq exceed maxCandidatePairs=$bound — " +
          "refusing the quadratic join; lower maxOccFreq or raise " +
          "maxCandidatePairs deliberately")
    }
    val cands = kept.select(
      col("id").as("id_a"), col("pos").as("pos_a"), col("hash"))
      .join(kept.select(
        col("id").as("id_b"), col("pos").as("pos_b"), col("hash")),
        Seq("hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "pos_a", "id_b", "pos_b")
    val texts = df.select(col(idCol).as("id"), col(textCol).as("t"))
    val P = graft.functions.WinnowSelect.PosBase // 2^20: the packing base
    val ext = cands
      .join(texts.select(col("id").as("id_a"), col("t").as("ta")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("t").as("tb")), Seq("id_b"))
      .select(
        col("id_a"), col("id_b"),
        call_function("common_extend",
          col("ta"), col("pos_a"), col("tb"), col("pos_b"), lit(k)).as("enc"))
      .where(col("enc") >= 0L)
      .distinct() // many anchors inside one span encode the SAME span
    ext.select(
      col("id_a"), col("id_b"),
      expr(s"enc div ${P * P}").cast("long").as("start_a"),
      pmod(expr(s"enc div $P"), lit(P)).cast("long").as("start_b"),
      pmod(col("enc"), lit(P)).cast("long").as("len"))
  }

  /** Cross-table exact-substring contamination (E161) — the span-level
    * train/eval decontamination pass (the application Lee et al. and the
    * GPT-3 appendix dedup actually run): find every (corpus doc, eval
    * doc) pair sharing a verbatim run ≥ `minLen` chars and report the
    * maximal span with offsets on BOTH sides. Where E23/E93 score
    * document-level n-gram containment, this returns the leaked span
    * itself — what a decontamination pipeline cuts or drops.
    *
    * Same machinery and guarantees as [[substringDup]] (winnowing
    * anchors, verbatim re-check, maximal extension, absolute occurrence
    * cap + pre-flight guard), but the candidate join is corpus-side ×
    * eval-side — never corpus × corpus, so candidate volume is
    * Σ_h fC(h)·fB(h) ≤ cap·Σ fB — linear in the (small) eval set for a
    * fixed cap, the right asymmetry for a 100 TB corpus against a
    * benchmark suite. The occurrence cap counts BOTH sides together:
    * boilerplate is boilerplate wherever it appears.
    *
    * Returns `(corpus_id, eval_id, overlap_len, start_corpus,
    * start_eval, n_spans)`. */
  def substringContamination(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"substringContamination: minLen=$minLen below the winnowing " +
        s"detection guarantee w+k-1=${w + k - 1}")
    substringContaminationSpans(
      corpus, eval, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs)
      .groupBy("corpus_id", "eval_id")
      .agg(
        max(struct(col("len"), col("start_corpus"), col("start_eval")))
          .as("best"),
        count(lit(1)).as("n_spans"))
      .select(
        col("corpus_id"), col("eval_id"),
        col("best.len").as("overlap_len"),
        col("best.start_corpus").as("start_corpus"),
        col("best.start_eval").as("start_eval"),
        col("n_spans"))
      .where(col("overlap_len") >= minLen)
  }

  /** The full DISTINCT maximal-span relation behind
    * [[substringContamination]]: `(corpus_id, eval_id, start_corpus,
    * start_eval, len)` — every maximal cross-side verbatim run found
    * through a surviving winnowing anchor, of ANY length (callers filter;
    * detection is exhaustive from w+k−1 up). Shared by
    * [[substringContamination]] (per-pair longest readout) and
    * [[decontamExecute]] (the cut action). */
  def substringContaminationSpans(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    graft.functions.CommonExtend.register(corpus.sparkSession)
    val fpC = winnowFingerprints(corpus, idCol, textCol, k, w)
      .localCheckpoint(true)
    val fpB = winnowFingerprints(eval, idCol, textCol, k, w)
      .localCheckpoint(true)
    val ok = fpC.select("hash").unionAll(fpB.select("hash"))
      .groupBy("hash").agg(count(lit(1)).as("occ"))
      .where(col("occ") <= maxOccFreq)
      .select("hash")
    val keptC = fpC.join(ok, Seq("hash"))
    val keptB = fpB.join(ok, Seq("hash"))
    maxCandidatePairs.foreach { bound =>
      val est = keptC.groupBy("hash").agg(count(lit(1)).as("fc"))
        .join(keptB.groupBy("hash").agg(count(lit(1)).as("fb")), Seq("hash"))
        .agg(coalesce(sum(col("fc") * col("fb")), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"substringContamination pre-flight: $est cross candidates under " +
          s"occurrence cap $maxOccFreq exceed maxCandidatePairs=$bound")
    }
    val P = graft.functions.WinnowSelect.PosBase
    val ext = keptC.select(
      col("id").as("corpus_id"), col("pos").as("pos_c"), col("hash"))
      .join(keptB.select(
        col("id").as("eval_id"), col("pos").as("pos_b"), col("hash")),
        Seq("hash"))
      .join(corpus.select(col(idCol).as("corpus_id"), col(textCol).as("tc")),
        Seq("corpus_id"))
      .join(eval.select(col(idCol).as("eval_id"), col(textCol).as("tb")),
        Seq("eval_id"))
      .select(
        col("corpus_id"), col("eval_id"),
        call_function("common_extend",
          col("tc"), col("pos_c"), col("tb"), col("pos_b"), lit(k)).as("enc"))
      .where(col("enc") >= 0L)
      .distinct()
    ext.select(
      col("corpus_id"), col("eval_id"),
      expr(s"enc div ${P * P}").cast("long").as("start_corpus"),
      pmod(expr(s"enc div $P"), lit(P)).cast("long").as("start_eval"),
      pmod(col("enc"), lit(P)).cast("long").as("len"))
  }

  /** Interval-cut kernel shared by the decontamination and self-dedup
    * EXECUTORS: given per-document 1-based char intervals `(id, s, e)`
    * (half-open `[s, e)`), merge them by the gap-and-islands pattern and
    * rebuild each document's text with the merged islands removed.
    *
    * Scale shape: the interval relation is metadata-sized (flagged docs
    * only) — it is merged with two windows over `(id)` partitions, rolled
    * up to ONE sorted island array per flagged doc, and broadcast back
    * onto the corpus, so the document payloads never shuffle; the cut
    * itself is a per-row fold (`aggregate` over the island array)
    * appending the complement segments. Unflagged docs pass through
    * untouched with `n_cut_spans = 0`.
    *
    * Returns `(idCol, orig_len, clean_len, n_cut_spans, clean_sha)` for
    * EVERY input document — `clean_sha` the first 16 hex chars of
    * sha256 of the rebuilt text (the full-hash-oracle handle; the text
    * itself stays out of the result on purpose). */
  private def cutIntervals(
      docs: DataFrame, idCol: String, textCol: String,
      ivals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("id").orderBy(col("s"), col("e"))
    val islands = ivals
      .withColumn("pmax",
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("g",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("id", "g")
      .agg(min(col("s")).as("s0"), max(col("e")).as("e1"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("s0"), col("e1")))).as("iv"))
    val joined = docs
      .select(col(idCol).as("id"), col(textCol).as("t"))
      .join(broadcast(islands), Seq("id"), "left")
    // fold the sorted islands: append the complement segment before each
    // island, carry the cursor past it, then append the tail
    val clean = when(col("iv").isNull, col("t")).otherwise(
      aggregate(
        col("iv"),
        struct(lit(1L).as("p"), lit("").as("acc")),
        (acc, x) => struct(
          x.getField("e1").cast("long").as("p"),
          concat(acc.getField("acc"),
            col("t").substr(acc.getField("p").cast("int"),
              (x.getField("s0") - acc.getField("p")).cast("int"))).as("acc")),
        acc => concat(acc.getField("acc"),
          col("t").substr(acc.getField("p").cast("int"),
            (length(col("t")) + lit(1L) - acc.getField("p")).cast("int")))))
    joined.select(
      col("id").as(idCol),
      length(col("t")).cast("long").as("orig_len"),
      length(clean).cast("long").as("clean_len"),
      coalesce(size(col("iv")).cast("long"), lit(0L)).as("n_cut_spans"),
      substring(sha2(clean, 256), 1, 16).as("clean_sha"))
  }

  /** Span-level decontamination EXECUTOR (E169) — the ACTION for
    * [[substringContamination]]'s detection (what Lee et al. §5 and the
    * GPT-3 appendix actually do to a leaked span: cut it from the
    * training corpus, keeping the rest of the document): every corpus
    * interval covered by a ≥ `minLen`-char verbatim run shared with the
    * eval side is removed, overlapping leaks merged first, and the
    * cleaned corpus is returned as `(id, orig_len, clean_len,
    * n_cut_spans, clean_sha)` — one row per CORPUS document, untouched
    * docs included with `n_cut_spans = 0`.
    *
    * Same detection guarantees as [[substringContamination]] (winnowing
    * anchors, verbatim re-check, maximal extension, absolute occurrence
    * cap, pre-flight guard, corpus×eval asymmetry); the cut side is the
    * broadcast-islands fold of [[cutIntervals]], so corpus payloads
    * never shuffle — the right shape for 100 TB against a benchmark
    * suite. */
  def decontamExecute(
      corpus: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"decontamExecute: minLen=$minLen below the winnowing detection " +
        s"guarantee w+k-1=${w + k - 1}")
    val spans = substringContaminationSpans(
      corpus, eval, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs)
      .where(col("len") >= minLen)
    val ivals = spans.select(
      col("corpus_id").as("id"), col("start_corpus").as("s"),
      (col("start_corpus") + col("len")).as("e")).distinct()
    cutIntervals(corpus, idCol, textCol, ivals)
  }

  /** Exact-substring self-dedup EXECUTOR (E170) — the corpus-side ACTION
    * for [[substringDup]] (Lee et al.'s ExactSubstr deduplication: of
    * every verbatim run ≥ `minLen` chars appearing in two documents,
    * keep ONE occurrence and cut the other): for each cross-document
    * span the occurrence in the LARGER doc id is cut and the smaller
    * id's kept — a deterministic keep-first rule, so a duplicated
    * passage survives exactly in its lowest-id carrier. Overlapping cut
    * intervals merge before cutting. Returns the [[cutIntervals]]
    * relation over ALL documents.
    *
    * Chains resolve per-pair: a doc can keep a span against a larger id
    * while losing it against a smaller one — the cut set is the union,
    * which preserves the at-least-one-occurrence invariant globally
    * (the minimum id of every span's carrier set is never cut). */
  def substringDupExecute(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"substringDupExecute: minLen=$minLen below the winnowing " +
        s"detection guarantee w+k-1=${w + k - 1}")
    val spans = substringDupSpans(
      df, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs)
      .where(col("len") >= minLen)
    val ivals = spans.select(
      col("id_b").as("id"), col("start_b").as("s"),
      (col("start_b") + col("len")).as("e")).distinct()
    cutIntervals(df, idCol, textCol, ivals)
  }

  /** Intra-document longest repeated substring (E162) — the WITHIN-
    * document half of exact-substring dedup (Lee et al. dedupe inside
    * documents too; Gopher's repetition filters are the token-level
    * proxy this sharpens to exact characters): for every document with a
    * verbatim run occurring at least twice, the longest such run and the
    * 1-based starts of the two occurrences the maximal extension was
    * found at. Detection is exhaustive from w+k−1 chars up (winnowing:
    * both occurrences select the same window-min hash), and occurrences
    * MAY overlap (tandem repeats report the classic overlapping-LRS
    * answer — "aaaa…" repeats itself at offset 1).
    *
    * Candidate pairs are positions of the SAME fingerprint hash within
    * the SAME document; `maxSiteFreq` caps sites per (doc, hash) — a
    * pathological `abababab…` page otherwise quadratic in its own
    * length — and the pre-flight guard refuses a blow-up loudly.
    * The extension kernel is the shared [[graft.functions.CommonExtend]]
    * (both sides the same text, different anchors).
    *
    * Returns `(doc_id, repeat_len, start_1, start_2, n_repeat_spans)`
    * for documents whose longest repeat ≥ `minLen`; `n_repeat_spans`
    * counts distinct maximal repeated spans of any length. */
  def selfRepeat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 20,
      maxSiteFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"selfRepeat: minLen=$minLen below the winnowing detection " +
        s"guarantee w+k-1=${w + k - 1}")
    selfRepeatSpans(df, idCol, textCol, k, w, maxSiteFreq,
      maxCandidatePairs)
      .groupBy("id")
      .agg(
        max(struct(col("len"), col("s1"), col("s2"))).as("best"),
        count(lit(1)).as("n_repeat_spans"))
      .select(
        col("id").as(idCol),
        col("best.len").as("repeat_len"),
        col("best.s1").as("start_1"),
        col("best.s2").as("start_2"),
        col("n_repeat_spans"))
      .where(col("repeat_len") >= minLen)
  }

  /** Maximal intra-document repeated spans — [[selfRepeat]]'s underlying
    * relation `(id, s1, s2, len)` (1-based starts of both occurrences,
    * s1 < s2, every verified maximal extension ≥ k chars), exposed so
    * the executor can cut on it. Same anchors, site cap, pre-flight
    * guard and [[graft.functions.CommonExtend]] kernel. */
  def selfRepeatSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      maxSiteFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    graft.functions.CommonExtend.register(df.sparkSession)
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .localCheckpoint(true)
    val kept = fp.join(
      fp.groupBy("id", "hash").agg(count(lit(1)).as("occ"))
        .where(col("occ") <= maxSiteFreq)
        .select("id", "hash"),
      Seq("id", "hash"))
    maxCandidatePairs.foreach { bound =>
      val est = kept.groupBy("id", "hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"selfRepeat pre-flight: $est intra-document candidate pairs " +
          s"under site cap $maxSiteFreq exceed maxCandidatePairs=$bound")
    }
    val P = graft.functions.WinnowSelect.PosBase
    val ext = kept.select(col("id"), col("pos").as("p1"), col("hash"))
      .join(kept.select(col("id"), col("pos").as("p2"), col("hash")),
        Seq("id", "hash"))
      .where(col("p1") < col("p2"))
      .join(df.select(col(idCol).as("id"), col(textCol).as("t")), Seq("id"))
      .select(
        col("id"),
        call_function("common_extend",
          col("t"), col("p1"), col("t"), col("p2"), lit(k)).as("enc"))
      .where(col("enc") >= 0L)
      .distinct()
    ext.select(
      col("id"),
      expr(s"enc div ${P * P}").cast("long").as("s1"),
      pmod(expr(s"enc div $P"), lit(P)).cast("long").as("s2"),
      pmod(col("enc"), lit(P)).cast("long").as("len"))
  }

  /** Intra-document repetition-removal EXECUTOR (E188) — the action half
    * of [[selfRepeat]], and [[substringDupExecute]]'s WITHIN-document
    * sibling (the executor family's last detection lane): every maximal
    * repeated run ≥ `minLen` chars keeps its EARLIEST occurrence and the
    * later occurrence's span `[s2, s2+len)` is cut; overlapping cuts
    * merge by the shared gap-and-islands kernel ([[cutIntervals]]), so
    * a tandem repeat (`abcabcabc…`) collapses toward its first period in
    * ONE deterministic pass. One pass is the contract — cutting can
    * expose new adjacencies; re-running converges and each pass is
    * hash-oracled, the loop is the caller's policy (the E39 incremental
    * shape).
    *
    * Scale shape: detection work is [[selfRepeatSpans]]'s — per-(doc,
    * hash) site cap + pre-flight guard keep candidate pairs linear in
    * corpus size; the cut map is one sorted island array per FLAGGED doc
    * broadcast back onto the corpus, document payloads never shuffle
    * (the E169/E170 kernel contract).
    *
    * Cites reference scope: curation actions are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def selfRepeatExecute(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 20,
      maxSiteFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"selfRepeatExecute: minLen=$minLen below the winnowing " +
        s"detection guarantee w+k-1=${w + k - 1}")
    val spans = selfRepeatSpans(
      df, idCol, textCol, k, w, maxSiteFreq, maxCandidatePairs)
      .where(col("len") >= minLen)
    val ivals = spans.select(
      col("id"), col("s2").as("s"),
      (col("s2") + col("len")).as("e")).distinct()
    cutIntervals(df, idCol, textCol, ivals)
  }

  /** Per-document duplicated-character coverage (E156's corpus-level
    * readout, the statistic the suffix-array dedup paper reports): for
    * every document touched by at least one cross-document verbatim run
    * ≥ `minLen` chars, the fraction of its characters lying inside such
    * runs — `covered_chars / n_chars` after UNIONING the document's span
    * intervals (overlapping spans from different partners must not
    * double-count a character).
    *
    * Interval union is the gap-and-islands pattern (the sessionize
    * contract): per document, order intervals by (start, end), an
    * interval opens a new island when it starts strictly after the
    * running max end; island length = max end − min start. The window is
    * DOC-PARTITIONED (a document's span count — never a global order).
    *
    * Returns `(doc_id, n_islands, covered_chars, dup_char_fraction)`,
    * documents with zero qualifying spans omitted (join back to the
    * corpus for the zero-filled view). */
  def substringDupCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L)): DataFrame = {
    require(minLen >= w + k - 1,
      s"substringDupCoverage: minLen=$minLen below the winnowing " +
        s"detection guarantee w+k-1=${w + k - 1}")
    import org.apache.spark.sql.expressions.Window
    val spans = substringDupSpans(
      df, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs)
      .where(col("len") >= minLen)
    val ivals = spans
      .select(col("id_a").as("id"), col("start_a").as("s"),
        (col("start_a") + col("len")).as("e"))
      .unionByName(spans.select(col("id_b").as("id"), col("start_b").as("s"),
        (col("start_b") + col("len")).as("e")))
      .distinct()
    val byDoc = Window.partitionBy("id").orderBy(col("s"), col("e"))
    val flagged = ivals
      .withColumn("pmax",
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("g",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = flagged.groupBy("id", "g")
      .agg(min(col("s")).as("s0"), max(col("e")).as("e1"))
    islands.groupBy("id")
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("e1") - col("s0")).as("covered_chars"))
      .join(
        df.select(col(idCol).as("id"),
          length(col(textCol)).cast("long").as("_n")),
        Seq("id"))
      .select(
        col("id").as(idCol),
        col("n_islands"),
        col("covered_chars"),
        round(col("covered_chars").cast("double") / col("_n"), 6)
          .as("dup_char_fraction"))
  }

  /** Default chunk width for the substring family's chunking front-end:
    * half the 2²⁰ packing cap — far above any qualifying span while
    * keeping every chunk safely below [[graft.functions.WinnowSelect]]'s
    * position-packing limit. */
  val DefaultChunkChars: Int = 1 << 19

  /** Overlapping character chunks (r11, VERDICT r10 task 6 — the
    * front-end that lets the substring family accept ANY document
    * length): each document splits into `chunkChars`-char windows with
    * k−1 chars of overlap, so every k-gram of the original lies wholly
    * inside at least one chunk and no winnowing anchor is lost. Columns:
    * `(id, ci, off, t)` with `off` the 0-based global char offset of the
    * chunk (local 1-based position p ⇒ global 1-based position p+off).
    * Pure per-row explode+substring — no shuffle. */
  private[operators] def charChunks(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, chunkChars: Int): DataFrame = {
    val PosBase = graft.functions.WinnowSelect.PosBase
    require(k >= 1 && chunkChars > 4 * k && chunkChars < PosBase,
      s"charChunks: need 4k < chunkChars < $PosBase")
    val stride = chunkChars - (k - 1)
    val n = coalesce(length(col(textCol)), lit(0))
    val lastIdx = when(n > chunkChars,
      ceil((n - chunkChars).cast("double") / stride).cast("int"))
      .otherwise(lit(0))
    df.select(col(idCol).as("id"), col(textCol).as("txt"),
      explode(when(n > 0, sequence(lit(0), lastIdx)).otherwise(
        array().cast("array<int>"))).as("ci"))
      .select(
        col("id"), col("ci").cast("long").as("ci"),
        (col("ci").cast("long") * stride).as("off"),
        expr(s"substring(txt, ci * $stride + 1, $chunkChars)").as("t"))
  }

  /** Chunked anchor sites with GLOBAL positions: winnowing fingerprints
    * of every chunk, remapped to document coordinates, with the overlap
    * region's double detections collapsed to one representative per
    * `(doc, hash, gpos)` (kept with its chunk id + local position so the
    * extension kernel can run on the owning chunk's text). */
  private def chunkedAnchorSites(chunks: DataFrame, k: Int, w: Int): DataFrame = {
    val fp = winnowFingerprints(
      chunks.select(struct(col("id"), col("ci")).as("cid"), col("t")),
      "cid", "t", k, w)
    fp.select(col("id.id").as("doc"), col("id.ci").as("ci"),
      col("pos"), col("hash"))
      .join(chunks.select(col("id").as("doc"), col("ci"), col("off")),
        Seq("doc", "ci"))
      .select(col("doc"), col("hash"), (col("pos") + col("off")).as("gpos"),
        col("ci"), col("pos"))
      .groupBy("doc", "hash", "gpos")
      .agg(min(struct(col("ci"), col("pos"))).as("r"))
      .select(col("doc"), col("hash"), col("gpos"),
        col("r.ci").as("ci"), col("r.pos").as("pos"))
  }

  /** [[substringDupSpans]] through the chunking front-end — accepts
    * documents of ANY length (the bare form fails loudly at the 2²⁰-char
    * packing cap). Identical machinery per chunk (winnowing anchors,
    * verbatim re-check, maximal extension, absolute occurrence cap,
    * pre-flight guard), with anchors deduplicated across the k−1-char
    * chunk overlaps and all offsets remapped to GLOBAL document
    * coordinates. The one semantic difference vs the unchunked form:
    * extension truncates at chunk boundaries, so a verbatim run longer
    * than a chunk surfaces as up-to-chunk-sized pieces (still far above
    * any `minLen`); with every document under `chunkChars`, the output
    * is exactly [[substringDupSpans]]'s (parity-tested, Round11Spec). */
  def substringDupSpansChunked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L),
      chunkChars: Int = DefaultChunkChars): DataFrame = {
    graft.functions.CommonExtend.register(df.sparkSession)
    val P = graft.functions.WinnowSelect.PosBase
    val chunks = charChunks(df, idCol, textCol, k, chunkChars)
      .localCheckpoint(true)
    val rep = chunkedAnchorSites(chunks, k, w).localCheckpoint(true)
    val kept = rep.join(
      rep.groupBy("hash").agg(count(lit(1)).as("occ"))
        .where(col("occ") <= maxOccFreq)
        .select("hash"),
      Seq("hash"))
    maxCandidatePairs.foreach { bound =>
      val est = kept.groupBy("hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"substringDupSpansChunked pre-flight: $est anchor candidate " +
          s"pairs under occurrence cap $maxOccFreq exceed " +
          s"maxCandidatePairs=$bound")
    }
    // offsets re-derive from ci (off = ci·stride); texts join per chunk
    val texts = chunks.select(col("id").as("doc"), col("ci"), col("t"))
    val left = kept.select(col("doc").as("doc_a"), col("ci").as("ci_a"),
      col("pos").as("pos_a"), col("hash"))
    val right = kept.select(col("doc").as("doc_b"), col("ci").as("ci_b"),
      col("pos").as("pos_b"), col("hash"))
    val stride = (chunkChars - (k - 1)).toLong
    left.join(right, Seq("hash"))
      .where(col("doc_a") < col("doc_b"))
      .join(texts.select(col("doc").as("doc_a"), col("ci").as("ci_a"),
        col("t").as("ta")), Seq("doc_a", "ci_a"))
      .join(texts.select(col("doc").as("doc_b"), col("ci").as("ci_b"),
        col("t").as("tb")), Seq("doc_b", "ci_b"))
      .select(
        col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("ci_a"), col("ci_b"),
        call_function("common_extend",
          col("ta"), col("pos_a"), col("tb"), col("pos_b"), lit(k)).as("enc"))
      .where(col("enc") >= 0L)
      .select(
        col("id_a"), col("id_b"),
        (expr(s"enc div ${P * P}") + col("ci_a") * stride)
          .cast("long").as("start_a"),
        (pmod(expr(s"enc div $P"), lit(P)) + col("ci_b") * stride)
          .cast("long").as("start_b"),
        pmod(col("enc"), lit(P)).cast("long").as("len"))
      .distinct()
  }

  /** [[substringDup]] through the chunking front-end — the per-pair
    * longest-span report for corpora containing over-cap documents. */
  def substringDupChunked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 30,
      maxOccFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L),
      chunkChars: Int = DefaultChunkChars): DataFrame = {
    require(minLen >= w + k - 1,
      s"substringDupChunked: minLen=$minLen below the winnowing " +
        s"detection guarantee w+k-1=${w + k - 1}")
    substringDupSpansChunked(
      df, idCol, textCol, k, w, maxOccFreq, maxCandidatePairs, chunkChars)
      .groupBy("id_a", "id_b")
      .agg(
        max(struct(col("len"), col("start_a"), col("start_b"))).as("best"),
        count(lit(1)).as("n_spans"))
      .select(
        col("id_a"), col("id_b"),
        col("best.len").as("overlap_len"),
        col("best.start_a").as("start_a"),
        col("best.start_b").as("start_b"),
        col("n_spans"))
      .where(col("overlap_len") >= minLen)
  }

  /** [[selfRepeat]] through the chunking front-end — intra-document
    * repeats for documents of ANY length: global-position site pairs
    * (gpos₁ < gpos₂, per-(doc,hash) site cap on the deduplicated global
    * sites), each side extended on its OWN chunk's text (the two sites
    * may live in different chunks of the same document — `common_extend`
    * takes two texts), offsets remapped to document coordinates. With
    * every document under `chunkChars` the output is exactly
    * [[selfRepeat]]'s (parity-tested). */
  def selfRepeatChunked(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      minLen: Int = 20,
      maxSiteFreq: Int = DefaultHotFingerprintCap,
      maxCandidatePairs: Option[Long] = Some(2000000000L),
      chunkChars: Int = DefaultChunkChars): DataFrame = {
    require(minLen >= w + k - 1,
      s"selfRepeatChunked: minLen=$minLen below the winnowing detection " +
        s"guarantee w+k-1=${w + k - 1}")
    graft.functions.CommonExtend.register(df.sparkSession)
    val P = graft.functions.WinnowSelect.PosBase
    val chunks = charChunks(df, idCol, textCol, k, chunkChars)
      .localCheckpoint(true)
    val rep = chunkedAnchorSites(chunks, k, w).localCheckpoint(true)
    val kept = rep.join(
      rep.groupBy("doc", "hash").agg(count(lit(1)).as("occ"))
        .where(col("occ") <= maxSiteFreq)
        .select("doc", "hash"),
      Seq("doc", "hash"))
    maxCandidatePairs.foreach { bound =>
      val est = kept.groupBy("doc", "hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"selfRepeatChunked pre-flight: $est intra-document candidate " +
          s"pairs under site cap $maxSiteFreq exceed " +
          s"maxCandidatePairs=$bound")
    }
    val stride = (chunkChars - (k - 1)).toLong
    val ext = kept.select(col("doc"), col("hash"), col("gpos").as("g1"),
      col("ci").as("ci1"), col("pos").as("p1"))
      .join(kept.select(col("doc"), col("hash"), col("gpos").as("g2"),
        col("ci").as("ci2"), col("pos").as("p2")),
        Seq("doc", "hash"))
      .where(col("g1") < col("g2"))
      .join(chunks.select(col("id").as("doc"), col("ci").as("ci1"),
        col("t").as("t1")), Seq("doc", "ci1"))
      .join(chunks.select(col("id").as("doc"), col("ci").as("ci2"),
        col("t").as("t2")), Seq("doc", "ci2"))
      .select(
        col("doc"), col("ci1"), col("ci2"),
        call_function("common_extend",
          col("t1"), col("p1"), col("t2"), col("p2"), lit(k)).as("enc"))
      .where(col("enc") >= 0L)
      .select(
        col("doc"),
        (expr(s"enc div ${P * P}") + col("ci1") * stride)
          .cast("long").as("s1"),
        (pmod(expr(s"enc div $P"), lit(P)) + col("ci2") * stride)
          .cast("long").as("s2"),
        pmod(col("enc"), lit(P)).cast("long").as("len"))
      .where(col("s1") =!= col("s2"))
      .distinct()
    ext
      .groupBy("doc")
      .agg(
        max(struct(col("len"), col("s1"), col("s2"))).as("best"),
        count(lit(1)).as("n_repeat_spans"))
      .select(
        col("doc").as(idCol),
        col("best.len").as("repeat_len"),
        col("best.s1").as("start_1"),
        col("best.s2").as("start_2"),
        col("n_repeat_spans"))
      .where(col("repeat_len") >= minLen)
  }
}
