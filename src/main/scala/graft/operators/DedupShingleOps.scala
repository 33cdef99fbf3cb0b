package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — n-gram shingle family: Jaccard, survival, containment, novelty, contamination
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupShingleOps { this: Dedup.type =>

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
  private[graft] def shingleSizes(sh: DataFrame): DataFrame =
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
  private[graft] def verifiedJaccard(
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
    // localCheckpoint (r16): the shingle relation has TWO independent
    // consumers downstream (the size rollup and the shared-shingle
    // self-join — the join's own two branches already share one exchange
    // via ReuseExchange) — materializing it runs tokenize+shingle once
    // per call instead of once per consumer. Same relation, same values;
    // the staged-relation entry (shingleFamilyRollup) keeps feeding
    // ngramJaccardFrom its own checkpoint directly.
    ngramJaccardFrom(
      shingles(df, idCol, textCol, n).localCheckpoint(true),
      threshold, maxDocFreq)

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
}
