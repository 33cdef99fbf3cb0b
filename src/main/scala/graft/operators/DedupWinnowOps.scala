package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — winnowing fingerprints and fingerprint-banded near-dup
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupWinnowOps { this: Dedup.type =>

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
}
