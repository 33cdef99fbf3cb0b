package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — exact-substring spans: duplicate/contamination/self-repeat + chunked variants
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupSubstringOps { this: Dedup.type =>

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
  private[graft] def cutIntervals(
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

  /** RAW chunked anchor sites with GLOBAL positions — MAP-ONLY since r17:
    * the former shape joined `chunks` back in to fetch `off` (a full
    * shuffle of the fingerprint relation), but `off = ci·stride` is pure
    * per-row arithmetic; and it collapsed the overlap region's double
    * detections in a dedicated `groupBy(doc, hash, gpos)` exchange, but
    * both consumers immediately re-shuffle by their occurrence-cap key —
    * the dedup now rides THAT window's exchange instead (first row per
    * gpos under `(…, gpos, ci, pos)` order ≡ the old `min(struct(ci,
    * pos))` representative). Two corpus-sized exchanges gone per caller. */
  private[graft] def chunkedAnchorSites(
      chunks: DataFrame, k: Int, w: Int, chunkChars: Int): DataFrame = {
    val stride = (chunkChars - (k - 1)).toLong
    val fp = winnowFingerprints(
      chunks.select(struct(col("id"), col("ci")).as("cid"), col("t")),
      "cid", "t", k, w)
    fp.select(
      col("id.id").as("doc"), col("hash"),
      (col("pos") + col("id.ci") * stride).as("gpos"),
      col("id.ci").as("ci"), col("pos"))
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
    val raw = chunkedAnchorSites(chunks, k, w, chunkChars)
    // ONE hash-keyed exchange (r17) carries what used to take five
    // corpus-sized ones (off-join, gpos-dedup groupBy, occ groupBy, occ
    // join-back, candidate self-join): within a `hash` window sorted by
    // (doc, gpos, ci, pos), the first row of each (doc, gpos) tie-group
    // IS the old min(ci, pos) overlap representative; the count of those
    // firsts is the old deduped occurrence count; and the surviving
    // ≤`maxOccFreq` site arrays generate the doc_a < doc_b pairs IN
    // PLACE (array comprehension over ≤cap elements — bounded, tiny).
    // Sites of occ = 1 hashes are dropped early: they can produce no
    // pair and contribute 0 to the pre-flight estimate.
    val wd = Window.partitionBy("hash")
      .orderBy("doc", "gpos", "ci", "pos")
    val wAll = wd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val lagDoc = lag(col("doc"), 1).over(wd)
    val lagG = lag(col("gpos"), 1).over(wd)
    val isFirst = lagDoc.isNull || lagDoc =!= col("doc") ||
      lagG =!= col("gpos")
    val sites = raw
      .withColumn("fst", isFirst)
      .withColumn("occ",
        sum(when(col("fst"), 1L).otherwise(0L)).over(wAll))
      .where(col("fst") && col("occ") >= 2L && col("occ") <= maxOccFreq)
      .select("hash", "doc", "gpos", "ci", "pos")
      .localCheckpoint(true)
    maxCandidatePairs.foreach { bound =>
      val est = sites.groupBy("hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"substringDupSpansChunked pre-flight: $est anchor candidate " +
          s"pairs under occurrence cap $maxOccFreq exceed " +
          s"maxCandidatePairs=$bound")
    }
    // pair generation by codegen'd self-join — but over the FILTERED
    // site relation (occ ≥ 2, ≤ cap): the former shape joined the full
    // 10×-bigger uncapped relation (an interpreted array-comprehension
    // variant was measured here and rejected: AQE coalesces the tiny
    // exchange to one partition and 200k lambda evaluations serialize
    // in a single 1.2 s task). Then ONE row per (doc_a, ci_a, doc_b,
    // ci_b) chunk pair through the text joins — the chunk texts never
    // ride the candidate relation (guide §8: move heavy bytes once,
    // decide on metadata).
    val pairs = sites
      .select(col("hash"), col("doc").as("doc_a"), col("ci").as("ci_a"),
        col("pos").as("pos_a"))
      .join(sites.select(col("hash"), col("doc").as("doc_b"),
        col("ci").as("ci_b"), col("pos").as("pos_b")), Seq("hash"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "ci_a", "pos_a", "doc_b", "ci_b", "pos_b")
    val byChunkPair = pairs
      .groupBy("doc_a", "ci_a", "doc_b", "ci_b")
      .agg(collect_list(struct(col("pos_a"), col("pos_b"))).as("ps"))
    val texts = chunks.select(col("id").as("doc"), col("ci"), col("t"))
    val stride = (chunkChars - (k - 1)).toLong
    byChunkPair
      .join(texts.select(col("doc").as("doc_a"), col("ci").as("ci_a"),
        col("t").as("ta")), Seq("doc_a", "ci_a"))
      .join(texts.select(col("doc").as("doc_b"), col("ci").as("ci_b"),
        col("t").as("tb")), Seq("doc_b", "ci_b"))
      .select(col("doc_a"), col("doc_b"), col("ci_a"), col("ci_b"),
        col("ta"), col("tb"), explode(col("ps")).as("p"))
      .select(
        col("doc_a").as("id_a"), col("doc_b").as("id_b"),
        col("ci_a"), col("ci_b"),
        call_function("common_extend",
          col("ta"), col("p.pos_a"), col("tb"), col("p.pos_b"), lit(k))
          .as("enc"))
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
    val raw = chunkedAnchorSites(chunks, k, w, chunkChars)
    // ONE (doc, hash)-keyed exchange (r17) replacing five corpus-sized
    // ones — the substringDupSpansChunked recipe with the intra-document
    // key: overlap dedup (first row per gpos under (gpos, ci, pos)
    // order), deduped site count, site cap, and g1 < g2 pair generation
    // from the surviving ≤`maxSiteFreq` arrays, all on one shuffle.
    val wd = Window.partitionBy("doc", "hash")
      .orderBy("gpos", "ci", "pos")
    val wAll = wd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val lagG = lag(col("gpos"), 1).over(wd)
    val sites = raw
      .withColumn("fst", lagG.isNull || lagG =!= col("gpos"))
      .withColumn("occ",
        sum(when(col("fst"), 1L).otherwise(0L)).over(wAll))
      .where(col("fst") && col("occ") >= 2L && col("occ") <= maxSiteFreq)
      .select("doc", "hash", "gpos", "ci", "pos")
      .localCheckpoint(true)
    maxCandidatePairs.foreach { bound =>
      val est = sites.groupBy("doc", "hash").agg(count(lit(1)).as("f"))
        .agg(coalesce(
          sum(col("f") * (col("f") - 1L) / lit(2L)), lit(0L)).cast("long"))
        .head().getLong(0)
      require(est <= bound,
        s"selfRepeatChunked pre-flight: $est intra-document candidate " +
          s"pairs under site cap $maxSiteFreq exceed " +
          s"maxCandidatePairs=$bound")
    }
    val stride = (chunkChars - (k - 1)).toLong
    // pairs by codegen'd self-join over the FILTERED sites (the
    // substringDupSpansChunked note: an in-array comprehension was
    // measured and rejected — AQE coalesces the tiny exchange and the
    // interpreted lambdas serialize in one task), then one row per
    // (doc, ci1, ci2) chunk pair through the text joins (guide §8:
    // texts never ride the candidate relation).
    val pairs = sites
      .select(col("doc"), col("hash"), col("gpos").as("g1"),
        col("ci").as("ci1"), col("pos").as("p1"))
      .join(sites.select(col("doc"), col("hash"), col("gpos").as("g2"),
        col("ci").as("ci2"), col("pos").as("p2")), Seq("doc", "hash"))
      .where(col("g1") < col("g2"))
      .select(col("doc"), col("ci1"), col("p1"), col("ci2"), col("p2"))
    val byChunkPair = pairs.groupBy("doc", "ci1", "ci2")
      .agg(collect_list(struct(col("p1"), col("p2"))).as("ps"))
    val texts = chunks.select(col("id").as("doc"), col("ci"), col("t"))
    val ext = byChunkPair
      .join(texts.select(col("doc"), col("ci").as("ci1"),
        col("t").as("t1")), Seq("doc", "ci1"))
      .join(texts.select(col("doc"), col("ci").as("ci2"),
        col("t").as("t2")), Seq("doc", "ci2"))
      .select(col("doc"), col("ci1"), col("ci2"), col("t1"), col("t2"),
        explode(col("ps")).as("p"))
      .select(
        col("doc"), col("ci1"), col("ci2"),
        call_function("common_extend",
          col("t1"), col("p.p1"), col("t2"), col("p.p2"), lit(k)).as("enc"))
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
