package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level lexical growth statistics (E71).
  *
  * Heaps'-law vocabulary growth: how many DISTINCT whitespace tokens the
  * corpus has accumulated after each successive slice of documents, next
  * to the cumulative token and document counts. The vocab-vs-tokens curve
  * is the standard diagnostic for corpus breadth (a flattening curve means
  * new data is re-treading old vocabulary — more of it buys a model
  * little) and for sizing tokenizer vocabularies before training one.
  *
  * The document axis is cut into `buckets` equal id ranges:
  * `bucket(id) = (id * buckets) div (max_id + 1)`, the same integer
  * algebra in both engines. Each token is attributed to the bucket of its
  * FIRST-appearance document, so per-bucket new-vocab counts sum to the
  * cumulative curve.
  *
  * Scale shape: one exploded-token shuffle (groupBy token, map-side
  * combined — the unavoidable global distinct), collapsing directly to
  * per-bucket counts; token/document totals never explode (map-side
  * `size(split(...))` + a `buckets`-row aggregation); the cumulative
  * window runs over `buckets` rows on one partition — metadata-sized.
  */
object CorpusStats {

  /** Cumulative (bucket, docs, tokens, vocab) rows, one per id-range
    * bucket, `bucket` in [0, buckets). Null text contributes the document
    * count only. */
  def vocabGrowth(
      df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = df.sparkSession
    val maxRow = df.agg(max(col(idCol))).head()
    val empty = maxRow.isNullAt(0)
    // degenerate empty corpus: an all-zero grid keeps the contract total
    val m = if (empty) 1L else maxRow.getLong(0) + 1L

    def bucketOf(name: String): Column =
      expr(s"(`$name` * $buckets) div CAST($m AS BIGINT)")

    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    val newVocab = toks.groupBy("w").agg(min(col(idCol)).as("fd"))
      .groupBy(bucketOf("fd").as("bucket")).agg(count(lit(1)).as("nv"))
    val tokCounts = df
      .select(col(idCol),
        when(col(textCol).isNull, lit(0))
          .otherwise(size(split(col(textCol), " "))).as("cnt"))
      .groupBy(bucketOf(idCol).as("bucket")).agg(sum(col("cnt")).as("nt"))
    val docCounts = df
      .groupBy(bucketOf(idCol).as("bucket")).agg(count(lit(1)).as("nd"))

    val grid = spark.range(buckets).select(col("id").as("bucket"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(docCounts, Seq("bucket"), "left")
      .join(tokCounts, Seq("bucket"), "left")
      .join(newVocab, Seq("bucket"), "left")
      .select(
        col("bucket"),
        sum(coalesce(col("nd"), lit(0L))).over(w).as("docs"),
        sum(coalesce(col("nt"), lit(0L))).over(w).as("tokens"),
        sum(coalesce(col("nv"), lit(0L))).over(w).as("vocab"))
  }

  private val Dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)

  /** Per-domain curation report card (E74) — the RefinedWeb-style "which
    * sources earn their place" table: per domain, document and token
    * volume, language spread, mean composite quality (E9's score), and
    * how many of its documents are exact duplicates of ANY corpus
    * document (cross-domain mirrors included — the usual culprit).
    *
    * Scale shape: the duplicate side never shuffles text — documents
    * collapse map-side to (content-hash, domain) counts, one hash-keyed
    * shuffle of that distinct relation computes corpus frequencies, and
    * the per-domain dup counts come back domain-keyed (metadata-sized);
    * the volume/quality side is ONE map-side-combined groupBy(domain).
    * Mean quality follows the decSum contract (per-row terms rounded to
    * 12 dp, DECIMAL(38,12) sum) so it is partition-order independent.
    *
    * Null text hashes to a sentinel (null-text docs deduplicate with each
    * other, not with empty-text docs) and contributes zero tokens and a
    * null quality (excluded from the mean, like the oracle's CASE). */
  def domainReport(
      df: DataFrame, domainCol: String, langCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    val base = df.select(
      col(domainCol).as("domain"),
      col(langCol).as("lang"),
      when(text.isNull, lit("__null__")).otherwise(sha2(text, 256)).as("h"),
      when(text.isNull, lit(0L))
        .otherwise(graft.functions.TextFunctions.wsTokenCount(text)).as("nt"),
      graft.functions.TextFunctions.qualityScore(text).as("q"))
    val hd = base.groupBy("h", "domain").agg(count(lit(1)).as("c"))
    val hf = hd.groupBy("h").agg(sum(col("c")).as("f"))
    val dup = hd.join(hf, Seq("h"))
      .groupBy("domain")
      .agg(coalesce(sum(when(col("f") > 1, col("c"))), lit(0L)).as("dup_docs"))
    base.groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        round(
          sum(round(col("q"), 12).cast(Dec12)).cast("double") / count(col("q")),
          6).as("mean_quality"))
      .join(dup, Seq("domain"), "left")
      .select(
        col("domain"), col("n_docs"), col("n_tokens"), col("n_langs"),
        col("mean_quality"), coalesce(col("dup_docs"), lit(0L)).as("dup_docs"))
  }

  /** Token-distribution divergence between dataset splits (E75) — the
    * "did my split skew the data" diagnostic run after E21/E67: for each
    * split pair, Jensen-Shannon divergence between their unigram
    * distributions (symmetric, bounded by ln 2, defined without epsilon
    * hacks because absent tokens contribute exactly 0 to their own side)
    * plus vocabulary overlap counts. A training/validation JSD spike
    * means the validation loss measures a different distribution.
    *
    * Scale shape: ONE exploded-token shuffle collapsing to the per-token
    * split-count pivot (map-side combined; vocab-sized, never the
    * corpus); the totals row and each pair's divergence are single-row
    * reductions over that relation — the pivot's shuffle stage is reused
    * (skipped) by the later jobs. Per-token JSD terms are rounded to
    * 12 dp and summed as DECIMAL(38,12) (the E60 PSI contract) so the
    * result is partition-order independent and oracle-exact. */
  def splitDivergence(
      df: DataFrame, idCol: String, textCol: String,
      splits: Seq[(String, Double)], salt: String = "graft"): DataFrame = {
    require(splits.size >= 2, "need at least two splits to compare")
    val spark = df.sparkSession
    import spark.implicits._
    val names = splits.map(_._1)
    val tok = Sampling.hashSplit(df, idCol, splits, salt)
      .where(col(textCol).isNotNull)
      .select(col("split"),
        explode(graft.functions.TextFunctions.wsTokens(lower(col(textCol))))
          .as("token"))
    val cntAggs = names.map(n =>
      count(when(col("split") === n, lit(1))).as(s"c_$n"))
    val cnt = tok.groupBy("token").agg(cntAggs.head, cntAggs.tail: _*)
    val totAggs = names.flatMap(n => Seq(
      coalesce(sum(col(s"c_$n")), lit(0L)).as(s"t_$n"),
      count(when(col(s"c_$n") > 0, lit(1))).as(s"v_$n")))
    val tot = cnt.agg(totAggs.head, totAggs.tail: _*).head()

    val pairs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    // all pair divergences in ONE aggregation over the pivot relation
    val pairAggs: Seq[Column] = pairs.flatMap { case (a, b) =>
      val ta = tot.getAs[Long](s"t_$a")
      val tb = tot.getAs[Long](s"t_$b")
      // guarded shares: a token absent from a split contributes 0 to that
      // split's side; an EMPTY split would otherwise make 0/0 = NaN terms
      val p = when(lit(ta) > 0, col(s"c_$a") * lit(1.0) / lit(ta.toDouble))
        .otherwise(lit(0.0))
      val q = when(lit(tb) > 0, col(s"c_$b") * lit(1.0) / lit(tb.toDouble))
        .otherwise(lit(0.0))
      val m = (p + q) / lit(2.0)
      val term =
        lit(0.5) * when(col(s"c_$a") > 0, p * log(p / m)).otherwise(lit(0.0)) +
          lit(0.5) * when(col(s"c_$b") > 0, q * log(q / m)).otherwise(lit(0.0))
      Seq(
        // coalesce: an empty pivot (no tokens at all) sums to null
        round(coalesce(sum(round(term, 12).cast(Dec12)).cast("double"),
          lit(0.0)), 6).as(s"jsd_${a}_$b"),
        count(when(col(s"c_$a") > 0 && col(s"c_$b") > 0, lit(1)))
          .as(s"shared_${a}_$b"))
    }
    val pr = cnt.agg(pairAggs.head, pairAggs.tail: _*).head()

    pairs.map { case (a, b) =>
      (a, b,
        tot.getAs[Long](s"t_$a"), tot.getAs[Long](s"t_$b"),
        tot.getAs[Long](s"v_$a"), tot.getAs[Long](s"v_$b"),
        pr.getAs[Long](s"shared_${a}_$b"), pr.getAs[Double](s"jsd_${a}_$b"))
    }.toDF("split_a", "split_b", "tokens_a", "tokens_b",
      "vocab_a", "vocab_b", "vocab_shared", "jsd")
  }

  /** Zipf rank-frequency fit (E76) — the companion to E71's Heaps curve:
    * OLS fit of ln(freq) against ln(rank) over the top-`topK` vocabulary.
    * Natural text sits near slope −1; a much flatter slope flags
    * template/machine-generated corpora, a much steeper one a degenerate
    * vocabulary — a single-row corpus health check.
    *
    * Scale shape: token frequencies are the one map-side-combined
    * shuffle; the top-k cut is `TakeOrderedAndProject` (distributed, no
    * global sort), ranks come from a window over just those k rows, and
    * the OLS moments follow the decSum contract (per-row terms rounded
    * to 12 dp, DECIMAL(38,12) sums) — order-independent and
    * oracle-exact. Rank ties break (freq DESC, token ASC), the E22 rule. */
  def zipfFit(
      df: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"need at least 2 ranks to fit, got $topK")
    val freqs = df
      .select(explode(
        graft.functions.TextFunctions.wsTokens(lower(col(textCol))))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      // the rank window below is bounded STRUCTURALLY, not by contract:
      // orderBy+limit plans as TakeOrderedAndProject (per-partition
      // top-K + a K-row driver merge, never a global sort), so the
      // window input is ≤ topK rows at any corpus size — no WindowGuard
      // needed; PlanAuditSpec pins the TakeOrdered shape
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
    val ranked = freqs.select(
      row_number().over(
        Window.orderBy(col("freq").desc, col("token").asc)).as("rank"),
      col("freq"))
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    def dsum(c: Column, name: String): Column =
      sum(round(c, 12).cast(Dec12)).cast("double").as(name)
    ranked
      .agg(
        count(lit(1)).as("n"),
        dsum(x, "sx"), dsum(y, "sy"), dsum(x * y, "sxy"),
        dsum(x * x, "sxx"), dsum(y * y, "syy"))
      .select(
        col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("n"), 6).as("intercept"),
        round(
          ((col("n") * col("sxy") - col("sx") * col("sy")) *
            (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
  }

  /** Dedup-weighted effective corpus size (E89) — the "how much data do
    * I actually have" number: raw token volume, the token volume after
    * exact-duplicate collapse (equivalently: each document weighted by
    * 1/cluster-size), and the duplicated-token share. The single scalar
    * that says whether a 100 TB crawl is 90 TB of data or 9 TB of data
    * mirrored ten times.
    *
    * Scale shape: documents collapse MAP-SIDE to (content-hash, token
    * count) partial counts — the E74 no-text-shuffle trick; one
    * hash-keyed shuffle of that compact relation, then a single-row
    * reduction. Null text takes a sentinel hash (its own cluster) and
    * zero tokens, the E74 contract. */
  def effectiveTokens(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val text = col(textCol)
    val base = df.select(
      when(text.isNull, lit("__null__")).otherwise(sha2(text, 256)).as("h"),
      when(text.isNull, lit(0L))
        .otherwise(TextFunctions.wsTokenCount(text)).as("nt"))
    val clusters = base.groupBy("h")
      .agg(count(lit(1)).as("c"), min("nt").as("nt"))
    clusters.agg(
      sum("c").cast("long").as("n_docs"),
      count(lit(1)).as("n_unique_docs"),
      sum(col("nt") * col("c")).cast("long").as("raw_tokens"),
      sum("nt").cast("long").as("effective_tokens"))
      .select(
        col("n_docs"), col("n_unique_docs"), col("raw_tokens"),
        col("effective_tokens"),
        when(col("raw_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) -
            col("effective_tokens").cast("double") /
              col("raw_tokens").cast("double"), 6)).as("dup_token_ratio"))
  }

  /** Two-dimensional corpus rollup (E90) — counts and token volume by
    * (dimA, dimB) with ALL subtotal combinations in one pass: Spark's
    * CUBE runs as a single Expand + map-side-combined hash aggregation
    * (4 grouping sets from one scan — per-(lang,source), per-lang,
    * per-source, grand total), the multi-report answer that would
    * otherwise cost four separate jobs. `grouping()` flags disambiguate
    * a REAL null dimension value from a subtotal row — the classic
    * rollup-reading bug, pinned here as output columns. */
  def corpusCube(
      df: DataFrame, dimA: String, dimB: String,
      textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val text = col(textCol)
    df.select(
        col(dimA), col(dimB),
        when(text.isNull, lit(0L))
          .otherwise(TextFunctions.wsTokenCount(text)).as("nt"))
      .cube(col(dimA), col(dimB))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("nt").cast("long").as("n_tokens"),
        grouping(col(dimA)).cast("long").as(s"g_$dimA"),
        grouping(col(dimB)).cast("long").as(s"g_$dimB"))
  }

  /** Gini concentration of corpus volume (E106) — "what share of my
    * tokens do the top sources hold": the exact Gini coefficient of
    * per-group token totals (0 = perfectly even, →1 = one source is the
    * corpus). The one-number companion to E74's per-domain report card —
    * a crawl whose Gini drifts up is quietly collapsing onto a few
    * domains.
    *
    * G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over the ASCENDING-sorted group
    * totals — swapping equal values leaves Σ i·xᵢ unchanged, so the
    * arbitrary tie order inside the row_number window cannot change the
    * result. Shape: one map-side-combined groupBy(group) to totals, a
    * window over the GROUP-sized relation (documented 100 TB path for
    * extreme group counts: the E29 two-phase prefix sum), integer sums
    * (token counts) to the final double division. */
  def giniConcentration(
      df: DataFrame, groupCol: String, textCol: String,
      maxGroups: Long = WindowGuard.MaxWindowCells): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions
    val text = col(textCol)
    val totals = df
      .select(col(groupCol).as("g"),
        when(text.isNull, lit(0L))
          .otherwise(TextFunctions.wsTokenCount(text)).as("nt"))
      .groupBy("g").agg(sum("nt").as("x"))
    val i = row_number().over(Window.orderBy(col("x").asc, col("g").asc))
    // group-sized BY CONTRACT (domains/languages); ENFORCED
    // (WindowGuard): a key-like group column would silently single-task
    // the rank window — beyond the bound, route through the E29
    // two-phase prefix sum documented above
    val nGroups = count(lit(1)).over(Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing))
    totals
      .select(col("x"),
        WindowGuard.guarded((i.cast("long") * col("x")), nGroups,
          maxGroups, "CorpusStats.giniConcentration").as("ix"))
      .agg(
        count(lit(1)).as("n_groups"),
        sum("x").cast("long").as("total_tokens"),
        sum("ix").cast("long").as("six"))
      .select(
        col("n_groups"), col("total_tokens"),
        when(col("total_tokens") === 0 || col("n_groups") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (lit(2.0) * col("six").cast("double")) /
              (col("n_groups").cast("double") * col("total_tokens").cast("double")) -
              (col("n_groups") + lit(1)).cast("double") /
                col("n_groups").cast("double"), 6)).as("gini"))
  }

  /** Per-document vocabulary coverage (E84) — the tokenizer-coverage
    * curation metric: against the corpus top-k vocabulary (the fixed
    * vocab a tokenizer or embedding table would ship), each document's
    * token count, out-of-vocabulary count, and OOV rate. High-OOV
    * documents are the boilerplate/code/wrong-language rows a text
    * pipeline wants flagged before tokenization spends budget on them.
    *
    * Scale shape: the vocabulary is ONE map-side-combined frequency agg
    * cut by `TakeOrderedAndProject` under the (freq DESC, token ASC)
    * total order (the vocabTopK tie-break — deterministic at any
    * parallelism); k rows then BROADCAST to a left join against the
    * exploded token stream, so the corpus-sized side never shuffles for
    * the membership test; the per-doc reduction is one keyed agg.
    * Zero-token documents are omitted (nothing to cover), like the LM
    * scorers. */
  def vocabCoverage(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "vocabulary size must be positive")
    import graft.functions.TextFunctions
    val tok = df.select(
      col(idCol).as("id"),
      explode(TextFunctions.wsTokens(lower(col(textCol)))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("t").asc).limit(k)
      .select(col("t"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(
        col("id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
  }

  /** Tokenizer-fertility report (E125) — chars/bytes per token by
    * language: the compute-cost planner's table (fertility decides how
    * many MODEL tokens a byte of each language's data becomes — CJK and
    * under-represented scripts fragment worst; a corpus's mixture cost
    * is priced from exactly this rollup) and the standard diagnostic for
    * tokenizer/vocabulary fit (Scao et al. 2022, BLOOM §3.2 report it
    * per language for the same reason).
    *
    * Two tokenizer views side by side: whitespace tokens (corpus-stats
    * baseline) and the BPE-ish pre-tokenizer (letter/digit runs +
    * symbols — the GPT-2-style coarse split the model-facing count
    * follows). Ratios are single late double divisions over exact
    * integer sums — decimal-free and engine-portable.
    *
    * Scale shape: ONE map-side-combined groupBy(lang) scan; all counts
    * are per-row expressions feeding long sums — no shuffle carries
    * tokens, no second pass. */
  def tokenizerFertility(
      df: DataFrame, langCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    df
      .groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.wsTokenCount(col(textCol))).as("n_ws_tokens"),
        sum(TextFunctions.bpeishTokenCount(col(textCol))).as("n_bpeish_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum(octet_length(col(textCol)).cast("long")).as("n_bytes"))
      .select(
        col("lang"), col("n_docs"), col("n_ws_tokens"),
        col("n_bpeish_tokens"), col("n_chars"), col("n_bytes"),
        round(col("n_chars").cast("double") /
          col("n_bpeish_tokens").cast("double"), 6).as("chars_per_token"),
        round(col("n_bytes").cast("double") /
          col("n_bpeish_tokens").cast("double"), 6).as("bytes_per_token"),
        round(col("n_bpeish_tokens").cast("double") /
          col("n_ws_tokens").cast("double"), 6).as("fertility_vs_ws"))
  }

  /** Character-class profile by language (E146) — the encoding/quality
    * face of the fertility report (E125 prices tokens; this shows WHAT
    * the bytes are): per language, exact counts and ratios of ASCII
    * letters / digits / whitespace / sentence punctuation / other
    * (where "other" is every non-ASCII-class character — the CJK,
    * emoji, control-char and mojibake stratum; an `other_ratio` spike
    * inside a Latin-script language IS the encoding-corruption alarm).
    * One map-side-combined groupBy(lang) scan of per-row `regexp_count`
    * expressions — exact integer sums, late double ratios. */
  /** Per-document character entropy (E179) — the classic repetitive-
    * garbage gate (encoding noise, keyboard mashing, `aaaa…` filler all
    * sit at pathological char entropy; Gopher's repetition filters are
    * the token-level cousin this sharpens to characters): Shannon
    * entropy of each document's character distribution in nats,
    * `H = −Σ (c/n)·ln(c/n)`, plus the raw counts a threshold rule
    * needs. Empty documents are omitted (no distribution).
    *
    * Scale shape: one explode to `(doc, char)` — shuffle keyed on the
    * (doc id, single char) pair with map-side combine, linear in corpus
    * chars, no window, no payloads. Determinism: per-char terms
    * `ROUND((c/n)·ln(c/n), 12)` are DECIMAL(38,12)-summed (order-free),
    * entropy rounded to 6 dp. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val dec12 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12)
    val chars = df
      .where(coalesce(length(col(textCol)), lit(0)) > 0)
      .select(col(idCol).as("id"),
        explode(split(col(textCol), "(?!$)")).as("ch"))
    val counts = chars.groupBy("id", "ch").agg(count(lit(1)).as("c"))
    val term = round(
      (col("c").cast("double") / col("n").cast("double")) *
        log(col("c").cast("double") / col("n").cast("double")), 12)
      .cast(dec12)
    counts
      .join(counts.groupBy("id").agg(sum(col("c")).as("n")), Seq("id"))
      .select(col("id"), col("n"), col("ch"), term.as("t"))
      .groupBy("id")
      .agg(
        first(col("n")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        round(-sum(col("t")).cast("double"), 6).as("entropy"))
      .select(col("id").as(idCol), col("n_chars"),
        col("n_distinct_chars"), col("entropy"))
  }

  def charClassStats(
      df: DataFrame, langCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val t = col(textCol)
    def cnt(pattern: String): Column =
      coalesce(regexp_count(t, lit(pattern)).cast("long"), lit(0L))
    df
      .groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(length(t).cast("long"), lit(0L))).as("n_chars"),
        sum(cnt("[A-Za-z]")).as("n_alpha"),
        sum(cnt("[0-9]")).as("n_digit"),
        sum(cnt("\\s")).as("n_space"),
        sum(cnt(TextFunctions.PunctPattern)).as("n_punct"))
      .select(
        col("lang"), col("n_docs"), col("n_chars"), col("n_alpha"),
        col("n_digit"), col("n_space"), col("n_punct"),
        (col("n_chars") - col("n_alpha") - col("n_digit") -
          col("n_space") - col("n_punct")).as("n_other"),
        round(col("n_alpha").cast("double") / col("n_chars").cast("double"),
          6).as("alpha_ratio"),
        round((col("n_chars") - col("n_alpha") - col("n_digit") -
          col("n_space") - col("n_punct")).cast("double") /
          col("n_chars").cast("double"), 6).as("other_ratio"))
  }

  /** Declared-vs-detected language confusion matrix (E134) — the
    * metadata-trust audit: per (declared lang, detected lang) cell,
    * document count, share of the declared language's documents, and the
    * agreement flag. Scraped corpora routinely carry wrong language
    * tags; training mixtures priced off the DECLARED column (E40) are
    * silently wrong exactly where this matrix is off-diagonal. Detection
    * is E10's deterministic stopword-vote langId, so the matrix is
    * engine-portable ('und' = no evidence, its own column).
    *
    * Scale shape: one map-side language-ID pass (pure per-row column
    * expressions) collapsing to ≤langs² cells; the per-declared totals
    * come from a window over the CELLS relation. */
  def langAgreement(
      df: DataFrame, langCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val cells = df
      .groupBy(
        col(langCol).as("declared"),
        TextFunctions.langId(col(textCol)).as("detected"))
      .agg(count(lit(1)).as("n_docs"))
    cells
      .withColumn("n_declared",
        sum(col("n_docs")).over(Window.partitionBy(col("declared"))))
      .select(
        col("declared"), col("detected"), col("n_docs"),
        round(col("n_docs").cast("double") /
          col("n_declared").cast("double"), 6).as("share_of_declared"),
        (col("declared") === col("detected")).cast("int").as("is_match"))
  }

  /** Document-frequency stopword discovery (E123) — tokens ranked by the
    * share of DOCUMENTS containing them (df), not instance frequency
    * (E22's vocabTopK): a burst word in one document can top the
    * instance ranking while df stays honest — df ≥ ~40% of docs is the
    * classic data-driven stopword cut (the IDF=0 frontier BM25/TF-IDF
    * weighting implicitly discards), and the list is the corpus-specific
    * boilerplate fingerprint (every crawl has its own "subscribe",
    * "cookies", "rights reserved" stratum).
    *
    * Scale shape: per-doc token sets via `array_distinct` BEFORE the
    * explode — the exploded relation carries each (doc, token) once, so
    * the groupBy(token) shuffle is bounded by Σ|doc vocabularies|, not
    * token instances; the doc total joins back as a broadcast scalar;
    * top-k via the usual TakeOrderedAndProject frontier (df DESC, token
    * ASC). */
  def docFrequency(
      df: DataFrame, textCol: String, k: Int,
      stopwordDf: Double = 0.4): DataFrame = {
    import graft.functions.TextFunctions
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    df
      .select(explode(array_distinct(
        TextFunctions.wsTokens(lower(col(textCol))))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(
        col("token"), col("df"),
        round(col("df").cast("double") / col("n_docs").cast("double"), 6)
          .as("df_ratio"),
        (round(col("df").cast("double") / col("n_docs").cast("double"), 6)
          >= stopwordDf).cast("int").as("is_stopword"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(k)
  }

  /** URL path templating (E167) — the structure-discovery pass a web
    * curation pipeline runs before any per-site rule is written: per
    * path DEPTH, segments with support ≥ `minSupport` stay literal,
    * everything else generalizes to `*`, and each URL collapses to its
    * template — /forum/thread/8812/page-3 becomes /forum/thread/x/x with
    * x the wildcard segment. The
    * template census (which shapes dominate a crawl, how much is
    * pagination/ID noise) is the input to dedup-by-template and
    * crawl-budget decisions (the URL-level analogue of E74's domain
    * caps; E53 normalizes single URLs, this profiles their population).
    *
    * Scale shape: one posexplode of per-URL segment arrays collapsing
    * map-side to ≤ distinct-(depth, segment) cells; the keep-set joins
    * back as a hash equi-join on (depth, segment); per-URL reassembly is
    * a collect_list bounded by the URL's own depth. No payload wider
    * than a path ever shuffles. Returns `(template, n_urls)`. */
  def pathTemplates(
      df: DataFrame, idCol: String, urlCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, "need a positive support threshold")
    val segs = df
      .select(col(idCol).as("id"), col(urlCol).as("u"))
      .where(col("u").isNotNull)
      .select(col("id"),
        posexplode(split(regexp_replace(col("u"), "^/", ""), "/"))
          .as(Seq("pos", "seg")))
    val keep = segs.groupBy("pos", "seg")
      .agg(count(lit(1)).as("c"))
      .where(col("c") >= minSupport)
      .select(col("pos"), col("seg"), lit(1).as("_k"))
    segs.join(keep, Seq("pos", "seg"), "left")
      .select(col("id"), col("pos"),
        when(col("_k").isNotNull, col("seg")).otherwise(lit("*")).as("g"))
      .groupBy("id")
      .agg(concat(lit("/"), concat_ws("/",
        transform(
          array_sort(collect_list(struct(col("pos"), col("g")))),
          s => s("g")))).as("template"))
      .groupBy("template")
      .agg(count(lit(1)).as("n_urls"))
  }

  /** Gopher quality-rule battery (E192) — the Rae et al. '21 heuristic
    * filter set (Table A1; reused near-verbatim by RefinedWeb and Dolma),
    * the rule battery a web-scale curation pass runs BEFORE any learned
    * filter: per document, the seven classic checks (word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio, bullet-line and
    * ellipsis-line fractions, alphabetic-word fraction, minimum stopword
    * hits) and the conjunctive `keep` verdict.
    *
    * Every cut is an INTEGER comparison (`3n ≤ Σlen ≤ 10n`,
    * `10·symbols ≤ n`, `10·bullets ≤ 9·lines`, `10·ellipsis ≤ 3·lines`,
    * `5·alpha ≥ 4·n`, `stop_hits ≥ 2`) — no float at any boundary, so
    * the verdict is engine-exact by construction; the 6-dp ratios are
    * readout only. Words are the engine-wide whitespace tokens; lines
    * split on `\n` keeping empties (both engines); alphabetic means
    * ASCII `[A-Za-z]` (documented narrowing — the multilingual extension
    * is a stop-set swap).
    *
    * Scale shape: ONE map-only pass — every metric is an array/regex
    * expression inside the scan projection; no shuffle at all until the
    * caller aggregates. The verdict relation feeds the E181-style
    * ids-only anti join or rides along a [[graft.operators.Curate]]
    * pipeline scan.
    *
    * Cites reference scope: heuristic document filters are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def gopherRules(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val w = TextFunctions.wsTokens(lower(col(textCol)))
    val lines = split(col(textCol), "\n")
    val staged = df.select(
      col(idCol),
      size(w).cast("long").as("n_words"),
      aggregate(transform(w, t => length(t).cast("long")),
        lit(0L), (a, x) => a + x).as("sum_word_len"),
      size(filter(w, t => t.rlike("[a-z]"))).cast("long").as("alpha_words"),
      TextFunctions.stopwordCount(w,
        TextFunctions.Stopwords.collectFirst { case ("en", s) => s }.get)
        .as("stop_hits"),
      regexp_count(col(textCol), lit("#|\\.\\.\\.|…"))
        .cast("long").as("n_symbols"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l =>
        l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
        .cast("long").as("bullet_lines"),
      size(filter(lines, l =>
        l.endsWith("...") || l.endsWith("…")))
        .cast("long").as("ellipsis_lines"))
    val n = col("n_words")
    val ruleExprs: Seq[(String, Column)] = Seq(
      "ok_word_count" -> (n >= 50 && n <= 100000),
      "ok_mean_word_len" -> (lit(3L) * n <= col("sum_word_len") &&
        col("sum_word_len") <= lit(10L) * n && n > 0),
      "ok_symbol_ratio" -> (lit(10L) * col("n_symbols") <= n && n > 0),
      "ok_bullet_lines" ->
        (lit(10L) * col("bullet_lines") <= lit(9L) * col("n_lines")),
      "ok_ellipsis_lines" ->
        (lit(10L) * col("ellipsis_lines") <= lit(3L) * col("n_lines")),
      "ok_alpha_words" ->
        (lit(5L) * col("alpha_words") >= lit(4L) * n && n > 0),
      "ok_stop_hits" -> (col("stop_hits") >= 2L))
    staged.select(
      (Seq(
        col(idCol), col("n_words"),
        when(n > 0, round(col("sum_word_len").cast("double") / n.cast("double"), 6))
          .as("mean_word_len"),
        when(n > 0, round(col("n_symbols").cast("double") / n.cast("double"), 6))
          .as("symbol_ratio"),
        round(col("bullet_lines").cast("double") / col("n_lines").cast("double"), 6)
          .as("bullet_line_frac"),
        round(col("ellipsis_lines").cast("double") / col("n_lines").cast("double"), 6)
          .as("ellipsis_line_frac"),
        when(n > 0, round(col("alpha_words").cast("double") / n.cast("double"), 6))
          .as("alpha_word_frac"),
        col("stop_hits")) ++
        ruleExprs.map { case (nm, c) => c.as(nm) } :+
        ruleExprs.map(_._2).reduce(_ && _).as("keep")): _*)
  }

  /** Deterministic paged-corpus view for the C4 battery's GATE keys —
    * the synthetic corpus is single-line punctuation-free word soup, on
    * which every line-level rule is vacuously false; this view re-shapes
    * each document into a page the rules have non-trivial support on
    * (production callers pass real pages straight to [[c4Rules]]):
    * 12-token lines, a terminal mark on a `(doc_id + line) % 3` schedule
    * (≈ 2/3 of lines end in `.`/`?`, the rest unterminated), a repeated
    * boilerplate footer line on a `(doc_id + line) % 7` schedule — or on
    * every SECOND line for the `doc_id % 13` slice, the boilerplate-farm
    * pages whose duplicate mass crosses E226's published cuts (real
    * pages repeat boilerplate; most are under the cut, some are not),
    * and three rare deterministic page tells — a brace line
    * (`doc_id % 23`), a "lorem ipsum" line (`% 29`) and a "javascript"
    * line (`% 31`) — so each page- and line-level rule fires on a known
    * slice. Pure string algebra over the whitespace tokens, identical
    * in DuckDB (the oracle's `pages` view). */
  def c4SynthPage(id: Column, text: Column): Column = {
    import graft.functions.TextFunctions
    val toks = TextFunctions.wsTokens(text)
    val nLines = greatest(
      floor((size(toks) + lit(11)) / lit(12)).cast("int"), lit(1))
    val lines = transform(sequence(lit(0), nLines - lit(1)), i =>
      when(
        (id % 13 === 0 && (id + i) % 2 === 1) ||
          (id % 13 =!= 0 && (id + i) % 7 === 1),
        lit("copyright footer all rights reserved worldwide."))
        .otherwise(concat(
          array_join(slice(toks, i * lit(12) + lit(1), lit(12)), " "),
          when((id + i) % 3 === 0, lit("."))
            .when((id + i) % 3 === 2, lit("?"))
            .otherwise(lit("")))))
    concat(
      array_join(lines, "\n"),
      when(id % 23 === 0, lit("\nint main() { return 0; }"))
        .otherwise(lit("")),
      when(id % 29 === 0,
        lit("\nlorem ipsum dolor sit amet consectetur adipiscing elit."))
        .otherwise(lit("")),
      when(id % 31 === 0,
        lit("\nplease enable javascript to view this page."))
        .otherwise(lit("")))
  }

  /** The C4 line-keep predicate (Raffel et al. '20 §2.2) over a single
    * line: ends in terminal punctuation (`.` `!` `?` `"`), carries ≥ 5
    * whitespace words, and does not mention "javascript" (the boiler-
    * plate tell) — shared by [[c4Rules]] (the per-document readout) and
    * [[c4FilterExecute]] (the rewrite executor) so the verdict and the
    * action can never disagree. */
  private def c4LineKeep(l: Column): Column = {
    import graft.functions.TextFunctions
    (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
      l.endsWith("\"")) &&
      size(TextFunctions.wsTokens(l)) >= 5 &&
      !lower(l).contains("javascript")
  }

  /** C4 cleaning-rule battery (E224) — the Raffel et al. '20 heuristic
    * set (the other canonical web-curation rulebook next to E192's
    * Gopher battery, and a LINE-level one where Gopher is document-
    * level): per document, the kept-line count under [[c4LineKeep]],
    * the sentence count of the kept text (terminal-punctuation marks —
    * C4's "at least 3 sentences" page cut), and the three page-level
    * tells (no "lorem ipsum", no `{`, which C4 uses to drop code pages)
    * with the conjunctive `keep` verdict.
    *
    * Every cut is an integer/boolean comparison (`n_sentences ≥ 3`,
    * substring containment) — no float at any boundary; the 6-dp
    * retained-line fraction is readout only. Case folds via `lower`
    * (ASCII — the corpus contract).
    *
    * Scale shape: ONE map-only pass — lines, per-line predicates and
    * sentence counts are array/regex expressions inside the scan
    * projection; no shuffle until the caller aggregates. The verdict
    * relation feeds the same ids-only joins as E192.
    *
    * Cites reference scope: heuristic document filters are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def c4Rules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, c4LineKeep(_))
    val keptText = array_join(kept, "\n")
    val staged = df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("kept_lines"),
      length(keptText).cast("long").as("kept_chars"),
      regexp_count(keptText, lit("[.!?]")).cast("long").as("n_sentences"),
      (!lower(col(textCol)).contains("lorem ipsum")).as("no_lorem"),
      (!col(textCol).contains("{")).as("no_brace"))
    staged.select(
      col(idCol), col("n_lines"), col("kept_lines"), col("kept_chars"),
      col("n_sentences"),
      when(col("n_lines") > 0,
        round(col("kept_lines").cast("double") /
          col("n_lines").cast("double"), 6)).as("retained_line_frac"),
      (col("n_sentences") >= 3L).as("ok_sentences"),
      col("no_lorem"), col("no_brace"),
      (col("n_sentences") >= 3L && col("no_lorem") && col("no_brace"))
        .as("keep"))
  }

  /** Duplicate-line statistics (E226) — the two MassiveText repetition
    * rows (Rae et al. '21 Table A1) the E192 battery and E138
    * repetition_metrics (token-level) do NOT cover, because the raw
    * corpus has no line structure: per document, the fraction of LINES
    * that are duplicates of an earlier line and the fraction of
    * CHARACTERS sitting in those duplicate lines (repeated navigation/
    * boilerplate is the classic web-page failure both catch), with the
    * published cuts — duplicate-line fraction ≤ 0.30, duplicate-line
    * character fraction ≤ 0.20 — as INTEGER comparisons
    * (`10·dup ≤ 3·n`, `5·dup_chars ≤ chars`); the 6-dp fractions are
    * readout only.
    *
    * Scale shape: ONE map-only pass — `array_distinct` inside the scan
    * projection does the per-document dedup (no explode, no shuffle);
    * the duplicate mass is `Σlen(lines) − Σlen(distinct lines)`, both
    * array folds in the same projection.
    *
    * Cites reference scope: heuristic document filters are absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def dupLineStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    def charSum(a: Column): Column =
      aggregate(transform(a, l => length(l).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val staged = df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(array_distinct(lines))).cast("long")
        .as("dup_lines"),
      charSum(lines).as("line_chars"),
      (charSum(lines) - charSum(array_distinct(lines))).as("dup_line_chars"))
    staged.select(
      col(idCol), col("n_lines"), col("dup_lines"),
      col("line_chars"), col("dup_line_chars"),
      when(col("n_lines") > 0,
        round(col("dup_lines").cast("double") /
          col("n_lines").cast("double"), 6)).as("dup_line_frac"),
      when(col("line_chars") > 0,
        round(col("dup_line_chars").cast("double") /
          col("line_chars").cast("double"), 6)).as("dup_char_frac"),
      (lit(10L) * col("dup_lines") <= lit(3L) * col("n_lines"))
        .as("ok_dup_lines"),
      (lit(5L) * col("dup_line_chars") <= col("line_chars"))
        .as("ok_dup_chars"),
      (lit(10L) * col("dup_lines") <= lit(3L) * col("n_lines") &&
        lit(5L) * col("dup_line_chars") <= col("line_chars")).as("keep"))
  }

  /** Flesch readability (E235) — the classic readability pair (Flesch
    * '48 reading ease; Kincaid et al. '75 grade level) as corpus-scale
    * quality signals: reading ease
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/word)` and
    * FK grade `0.39·(words/sentences) + 11.8·(syllables/word) − 15.59`,
    * with the standard heuristic syllable counter (vowel-group runs
    * `[aeiouyAEIOUY]+` per word, min 1 — the deterministic approximation
    * every large-scale readability filter actually ships). Extremely
    * low ease (dense jargon) and absurdly high ease (word soup) both
    * mark curation candidates; `readable` applies the conventional
    * ease ≥ 30 floor.
    *
    * Scale shape: ONE map-only pass — token split, per-word syllable
    * counts (array transform + 0-seeded fold, exact integer algebra)
    * and sentence counts all inside the scan projection; no shuffle.
    *
    * Determinism: the three counts are integers; both ratios and the
    * two linear forms are the same fixed-order double expressions in
    * both engines; readouts round to 6 dp, and `readable` compares the
    * ROUNDED ease — no transcendental anywhere. Runs over the E224
    * paged view (the word-soup corpus has no sentence structure).
    *
    * Cites reference scope: readability scoring is absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def fleschReadability(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val toks = TextFunctions.wsTokens(col(textCol))
    val staged = df.select(
      col(idCol),
      size(toks).cast("long").as("n_words"),
      greatest(regexp_count(col(textCol), lit("[.!?]")), lit(1L))
        .cast("long").as("n_sentences"),
      aggregate(
        transform(toks, w =>
          greatest(regexp_count(w, lit("[aeiouyAEIOUY]+")), lit(1L))
            .cast("long")),
        lit(0L), (acc, x) => acc + x).as("n_syllables"))
    val wps = col("n_words").cast("double") /
      col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") /
      col("n_words").cast("double")
    val flesch =
      round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)
    val fk = round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
    staged.select(
      col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
      round(wps, 6).as("words_per_sentence"),
      when(col("n_words") > 0, round(spw, 6)).as("syllables_per_word"),
      when(col("n_words") > 0, flesch).as("flesch"),
      when(col("n_words") > 0, fk).as("fk_grade"),
      when(col("n_words") > 0, flesch >= 30.0).as("readable"))
  }

  /** C4 cleaning EXECUTOR (E224's action) — C4 is a REWRITE, not just a
    * filter: the kept corpus is each surviving page with its failing
    * lines REMOVED. Emits, for every document [[c4Rules]] keeps, the
    * kept-line count and the sha256 of the cleaned text (kept lines
    * re-joined with `\n`) — the content pin downstream shard manifests
    * digest. ONE map-only pass; the sha256 rides the same scan
    * projection, so nothing but (id, count, hash) ever leaves the scan. */
  def c4FilterExecute(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, c4LineKeep(_))
    val keptText = array_join(kept, "\n")
    df.select(
      col(idCol),
      size(kept).cast("long").as("kept_lines"),
      regexp_count(keptText, lit("[.!?]")).cast("long").as("n_sentences"),
      lower(col(textCol)).contains("lorem ipsum").as("has_lorem"),
      col(textCol).contains("{").as("has_brace"),
      sha2(keptText, 256).as("text_sha"))
      .where(col("n_sentences") >= 3L && !col("has_lorem") &&
        !col("has_brace"))
      .select(col(idCol), col("kept_lines"), col("text_sha"))
  }

  /** Script classes for [[scriptProfile]] (E239): name → codepoint-range
    * character class. The ranges are Unicode block ranges written as
    * explicit `\x{...}` spans — the ONE regex dialect feature that means
    * the same thing in Java regex (Spark) and RE2 (DuckDB), unlike the
    * named script properties (`\p{IsCyrillic}` vs `\p{Cyrillic}`).
    * Shared constant: the oracle SQL is generated from this Seq, so the
    * two engines can never drift on a range boundary. Order IS the
    * dominance tie-break. */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "hebrew" -> "[\\x{0590}-\\x{05FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]",
    "cjk" -> "[\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}]",
    "kana" -> "[\\x{3040}-\\x{30FF}]",
    "hangul" -> "[\\x{1100}-\\x{11FF}\\x{AC00}-\\x{D7AF}]")

  /** Non-script auxiliary classes [[scriptProfile]] also counts (they
    * never participate in dominance). The emoji range is astral
    * (non-BMP): both engines match `\x{1F300}` as one CODE POINT — Java
    * regex handles the surrogate pair, RE2 the 4-byte UTF-8 sequence —
    * so the counts agree by construction. */
  val AuxClasses: Seq[(String, String)] = Seq(
    "digit" -> "[0-9]",
    "emoji" -> "[\\x{2600}-\\x{27BF}\\x{1F300}-\\x{1FAFF}]")

  /** Script / writing-system profile (E239) — the text-analysis signal
    * next to E10's language id: per document, a codepoint-block
    * histogram over [[ScriptClasses]], the DOMINANT script (argmax with
    * the fixed class order as tie-break; 'none' when no script letter
    * occurs) and the MIXED-SCRIPT flag — the spam/homoglyph-obfuscation
    * signal (Cyrillic 'а' spliced into Latin words, CJK keyword
    * stuffing): true when the runner-up script carries ≥ 10% of the
    * dominant script's count (integer algebra: `10·second ≥ max`,
    * `second > 0`).
    *
    * Spark-first shape: ONE map-only scan projection — `regexp_count`
    * per class (codegen'd, no UDF, no explode of the text into
    * characters), `greatest(...)` for the max, a fixed-order CASE chain
    * for the argmax, and a second `greatest` over the non-dominant
    * counts. No shuffle, no window; scales as the scan.
    *
    * Cites reference scope: script analysis is absent from
    * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension
    * per SURVEY §2.E. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = (ScriptClasses ++ AuxClasses).map { case (n, re) =>
      regexp_count(t, lit(re)).cast("long").as(s"n_$n")
    }
    val base = df.select(col(idCol) +: counts: _*)
    val scriptCols = ScriptClasses.map { case (n, _) => col(s"n_$n") }
    val m = greatest(scriptCols: _*)
    val dominant = ScriptClasses
      .foldLeft(when(m === 0L, lit("none"))) { case (acc, (n, _)) =>
        acc.when(col(s"n_$n") === m, lit(n))
      }
      .otherwise(lit("none"))
    val withDom = base
      .withColumn("_m", m)
      .withColumn("dominant_script", dominant)
    val second = greatest(ScriptClasses.map { case (n, _) =>
      when(col("dominant_script") === n, lit(0L)).otherwise(col(s"n_$n"))
    }: _*)
    withDom
      .withColumn("_second", second)
      .withColumn("mixed_script",
        col("_second") * 10L >= col("_m") && col("_second") > 0L)
      .drop("_m", "_second")
  }
}
