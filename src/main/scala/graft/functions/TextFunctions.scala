package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * token counting (whitespace + BPE-ish pre-tokenizer), quality scoring,
  * and n-gram/stopword language identification.
  *
  * Everything here is a pure `Column` expression over
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs — and each formula
  * has an exact DuckDB twin in [[graft.OracleSql]] (identical expression
  * trees, so IEEE results match bit-for-bit).
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped (leading/trailing whitespace
    * yields empty strings from split — same in DuckDB's
    * `string_split_regex`). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def wsTokenCount(text: Column): Column = size(wsTokens(text)).cast("long")

  /** BPE-ish pre-tokenizer: letter runs | digit runs | single non-space
    * symbol — the classic GPT-2-style coarse split, counted not
    * materialized. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern)).cast("long")

  val PunctPattern = "[.,;:!?]"

  def punctCount(text: Column): Column =
    regexp_count(text, lit(PunctPattern)).cast("long")

  /** Tiny per-language stopword lists (deterministic heuristic vocabulary,
    * alphabetical language order — the order is the tie-break). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "zu", "mit", "den"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "du", "est"),
    "zh" -> Seq("的", "是", "不", "了", "在", "有", "人", "我"))

  /** Occurrences (not distinct presence) of any of `words` among `tokens`. */
  def stopwordCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t))).cast("long")

  /** Language ID: stopword-hit count per language over lowercased tokens;
    * argmax with (score desc, language asc) tie-break — "und" (undetermined)
    * only if the when-chain is exhausted, which cannot happen since every
    * score equals the max when all are zero and 'de' wins the tie. */
  def langId(text: Column): Column = {
    val toks = wsTokens(lower(text))
    val scores = Stopwords.map { case (l, ws) => l -> stopwordCount(toks, ws) }
    val m = greatest(scores.map(_._2): _*)
    scores
      .foldLeft(when(lit(false), lit("und"))) { case (acc, (l, s)) =>
        acc.when(s === m, lit(l))
      }
      .otherwise(lit("und"))
  }

  /** Global vocabulary top-k: lowercased whitespace tokens ranked by corpus
    * frequency with the deterministic (freq DESC, token ASC) tie-break —
    * the first step of tokenizer-vocabulary construction over a corpus.
    *
    * Scale shape: explode → hash aggregation with map-side partial combine
    * (shuffle volume = distinct tokens per partition, not token
    * occurrences) → `TakeOrderedAndProject` top-k (per-partition heaps, no
    * global sort). */
  def vocabTopK(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    df.select(explode(wsTokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** Corpus bigram top-k — the pair-frequency table of one BPE-style merge
    * round (the most frequent adjacent pair is the next merge candidate)
    * and the n=2 slice of n-gram LM statistics. Bigrams are generated
    * positionally in-row (the [[repetitionMetrics]] chain: no self-join, no
    * per-doc buffering), then the same explode → map-side-combined hash agg
    * → `TakeOrderedAndProject` shape as [[vocabTopK]]. */
  def bigramTopK(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    // materialize the token array as a column FIRST: referencing the
    // tokenizer expression from inside the transform lambda would re-split
    // the text once per element_at (lambda bodies sit outside common-
    // subexpression elimination), turning a linear pass quadratic
    val w = col("w")
    df.select(wsTokens(lower(col(textCol))).as("w"))
      .select(
        explode(
          when(size(w) >= 2,
            transform(
              sequence(lit(1), size(w) - 1),
              i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
            .otherwise(array())).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("bigram").asc)
      .limit(k)
  }

  /** PMI-ranked collocations (E112) — the statistical upgrade of
    * [[bigramTopK]]: raw bigram frequency surfaces "of the", PMI
    * (ln n·c(x,y)/(c(x,·)·c(·,y))) surfaces the genuinely associated
    * pairs — boilerplate collocations, named entities, templated
    * phrases — the fingerprints a corpus-curation pass looks for.
    * `minFreq` drops the unstable low-count tail (PMI's classic
    * pathology: a hapax pair scores ln n).
    *
    * Scale shape: same single explode pass as bigramTopK but keeping
    * (x, y) separate; the cells relation is map-side combined (the
    * shuffle carries distinct pairs, never token instances), marginals
    * are two windows over the CELLS relation keyed by x and y, and the
    * corpus total joins back as a broadcast scalar — no global-order
    * window, no single-partition stage anywhere. Ranking compares the
    * ROUNDED pmi with a bigram ASC tie-break, so the top-k frontier is
    * deterministic across engines. */
  def collocationsPmi(
      df: org.apache.spark.sql.DataFrame, textCol: String, minFreq: Int,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DoubleType
    val w = col("w")
    val cells = df.select(wsTokens(lower(col(textCol))).as("w"))
      .select(explode(
        when(size(w) >= 2,
          transform(
            sequence(lit(1), size(w) - 1),
            i => struct(element_at(w, i).as("x"), element_at(w, i + 1).as("y"))))
          .otherwise(array())).as("p"))
      .select(col("p.x"), col("p.y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val n = broadcast(cells.agg(sum("c").as("n")))
    cells
      .withColumn("cx", sum("c").over(Window.partitionBy("x")))
      .withColumn("cy", sum("c").over(Window.partitionBy("y")))
      .crossJoin(n)
      .where(col("c") >= minFreq)
      .select(
        concat(col("x"), lit(" "), col("y")).as("bigram"),
        col("c").as("freq"),
        round(log(col("n").cast(DoubleType) * col("c").cast(DoubleType) /
          (col("cx").cast(DoubleType) * col("cy").cast(DoubleType))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram").asc)
      .limit(k)
  }

  /** HTML tag stripping (E144) — the first cleaning pass over scraped
    * corpora: tags → space, whitespace re-collapse, edge trim. Regex is
    * deliberately the classic `<[^>]*>` (no backreferences/lookarounds —
    * the PiiFunctions portability contract), which is exactly what the
    * C4/CCNet-lineage extractors use for the tag layer; entity decoding
    * and script/style CONTENT removal are a parser's job, not a regex's,
    * and stay out of scope. Pure per-row codegen'd expression — the scan
    * cost is the operator cost at any corpus size. */
  def htmlStrip(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "), "\\s+", " "))

  /** Sentence segmentation stats (E145) — the shape signal length counts
    * miss: a 2 000-char doc of 3-word fragments and one of fluent prose
    * have the same n_chars but very different sentence profiles (the
    * Gopher rules threshold on exactly this). Sentences = non-blank runs
    * between `[.!?]+` terminators — the deterministic regex layer of
    * segmentation (abbreviation handling is a model's job); returns
    * per-row `(n_sentences, mean_sentence_chars)` columns via one
    * higher-order-function pass, no explode, no shuffle. */
  def sentenceCount(c: Column): Column =
    size(filter(split(c, "[.!?]+"), s => trim(s) =!= lit(""))).cast("long")

  def meanSentenceChars(c: Column): Column = {
    val lens = transform(
      filter(split(c, "[.!?]+"), s => trim(s) =!= lit("")),
      s => length(trim(s)).cast("long"))
    when(size(lens) > 0,
      round(aggregate(lens, lit(0L), (acc, x) => acc + x).cast("double") /
        size(lens).cast("double"), 6))
  }

  /** Tokenizer application: map every token to its dense vocabulary id
    * (1-based rank in the [[vocabTopK]] frequency order; 0 = OOV) and
    * re-assemble the id sequence per document — the step between
    * vocabulary induction and sequence packing in a training pipeline.
    * Returns `(id, n_tokens, oov_count, ids_sum, ids_sha)` with the id
    * sequence fingerprinted (SHA-256 of the comma-joined ids) rather than
    * materialized.
    *
    * Scale shape: positional explode → BROADCAST join against the (tiny)
    * vocab → one doc-keyed shuffle that re-assembles order via
    * `array_sort(collect_list(struct(pos, id)))` — `collect_list` alone
    * has no order guarantee across partitions; the struct sort restores
    * the deterministic sequence. */
  def tokenizeIds(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token").asc)
    val vocab = vocabTopK(df, textCol, vocabSize)
      .withColumn("tok_id", row_number().over(w).cast("long"))
      .select("token", "tok_id")
    val toks = graft.profiler.ScanMetrics.spread(df).select(
      col(idCol).as("id"),
      posexplode(wsTokens(lower(col(textCol)))).as(Seq("pos", "t")))
    val grouped = toks
      .join(broadcast(vocab), toks("t") === vocab("token"), "left")
      .select(col("id"), col("pos"), coalesce(col("tok_id"), lit(0L)).as("tid"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("tid") === 0, lit(1))).as("oov_count"),
        sum(col("tid")).as("ids_sum"),
        substring(
          sha2(
            array_join(
              transform(
                array_sort(collect_list(struct(col("pos").as("p"), col("tid").as("v")))),
                s => s.getField("v").cast("string")),
              ","),
            256), 1, 16).as("ids_sha"))
    // empty documents produce no exploded rows — reinstate them
    df.select(col(idCol).as("id"))
      .join(grouped, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_count"), lit(0L)).as("oov_count"),
        coalesce(col("ids_sum"), lit(0L)).as("ids_sum"),
        coalesce(col("ids_sha"), substring(sha2(lit(""), 256), 1, 16)).as("ids_sha"))
  }

  /** Repetition metrics per document — the Gopher-style quality filters
    * (Rae et al. 2021, §A1.1) that catch degenerate/boilerplate text exact
    * dedup misses: duplicate-token fraction and the most-common-bigram
    * share. Returns one row per input document:
    * `(id, n_tokens, n_distinct, dup_token_frac, max_token_freq,
    * top_bigram_frac)`; fractions are null when undefined (no tokens /
    * no bigrams).
    *
    * Scale shape: token and bigram chains are each explode → two-level hash
    * aggregation keyed on `(id, gram)` then `id` — map-side partial combine
    * makes shuffle volume proportional to distinct grams per doc, and no
    * per-doc array is ever buffered (a 10⁷-token document costs aggregate
    * buffers, not memory). Bigrams are generated positionally inside the
    * row (`transform` over the token array), so adjacency never needs a
    * self-join. */
  def repetitionMetrics(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), wsTokens(lower(col(textCol))).as("w"))
    val tokStats = toks.select(col("id"), explode(col("w")).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("max_token_freq"))
    val bigrams = toks.select(
      col("id"),
      explode(
        when(size(col("w")) >= 2,
          transform(
            sequence(lit(1), size(col("w")) - 1),
            i => concat(element_at(col("w"), i), lit(" "), element_at(col("w"), i + 1))))
          .otherwise(array())).as("g"))
    val biStats = bigrams.groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as("max_bigram_freq"), sum("c").as("n_bigrams"))
    df.select(col(idCol).as("id"))
      .join(tokStats, Seq("id"), "left")
      .join(biStats, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(
          when(col("n_tokens") > 0,
            lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double")),
          6).as("dup_token_frac"),
        coalesce(col("max_token_freq"), lit(0L)).as("max_token_freq"),
        round(
          when(col("n_bigrams") > 0,
            col("max_bigram_freq").cast("double") / col("n_bigrams").cast("double")),
          6).as("top_bigram_frac"))
  }

  /** Document chunking: split each document into fixed-size token windows
    * with overlap (stride = size − overlap) — the preprocessing step that
    * feeds context-window training and retrieval indexing. Explode-shaped
    * per-row transform: chunk starts are generated from the token count,
    * windows sliced from the in-row token array — no shuffle, no state;
    * output grows by the overlap factor only. Empty documents produce no
    * chunks (guarded like the other explode generators). Returns
    * `(id, chunk_idx, start_tok, n_tokens, chunk_sha)` with the chunk
    * content fingerprinted (SHA-256 of the space-joined window) rather
    * than materialized. */
  def chunkDocuments(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      size: Int,
      overlap: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    val toks = wsTokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks)
    // last start = ceil((n - size)/stride): the final chunk ends exactly at
    // n; no redundant starts whose window the previous chunk already covers
    val lastIdx = when(n > size, ceil((n - size) / lit(stride.toDouble)).cast("int"))
      .otherwise(lit(0))
    val idxs = when(n > 0, sequence(lit(0), lastIdx)).otherwise(array())
    df.select(col(idCol).as("id"), toks.as("w"), explode(idxs).as("chunk_idx"))
      .select(
        col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride + 1).cast("long").as("start_tok"),
        least(lit(size),
          org.apache.spark.sql.functions.size(col("w")) - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        sha2(array_join(
          slice(col("w"), col("chunk_idx") * stride + 1, lit(size)), " "), 256)
          .as("chunk_sha"))
  }

  /** Composite quality score in [0, 1]:
    * 0.4·min(tokens/100, 1) + 0.3·(1 − punct_ratio) + 0.3·stopword_ratio.
    * The weights and the exact operation order are part of the oracle
    * contract — do not reassociate.
    *
    * Both ratios are null-guarded (ANSI mode is on by default in Spark 4:
    * an unguarded `x / 0` on an empty or whitespace-only document would
    * throw DIVIDE_BY_ZERO and fail the whole query). A document with no
    * characters or no tokens has an undefined quality — null, mirrored by
    * the CASE guards in the DuckDB oracle. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val ws = wsTokenCount(text)
    val lenScore = least(ws.cast("double") / lit(100.0), lit(1.0))
    val punctRatio = when(nChars > 0, punctCount(text).cast("double") / nChars)
    val stopRatio = when(
      ws > 0,
      stopwordCount(wsTokens(lower(text)), Stopwords.collectFirst {
        case ("en", w) => w
      }.get).cast("double") / ws.cast("double"))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - punctRatio) + lit(0.3) * stopRatio
  }
}
