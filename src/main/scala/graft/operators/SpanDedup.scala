package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph/span-level corpus deduplication (E68).
  *
  * MassiveText/Gopher-style repeated-passage removal: segment every
  * document into spans, count each span's occurrences across the WHOLE
  * corpus, and strip spans that repeat at least `minFreqToDrop` times
  * (boilerplate headers, license blocks, navigation chrome) while
  * reassembling the survivors in document order. Complements whole-doc
  * dedup (E1) and near-dup (E2-E5): those drop documents, this cleans
  * *inside* documents that are otherwise unique.
  *
  * Segmentation is a fixed window of `spanWords` consecutive
  * whitespace-separated words (the corpus has no paragraph separators;
  * with real text, split on `\n\n` upstream and pass the paragraphs
  * through the same frequency/reassembly machinery).
  *
  * Scale shape (the 100 TB path):
  *   1. span frequency — the one unavoidable corpus-wide shuffle, on the
  *      span string with map-side partial aggregation; only spans with
  *      count ≥ `minFreqToDrop` survive the HAVING, so the result is the
  *      (tiny) boilerplate relation, not the corpus;
  *   2. reassembly — MAP-ONLY: the hot-span relation is collapsed to a
  *      single array row and broadcast; each document filters its own
  *      span array against it with no second shuffle and no regroup.
  *      `maxHotSpans` guards the broadcast: a corpus whose boilerplate
  *      relation exceeds it fails fast (raise_error) instead of OOMing
  *      the driver — switch to the join-based `dropHotSpansViaJoin`
  *      reassembly for such corpora.
  *
  * Null/empty text: null text yields 0 spans and an empty clean_text
  * (never null), mirroring the oracle's COALESCE.
  */
object SpanDedup {

  /** Hard ceiling on the broadcast hot-span relation (see scaladoc). */
  val DefaultMaxHotSpans = 1000000

  /** Fixed-window segmentation: consecutive `w`-word chunks of the
    * whitespace tokenization; the final chunk may be shorter. Null text
    * → empty span array. */
  def spanArray(text: Column, w: Int): Column = {
    require(w >= 1, s"spanWords must be >= 1, got $w")
    val toks = split(text, " ")
    val nSpans = floor((size(toks) + lit(w - 1)) / lit(w)).cast("int")
    when(text.isNull, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), nSpans - 1),
        i => concat_ws(" ", slice(toks, i * w + 1, lit(w)))))
  }

  /** Spans repeating ≥ `minFreqToDrop` times corpus-wide — the
    * boilerplate relation: (span, cnt), one shuffle, map-side combined. */
  def hotSpans(
      df: DataFrame, textCol: String, spanWords: Int,
      minFreqToDrop: Long): DataFrame =
    df.select(explode(spanArray(col(textCol), spanWords)).as("span"))
      .groupBy("span").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minFreqToDrop)

  /** Strip corpus-repeated spans from every document (map-only
    * reassembly, see scaladoc). Output: idCol, clean_text, n_spans,
    * n_dropped — ordered by nothing (callers sort). */
  def dropHotSpans(
      df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 5, minFreqToDrop: Long = 2,
      maxHotSpans: Int = DefaultMaxHotSpans): DataFrame = {
    val hot = hotSpans(df, textCol, spanWords, minFreqToDrop)
      .agg(collect_list(col("span")).as("hot_spans"))
      // fail fast instead of silently under-deduping or OOMing the
      // driver when the boilerplate relation outgrows the broadcast
      .select(when(size(col("hot_spans")) <= maxHotSpans, col("hot_spans"))
        .otherwise(raise_error(concat(
          lit(s"SpanDedup: hot-span relation exceeds maxHotSpans=$maxHotSpans ("),
          size(col("hot_spans")).cast("string"),
          lit(") — use dropHotSpansViaJoin for this corpus"))))
        .as("hot_spans"))
    val spans = spanArray(col(textCol), spanWords)
    df.select(col(idCol), spans.as("spans"))
      .crossJoin(broadcast(hot))
      .select(
        col(idCol),
        concat_ws(" ",
          filter(col("spans"), s => !array_contains(col("hot_spans"), s)))
          .as("clean_text"),
        size(col("spans")).cast("long").as("n_spans"),
        size(filter(col("spans"), s => array_contains(col("hot_spans"), s)))
          .cast("long").as("n_dropped"))
  }

  /** Join-based reassembly for corpora whose boilerplate relation is too
    * large to broadcast: explode → left-anti join on the hot relation
    * (shuffle ∝ corpus) → regroup by document in span order. Same output
    * contract as [[dropHotSpans]]. */
  def dropHotSpansViaJoin(
      df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 5, minFreqToDrop: Long = 2): DataFrame = {
    val hot = hotSpans(df, textCol, spanWords, minFreqToDrop).select("span")
    // plain posexplode: empty span arrays (null text) contribute no rows
    // and rejoin with n_kept = 0 via the left join below — posexplode_outer
    // would emit a (null, null) row that survives the anti-join and
    // miscounts n_kept
    val exploded = df
      .select(col(idCol), posexplode(spanArray(col(textCol), spanWords))
        .as(Seq("span_idx", "span")))
    val kept = exploded.join(hot, Seq("span"), "left_anti")
      .groupBy(idCol)
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol),
        size(spanArray(col(textCol), spanWords)).cast("long").as("n_spans"))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_spans"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
