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
}
