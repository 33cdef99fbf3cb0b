package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** BPE vocabulary induction (E159) — the byte-pair-encoding merge-table
  * learner (Sennrich, Haddow & Birch, ACL '16): starting from characters,
  * repeatedly find the most frequent adjacent symbol pair (weighted by
  * word frequency) and merge it into one symbol. The learned merge table
  * IS the tokenizer — this is the training half of what E58/E125
  * (tokenize/fertility) consume.
  *
  * Spark-first iteration shape: the corpus is scanned ONCE, into a
  * `(word, count, symbols)` VOCABULARY relation — every induction step
  * then runs on the vocab (orders of magnitude smaller than the corpus;
  * the standard trick every production BPE trainer uses). Each of the
  * `nMerges` steps is one weighted pair-count aggregation (map-side
  * combined) + a 1-row `orderBy(count desc, pair asc).limit(1)` collect
  * (deterministic tie-break) + one codegen'd merge pass
  * ([[graft.functions.BpeMergeStep]] — the greedy left-to-right
  * non-overlapping scan), with `localCheckpoint` truncating the growing
  * lineage per step. Driver traffic is ONE ROW per merge.
  *
  * Stops early (returning fewer rows) when no adjacent pair remains.
  * No end-of-word marker: merges are intra-word only — a deterministic,
  * oracle-mirrorable contract (DuckDB replays every step with the
  * identical greedy fold; see OracleSql.bpeMerges).
  *
  * Returns `(merge_rank, lhs, rhs, merged, pair_count)`, rank 1 first.
  *
  * Cites reference scope: tokenizer training is absent from
  * awsdataprofiler (Profiler.scala:166-253 profiles only) — extension per
  * SURVEY §2.E. */
object BpeInduction {

  def bpeMerges(
      df: DataFrame,
      textCol: String,
      nMerges: Int = 8): DataFrame = {
    require(nMerges > 0, "need a positive merge count")
    val spark = df.sparkSession
    graft.functions.BpeMergeStep.register(spark)
    // "(?!$)": split before every char but never at the end — no trailing
    // empty element (Java split semantics with limit -1 would keep one)
    var vocab = graft.profiler.ScanMetrics.spread(df)
      .select(explode(TextFunctions.wsTokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), split(col("w"), "(?!$)").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val pairs = vocab
        .where(size(col("syms")) >= 2)
        .select(
          col("cnt"),
          explode(transform(
            sequence(lit(0), size(col("syms")) - 2),
            i => struct(
              element_at(col("syms"), i + 1).as("l"),
              element_at(col("syms"), i + 2).as("r")))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(rank.toLong, l, r, l + r, c)
        vocab = vocab
          .withColumn("syms",
            call_function("bpe_merge_step", col("syms"), lit(l), lit(r)))
          .localCheckpoint(true)
        rank += 1
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(merges.toSeq: _*),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** BPE encode (E160) — apply a learned merge table and report per-
    * document token statistics: `(idCol, n_words, n_bpe_tokens,
    * chars_per_token)`. The inference half of [[bpeMerges]] — together
    * they close the tokenizer loop (learn → encode → fertility, E125).
    *
    * Merges apply in RANK ORDER, one greedy pass each
    * ([[graft.functions.BpeMergeStep]]) — provably equivalent to the
    * classic lowest-rank-first priority encoding: for merge k's pair
    * (a,b), both symbols were created by merges < k (or are characters),
    * and merging can only INSERT symbols between neighbours, never
    * remove them, so applying ranks 1..K sequentially can never make an
    * earlier merge applicable again. This is the single-pass-per-rank
    * shape fast BPE encoders use.
    *
    * Scale shape: encoding runs on the VOCABULARY (distinct words),
    * K codegen'd merge passes, no shuffle; per-document counts come from
    * ONE explode + word-keyed equi-join + doc-keyed aggregation — the
    * corpus ships (doc, word) pairs once, never symbol arrays. */
  def bpeEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nMerges: Int = 8): DataFrame = {
    val spark = df.sparkSession
    graft.functions.BpeMergeStep.register(spark)
    val table = bpeMerges(df, textCol, nMerges).collect() // ≤ nMerges rows
    val words = graft.profiler.ScanMetrics.spread(df)
      .select(
        col(idCol).as("id"),
        explode(TextFunctions.wsTokens(lower(col(textCol)))).as("w"))
    val vocab0 = words.groupBy("w").agg(count(lit(1)).as("_f"))
      .select(col("w"), split(col("w"), "(?!$)").as("syms"))
    val encoded = table.foldLeft(vocab0) { (v, m) =>
      v.withColumn("syms", call_function("bpe_merge_step",
        col("syms"), lit(m.getString(1)), lit(m.getString(2))))
    }.select(col("w"), size(col("syms")).cast("long").as("ntok"))
    words
      .join(encoded, Seq("w"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("ntok")).as("n_bpe_tokens"),
        sum(length(col("w")).cast("long")).as("_chars"))
      .select(
        col("id").as(idCol),
        col("n_words"),
        col("n_bpe_tokens"),
        round(col("_chars").cast("double") / col("n_bpe_tokens"), 6)
          .as("chars_per_token"))
  }
}
