package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents (in ascending id order) to fixed
  * token-budget packs — the batch-construction step that concatenates a
  * corpus into training context windows. A document belongs to the pack in
  * which its first token lands: `pack_id = cum_tokens_before / budget`.
  *
  * The naive Spark expression — `sum(tokens).over(Window.orderBy(id))`
  * with no partition key — collapses the whole corpus into ONE task (Spark
  * even warns about it). This implementation is the textbook two-phase
  * distributed prefix sum instead:
  *   1. range-partition by the ranking key and sort within partitions (one
  *      shuffle of compact tuples);
  *   2. job 1: per-partition token totals — P numbers to the driver;
  *   3. prefix-exclusive offsets over those P totals, broadcast back;
  *   4. job 2: per-partition running sum seeded with the partition's
  *      offset (`mapPartitions` — genuine per-partition sequential logic,
  *      the documented exception to expression-only style).
  * Wall-clock is two linear passes at full parallelism; the result is a
  * pure function of the ranking key and token counts, independent of
  * partitioning (range boundaries only decide WHERE the running sum is
  * seeded).
  */
object Packing {

  /** Validated long view of an id/token column: a null id, a null or
    * negative token count, or a value that does not cast to long (string
    * ids, overflow) has no meaningful position in a prefix sum (a
    * negative count would let the running total DECREASE, silently
    * re-admitting rows after the budget was crossed), so all fail loudly
    * with the offending column named instead of dying later in the tuple
    * encoder with an anonymous non-nullable-field error. `try_cast`
    * first: under ANSI mode a plain cast of an uncastable value would
    * throw its own anonymous error before this guard could name it. */
  private def checkedLong(c: Column, what: String, allowNegative: Boolean): Column = {
    val casted = c.try_cast("long")
    val ok = if (allowNegative) casted.isNotNull else casted.isNotNull && casted >= 0
    when(ok, casted).otherwise(raise_error(concat(
      lit(s"Packing: $what must be ${if (allowNegative) "a non-null long" else "a non-negative long"}, got "),
      coalesce(c.cast("string"), lit("null")))))
  }

  /** The shared two-phase scaffold: `parted` must arrive range-partitioned
    * and sorted in the ranking order; `tokenOf` extracts the token count;
    * `emit` maps (row, cumBefore) to an output row or None. Handles the
    * persist / totals / offsets / broadcast / localCheckpoint lifecycle —
    * the checkpoint MUST happen while the cache still pins partition
    * contents (the range exchange samples boundaries with an
    * RDD-id-derived seed, so a re-execution after unpersist could place
    * rows differently than the run that computed the offsets). */
  private def prefixSum[T, R: Encoder](
      parted0: Dataset[T],
      parts: Int,
      tokenOf: T => Long)(emit: (T, Long) => Option[R]): Dataset[R] = {
    val parted = parted0.persist()
    try {
      val totals = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += tokenOf(_))
        Iterator((pid, s))
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaLong)).collect()
      val offsets = new Array[Long](parts)
      totals.sortBy(_._1).foldLeft(0L) { case (acc, (pid, s)) =>
        offsets(pid) = acc
        acc + s
      }
      val bc = parted0.sparkSession.sparkContext.broadcast(offsets)
      val result = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var cum = bc.value(pid)
        it.flatMap { t =>
          val before = cum
          cum += tokenOf(t)
          emit(t, before)
        }
      }
      result.localCheckpoint(true)
    } finally {
      parted.unpersist()
      ()
    }
  }

  /** Returns `(idCol, n_tokens, pack_id, cum_before)` where `cum_before`
    * is the exact number of tokens preceding the document in id order and
    * `pack_id = cum_before / budget` (floor). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sp = df.sparkSession
    import sp.implicits._
    val parts = numPartitions.getOrElse(
      math.max(1, sp.sparkContext.defaultParallelism))
    val parted = df
      .select(
        checkedLong(col(idCol), idCol, allowNegative = true).as("_1"),
        checkedLong(col(tokenCol), tokenCol, allowNegative = false).as("_2"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col("_1"))
      .sortWithinPartitions(col("_1"))
    prefixSum(parted, parts, (t: (Long, Long)) => t._2) { case ((id, tok), before) =>
      Some((id, tok, before / budget, before))
    }.toDF(idCol, "n_tokens", "pack_id", "cum_before")
  }

  /** Greedy token-budget selection: rank documents by (`scoreCol` DESC,
    * `idCol` ASC) and keep the best prefix whose cumulative token count
    * stays within `budget` — the "spend my compute on the highest-quality
    * tokens" curation step (quality-thresholding by value rather than by an
    * arbitrary score cutoff). Rows with a null OR NaN score carry no
    * ranking signal and are excluded (Spark sorts NaN ABOVE every double,
    * so un-filtered NaN scores would rank first and eat the budget).
    *
    * Same two-phase distributed prefix sum as [[packSequences]] — the
    * naive `sum().over(Window.orderBy(score))` would collapse the corpus
    * into one task — but range-partitioned on the RANKING order
    * (score DESC, id). `scoreCol` must be engine-portable (e.g. a 6-dp
    * rounded quality score) for the oracle to reproduce the order.
    *
    * Returns `(idCol, score, n_tokens, cum_tokens)` for selected rows,
    * where `cum_tokens` is the running total INCLUDING the row. */
  def selectUnderBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      scoreCol: String,
      budget: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sp = df.sparkSession
    import sp.implicits._
    val parts = numPartitions.getOrElse(
      math.max(1, sp.sparkContext.defaultParallelism))
    val parted = df
      .where(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")))
      .select(
        col(scoreCol).cast("double").as("_1"),
        checkedLong(col(idCol), idCol, allowNegative = true).as("_2"),
        checkedLong(col(tokenCol), tokenCol, allowNegative = false).as("_3"))
      .as[(Double, Long, Long)]
      .repartitionByRange(parts, col("_1").desc, col("_2").asc)
      .sortWithinPartitions(col("_1").desc, col("_2").asc)
    prefixSum(parted, parts, (t: (Double, Long, Long)) => t._3) {
      case ((score, id, tok), before) =>
        val after = before + tok
        if (after <= budget) Some((id, score, tok, after)) else None
    }.toDF(idCol, scoreCol, "n_tokens", "cum_tokens")
  }
}
