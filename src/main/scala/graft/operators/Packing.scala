package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
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
  *   1. range-partition by id and sort within partitions (one shuffle of
  *      compact `(id, tokens)` pairs);
  *   2. job 1: per-partition token totals — P numbers to the driver;
  *   3. prefix-exclusive offsets over those P totals, broadcast back;
  *   4. job 2: per-partition running sum seeded with the partition's
  *      offset (`mapPartitions` — genuine per-partition sequential logic,
  *      the documented exception to expression-only style).
  * Wall-clock is two linear passes at full parallelism; the result is a
  * pure function of `(id, tokens, budget)`, independent of partitioning
  * (range boundaries only decide WHERE the running sum is seeded).
  */
object Packing {

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
      .select(col(idCol).cast("long").as("_1"), col(tokenCol).cast("long").as("_2"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col("_1"))
      .sortWithinPartitions(col("_1"))
      .persist()
    try {
      val totals = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += _._2)
        Iterator((pid, s))
      }.collect()
      val offsets = new Array[Long](parts)
      totals.sortBy(_._1).foldLeft(0L) { case (acc, (pid, s)) =>
        offsets(pid) = acc
        acc + s
      }
      val bc = sp.sparkContext.broadcast(offsets)
      val result = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var cum = bc.value(pid)
        it.map { case (id, tok) =>
          val before = cum
          cum += tok
          (id, tok, before / budget, before)
        }
      }.toDF(idCol, "n_tokens", "pack_id", "cum_before")
      // Materialize while the cache still pins partition contents: the
      // range exchange samples boundaries with an RDD-id-derived seed, so a
      // re-execution after unpersist could place rows differently than the
      // run that computed the broadcast offsets. localCheckpoint(eager)
      // severs the lineage before the cache is released.
      result.localCheckpoint(true)
    } finally {
      parted.unpersist()
      ()
    }
  }

  /** Greedy token-budget selection: rank documents by (`scoreCol` DESC,
    * `idCol` ASC) and keep the best prefix whose cumulative token count
    * stays within `budget` — the "spend my compute on the highest-quality
    * tokens" curation step (quality-thresholding by value rather than by an
    * arbitrary score cutoff). Rows with a null score carry no ranking
    * signal and are excluded.
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
      .where(col(scoreCol).isNotNull)
      .select(
        col(scoreCol).cast("double").as("_1"),
        col(idCol).cast("long").as("_2"),
        col(tokenCol).cast("long").as("_3"))
      .as[(Double, Long, Long)]
      .repartitionByRange(parts, col("_1").desc, col("_2").asc)
      .sortWithinPartitions(col("_1").desc, col("_2").asc)
      .persist()
    try {
      val totals = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += _._3)
        Iterator((pid, s))
      }.collect()
      val offsets = new Array[Long](parts)
      totals.sortBy(_._1).foldLeft(0L) { case (acc, (pid, s)) =>
        offsets(pid) = acc
        acc + s
      }
      val bc = sp.sparkContext.broadcast(offsets)
      val result = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var cum = bc.value(pid)
        it.flatMap { case (score, id, tok) =>
          cum += tok
          if (cum <= budget) Some((id, score, tok, cum)) else None
        }
      }.toDF(idCol, scoreCol, "n_tokens", "cum_tokens")
      result.localCheckpoint(true) // same cache-lifetime rule as above
    } finally {
      parted.unpersist()
      ()
    }
  }
}
