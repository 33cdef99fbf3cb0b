package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Spark's `df.sample` is seeded per-partition: the selected rows change
  * with partitioning, cluster size and Spark version — useless for
  * reproducible corpus curation. These operators instead derive a hash
  * bucket in [0, 10000) from SHA-256 of (key ++ salt), so
  *   - membership is a pure function of the row's key: stable across runs,
  *     partitionings, engines (DuckDB computes the identical bucket —
  *     oracle-verified), and resilient to data reordering;
  *   - a sample is a strict subset of any larger-rate sample with the same
  *     salt (nested samples for scaling-law runs);
  *   - train/validation/test splits are disjoint by construction and stay
  *     stable when the corpus grows (a document's split never changes).
  *
  * Scale shape: pure map-side scan + filter/projection — no shuffle, no
  * state; the plan is a single WholeStageCodegen over the scan (asserted
  * by PlanAuditSpec).
  */
object Sampling {

  /** Bucket granularity: rates resolve to 0.01% steps. */
  val Buckets = 10000

  /** Hash bucket in [0, Buckets) — first 8 hex chars of
    * `sha256(key ++ salt)` read as an unsigned int (identical in DuckDB:
    * `('0x' || substr(sha256(k || salt), 1, 8))::BIGINT % 10000`). */
  def hashBucket(key: Column, salt: String): Column =
    conv(substring(sha2(concat(key.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Keep rows whose bucket falls below `rate` — a deterministic,
    * reproducible `rate`-fraction sample keyed on `keyCol`. */
  def deterministicSample(
      df: DataFrame, keyCol: String, rate: Double, salt: String = "graft"): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate must be in [0, 1]")
    df.where(hashBucket(col(keyCol), salt) < math.round(rate * Buckets))
  }

  /** Stratified sampling: keep up to `perStratum` rows per stratum, chosen
    * in deterministic hash order (`(hashBucket, key)` — reproducible across
    * runs/partitionings/engines, like [[deterministicSample]]) — the
    * mixture-balancing step of corpus curation (equalize domains/languages
    * before training).
    *
    * Scale shape: one shuffle keyed on the stratum + a per-stratum
    * `row_number` window. A single stratum sorts within one task — fine up
    * to ~10⁸ rows per stratum; for strata far beyond that, pre-trim
    * map-side with `hashPrefilter = Some(bucketBound)` (keeps only rows
    * with bucket < bound before the window — EXACT as long as every
    * stratum retains ≥ perStratum rows, since the window order is the
    * bucket itself: the kept prefix in hash order is unchanged). */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: Column,
      perStratum: Int,
      salt: String = "graft",
      hashPrefilter: Option[Int] = None): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    val b = hashBucket(col(keyCol), salt)
    val pre = hashPrefilter match {
      case Some(bound) => df.where(b < bound)
      case None => df
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(b.asc, col(keyCol).asc)
    pre.withColumn("stratum", strataCol)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perStratum)
      .drop("rn")
  }

  /** Assign each row a split label by consecutive bucket ranges, e.g.
    * `Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)`. Fractions must
    * sum to 1 (within bucket granularity); ranges are disjoint and
    * exhaustive, so every row with a non-null key gets exactly one label.
    * NULL keys have no hash bucket, hence no membership: their label is
    * null — consistent with [[deterministicSample]], which excludes them
    * (membership is a pure function of the key, and NULL has none). */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split fractions must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1 (got ${splits.map(_._2).sum})")
    // bounds from CUMULATIVE fractions: per-split rounding would reject
    // legitimate sets (three 1/3s each round to 3333, summing to 9999)
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(cum => math.round(cum * Buckets))
    require(bounds.last == Buckets, s"internal: ${bounds.last}")
    val b = hashBucket(col(keyCol), salt)
    val label = splits.map(_._1).zip(bounds).init
      .foldLeft(when(lit(false), lit(""))) { case (acc, (name, hi)) =>
        acc.when(b < hi, lit(name))
      }
      .otherwise(lit(splits.last._1))
    df.withColumn("split", when(col(keyCol).isNotNull, label))
  }

  /** Deterministic corpus shuffle + sharding: assign every row a shard
    * (`bucket mod nShards` — exactly balanced when `nShards` divides
    * [[Buckets]]) and a position within the shard in FULL-hash order
    * (`sha256(key ++ salt)` hex, key tie-break). This is the "global
    * shuffle" step before training-data serialization: hash order is
    * statistically random with respect to any source ordering, yet a pure
    * function of the key — re-runs, engine ports and incremental rebuilds
    * produce the identical training order.
    *
    * The sort key must be the FULL digest, not the 10⁴-value bucket: with
    * only 10000 order values, a billion-row shard would contain ~10⁵-row
    * runs ordered by `keyCol` — i.e. long stretches of SOURCE order
    * (chronological ids, single-crawl runs), exactly what a training
    * shuffle exists to destroy. The hex digest string orders identically
    * in DuckDB, keeping the oracle exact.
    *
    * Scale shape: one shuffle keyed on the shard; each shard sorts
    * independently (a within-task sort at ~corpus/nShards rows — raise
    * `nShards` with corpus size so shards stay task-sized). */
  def shuffleShards(
      df: DataFrame, keyCol: String, nShards: Int, salt: String = "graft"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val b = hashBucket(col(keyCol), salt)
    val hx = sha2(concat(col(keyCol).cast("string"), lit(salt)), 256)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(hx.asc, col(keyCol).asc)
    df.where(col(keyCol).isNotNull)
      .withColumn("shard", (b % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
