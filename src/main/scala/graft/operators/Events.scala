package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-sequence event analytics — the two classic product-analytics
  * operators a query engine is expected to answer over an event stream
  * table: conversion funnels with STRICT time ordering (stage k counts
  * only users whose stage-k event happened after their stage-(k−1)
  * event — a plain per-type distinct count would overcount wildly) and
  * cohort retention matrices.
  *
  * Scale shape: both reduce the event table to per-user scalars before
  * anything joins — the funnel frontier is one `(user, min_ts)` row per
  * surviving user per stage, the retention matrix distinct-counts
  * compact `(user, cohort, offset)` triples. Events themselves are
  * never self-joined. The per-user side is NOT force-broadcast: with
  * billions of users it would not fit an executor, so the frontier is
  * materialized (localCheckpoint → exact size stats) and AQE picks
  * broadcast when it is genuinely small, shuffle-hash otherwise.
  */
object Events {

  /** Strict-order funnel: stage 1 = users with a `stages(0)` event;
    * stage k = users with a `stages(k-1)` event strictly after their
    * stage-(k−1) time (earliest qualifying event becomes the new
    * anchor). Returns `(stage, event_type, n_users)`. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val counts = Seq.newBuilder[Row]
    var frontier: DataFrame = null
    stages.zipWithIndex.foreach { case (st, i) =>
      val matching = events.where(col(typeCol) === st)
      val qualified =
        if (i == 0) matching
        else matching
          .join(frontier, Seq(userCol)) // AQE: broadcast iff frontier small
          .where(col(tsCol) > col("_t"))
      frontier = qualified
        .groupBy(userCol)
        .agg(min(col(tsCol)).as("_t"))
        .localCheckpoint(true) // per-user scalars; pin before the count
      counts += Row(i + 1, st, frontier.count())
    }
    events.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(counts.result()).asJava),
      StructType(Seq(
        StructField("stage", IntegerType, nullable = false),
        StructField("event_type", StringType, nullable = false),
        StructField("n_users", LongType, nullable = false))))
  }

  /** Cohort retention: cohort = the user's first active day (epoch days
    * from the microsecond timestamp), cell (cohort_day, day_offset) =
    * distinct users of that cohort active `offset` days later. Returns
    * `(cohort_day, day_offset, n_users)` for offsets `0..maxOffset`. */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsUsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be non-negative")
    val ev = events.select(
      col(userCol).as("u"),
      expr(s"$tsUsCol div 86400000000").as("day"))
    // per-user table — unbounded at scale, so no broadcast hint; both
    // sides shuffle on `u` (the groupBy's partitioning is reused)
    val cohort = ev.groupBy("u").agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("u"))
      .select(col("u"), col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .where(col("day_offset") <= maxOffset)
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
