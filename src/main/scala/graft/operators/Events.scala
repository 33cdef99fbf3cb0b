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
  * Scale shape: both reduce the event table to per-user scalars in ONE
  * shuffle of the events table — the funnel groups each user's
  * stage-typed events and walks them in-task ([[funnelReached]]), the
  * retention matrix distinct-counts compact `(user, cohort, offset)`
  * triples. Events are never self-joined and never rescanned per stage.
  */
object Events {

  /** Deepest funnel stage each user reaches under STRICT time ordering:
    * stage 1 = any `stages(0)` event; stage k = a `stages(k-1)` event
    * strictly after the stage-(k−1) anchor, where each stage's anchor is
    * its earliest qualifying event. Returns `(u, reached)` for users
    * reaching at least stage 1.
    *
    * ONE shuffle of the events table: events matching any stage type are
    * grouped per user, time-sorted in-task, and walked once — the greedy
    * earliest-anchor walk is exactly the iterated per-stage
    * `min(ts) where ts > prev_anchor` (taking the earliest valid anchor at
    * each stage never excludes a later stage the iterated form would
    * reach). Replaces the k-scan driver loop that read the events table
    * once per stage. The per-user event array holds only events whose type
    * is a funnel stage — bounded by a user's own funnel activity, not the
    * corpus.
    *
    * `maxEventsPerUser` is the skew guard for adversarial users (bots with
    * 10⁸ stage-typed events would otherwise build a 10⁸-element in-task
    * array): when set, only each user's EARLIEST n stage events enter the
    * walk. Depths are exact for every user within the cap; a capped user's
    * depth is a lower bound (anchors never move earlier by dropping late
    * events). Off by default for oracle parity. */
  def funnelReached(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxEventsPerUser: Option[Int] = None): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val stagesArr = array(stages.map(lit): _*)
    val sorted = sort_array(collect_list(col("e")))
    val evs = maxEventsPerUser.fold(sorted)(n => slice(sorted, 1, n))
    val perUser = events
      .where(col(typeCol).isin(stages: _*))
      .select(
        col(userCol).as("u"),
        // null ts → Long.MaxValue: sorts last, can still take an anchor
        // (SQL's per-stage form counts a null-MIN group at its stage) but
        // blocks every later stage (nothing is strictly after it) —
        // matching the iterated `min(ts) where ts > prev` semantics where
        // a null anchor makes the next stage's comparison null/false
        struct(
          coalesce(col(tsCol).cast("long"), lit(Long.MaxValue)).as("t"),
          col(typeCol).as("ty")).as("e"))
      .groupBy("u")
      .agg(evs.as("evs"))
    perUser.select(
      col("u"),
      aggregate(
        col("evs"),
        struct(lit(0).as("s"), lit(Long.MinValue).as("t")),
        // `get` (0-based) is null past the last stage, so a completed
        // funnel's condition goes null → event ignored — no ANSI OOB error
        (acc, e) => when(
          get(stagesArr, acc("s")) === e("ty") && e("t") > acc("t"),
          struct((acc("s") + 1).as("s"), e("t").as("t"))).otherwise(acc),
        acc => acc("s")).as("reached"))
      .where(col("reached") >= 1)
  }

  /** Strict-order funnel counts: stage k's `n_users` = users reaching at
    * least stage k ([[funnelReached]] — one events-table shuffle; this
    * wrapper reduces the per-user relation to ≤ |stages| rows and builds
    * the report driver-side). Returns `(stage, event_type, n_users)`. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    val byDepth = funnelReached(events, userCol, tsCol, typeCol, stages)
      .groupBy("reached").agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = stages.zipWithIndex.map { case (st, i) =>
      Row(i + 1, st, (i + 1 to stages.size).map(j => byDepth.getOrElse(j, 0L)).sum)
    }
    events.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
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
