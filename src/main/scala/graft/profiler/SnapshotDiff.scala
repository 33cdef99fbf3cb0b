package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level snapshot reconciliation (E87) — the CDC-style "what changed
  * between yesterday's load and today's" diff that the metric-level drift
  * checks (E33 profile drift, E47 schema drift) deliberately summarize
  * away: per key, whether the row was `added`, `removed`, `changed` or
  * `unchanged`, the thing a pipeline owner greps when a partition
  * reloads with different counts.
  *
  * Scale shape: each side collapses MAP-SIDE to (key, digest) where the
  * digest is SHA-256 over the compared columns, so the full-outer join
  * that classifies rows shuffles 32-byte digests, never row payloads,
  * and the join is a plain hash equi-join on the key. Duplicate keys
  * within a snapshot are a CONTRACT VIOLATION for row-level diff;
  * they're counted per side and surfaced as `dup_key` rather than
  * silently producing join fan-out rows that would misreport as
  * adds/changes. */
object SnapshotDiff {

  /** 0x1f unit separator between columns + 0x1e null sentinel: ("ab","c")
    * differs from ("a","bc") and ("a",null) from ("a","") by
    * construction. Values containing these control bytes could still
    * alias — absent from anything this engine profiles, and a digest
    * collision only ever misreports `changed` as `unchanged`, never
    * corrupts data. */
  private def digest(cols: Seq[String]): Column =
    sha2(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*), 256)

  /** Returns one row per key present in either snapshot:
    * `(key..., status)` with status one of added | removed | changed |
    * unchanged | dup_key. */
  def diff(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    def side(df: DataFrame, tag: String) = df
      .select((keyCols.map(col) :+ digest(compareCols).as(s"h_$tag")): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_$tag"), min(s"h_$tag").as(s"h_$tag"))
    val b = side(before, "b")
    val a = side(after, "a")
    b.join(a, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("n_b") > 1 || col("n_a") > 1, "dup_key")
          .when(col("n_b").isNull, "added")
          .when(col("n_a").isNull, "removed")
          .when(col("h_b") =!= col("h_a"), "changed")
          .otherwise("unchanged").as("status"): _*)
  }

  /** The metadata-sized rollup of [[diff]]: one row per status. */
  def diffCounts(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame =
    diff(before, after, keyCols, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
