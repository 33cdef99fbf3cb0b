package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dedup — exact / normalized / cross-snapshot incremental content-hash dedup
  * (split from the former 2.5k-line operators/Dedup.scala, VERDICT r13
  * task 5). Self-typed to the aggregator so families compose freely;
  * scale contracts live on each member's scaladoc. */
private[graft] trait DedupExactOps { this: Dedup.type =>

  /** Exact dedup via SHA-256 content hash: the shuffle key is 32 bytes
    * regardless of payload size, so at 100 TB the document text never
    * travels. Output: one row per distinct content with the smallest id as
    * representative and the group size.
    *
    * Key encoding: each key column is hashed separately and NULL is mapped
    * to a sentinel that cannot collide with a 64-char hex digest, so
    * `("a", null)` / `(null, "a")` stay distinct and a NULL key never
    * collides with the empty string (`concat_ws` alone silently drops
    * NULLs). The grouping partition therefore equals grouping by the raw
    * key tuple with NULL as its own group — exactly DuckDB's `GROUP BY`. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val enc = keyCols.map(c => coalesce(sha2(col(c).cast("string"), 256), lit("null")))
    df.groupBy(sha2(concat_ws("|", enc: _*), 256).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(idCol, "dup_count")
  }

  /** Normalized near-exact dedup (E138) — [[exact]] after text
    * canonicalization (lowercase, whitespace runs → one space, edge
    * trim): the C4-style "same document modulo formatting" pass that
    * catches re-encoded mirrors, reflowed HTML extractions and
    * case-variant copies byte-exact dedup misses, at byte-exact cost
    * (still one 32-byte hash shuffle — no pair join, no shingles).
    * Returns one row per normalized-content group: representative id,
    * group size, and how many RAW variants the group collapsed
    * (`n_raw_variants` > 1 = normalization caught what [[exact]]
    * could not — the operator's yield metric). */
  def normalizedExact(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "\\s+", " "))
    df
      .select(col(idCol).as("_id"), col(textCol).as("_t"),
        coalesce(norm, lit("null")).as("_n"))
      .groupBy(sha2(col("_n"), 256).as("h"))
      .agg(
        min(col("_id")).as(idCol),
        count(lit(1)).as("dup_count"),
        countDistinct(col("_t")).as("n_raw_variants"))
      .select(col(idCol), col("dup_count"), col("n_raw_variants"))
  }

  /** Cross-snapshot incremental dedup: split a new ingest batch into rows
    * whose content already exists in the reference corpus (`dup` = true)
    * and genuinely new rows — the daily-ingest mode of [[exact]], where
    * the existing corpus never rescans its payloads: both sides reduce to
    * 32-byte content hashes and meet in a semi-join (Spark plans the
    * `dup` flag as one hash join on the hash key; the hash relation of
    * the existing corpus would be a persisted artifact in production).
    * Returns the batch's `(idCol, dup)`. */
  def incrementalExact(
      batch: DataFrame,
      existing: DataFrame,
      idCol: String,
      keyCols: Seq[String]): DataFrame = {
    def hash(df: DataFrame): Column = {
      val enc = keyCols.map(c => coalesce(sha2(col(c).cast("string"), 256), lit("null")))
      sha2(concat_ws("|", enc: _*), 256)
    }
    val seen = existing.select(hash(existing).as("h")).distinct()
    batch.select(col(idCol), hash(batch).as("h"))
      .join(seen.withColumn("dup", lit(true)), Seq("h"), "left")
      .select(col(idCol), coalesce(col("dup"), lit(false)).as("dup"))
  }
}
