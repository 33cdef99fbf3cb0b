package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the ACTION half of [[ParquetLayout]]'s
  * detection: given per-file footer stats, emit the rewrite plan a
  * maintenance job (Delta OPTIMIZE / Iceberg rewriteDataFiles shape)
  * would execute: which files coalesce into which target-sized output,
  * which are already healthy and stay put. Planning is pure metadata —
  * nothing reads data pages — so the plan for a 100 TB lake costs the
  * same footer sweep E152 already pays.
  *
  * Packing: per table, files under `targetBytes` are first-fit-decreasing
  * bin-packed (size desc, path asc tie-break — fully deterministic);
  * files at/over target are `keep`. FFD is the standard compaction
  * heuristic: ≤ (11/9)·OPT + 1 bins, one pass, no backtracking.
  *
  * Scale shape: the packing runs INSIDE executors via flatMapGroups —
  * one task per table (the natural compaction unit; a partitioned lake
  * would group by (table, partition)), so a million-file lake never
  * ships its file list through the driver. Output is one row per file:
  * `(table, file, compressed_bytes, action, bin_id, bin_files,
  * bin_bytes)`. */
object Compaction {

  /** Pure per-table FFD packing: `(file, bytes)` →
    * `(file, bytes, action, bin_id, bin_files, bin_bytes)`. Exposed in
    * the package so the packing invariants (coverage, no overfill,
    * determinism, the FFD shape) are unit-tested directly. */
  private[graft] def packFFD(
      files: Seq[(String, Long)], targetBytes: Long)
      : Seq[(String, Long, String, Long, Long, Long)] = {
    val (big, small) = files.partition(_._2 >= targetBytes)
    // FFD: largest first, earliest bin with room, stable tie-break
    val sorted = small.sortBy { case (f, b) => (-b, f) }
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[(String, Long)], Long)]
    for ((f, b) <- sorted) {
      bins.indexWhere { case (_, used) => used + b <= targetBytes } match {
        case -1 =>
          bins += ((scala.collection.mutable.ArrayBuffer((f, b)), b))
        case i =>
          val (members, used) = bins(i)
          members += ((f, b))
          bins(i) = (members, used + b)
      }
    }
    big.sortBy(_._1).map { case (f, b) => (f, b, "keep", -1L, 1L, b) } ++
      bins.zipWithIndex.flatMap { case ((members, used), binId) =>
        members.map { case (f, b) =>
          (f, b, "compact", binId.toLong, members.size.toLong, used)
        }
      }
  }

  def compactionPlan(
      spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): DataFrame = {
    import spark.implicits._
    val stats = ParquetLayout.fileStats(spark, dir)
      .select("table", "file", "compressed_bytes")
      .as[(String, String, Long)]
    stats.groupByKey(_._1)
      .flatMapGroups { (table, it) =>
        packFFD(it.map { case (_, f, b) => (f, b) }.toSeq, targetBytes)
          .map { case (f, b, action, bin, nf, bb) =>
            (table, f, b, action, bin, nf, bb) }
      }
      .toDF("table", "file", "compressed_bytes", "action",
        "bin_id", "bin_files", "bin_bytes")
      .orderBy("table", "bin_id", "file")
  }
}
