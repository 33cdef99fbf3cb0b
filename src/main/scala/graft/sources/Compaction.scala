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

  /** EXECUTE the `compact` half of [[compactionPlan]] (r10, VERDICT r9
    * task 3 — the action's action): every compaction bin is rewritten
    * into exactly ONE merged parquet file under
    * `outDir/<table>/bin=<id>/`, `keep` files are never read or
    * rewritten, and the SOURCE directory is never touched (the
    * Delta-OPTIMIZE contract split into rewrite-then-swap; the swap —
    * atomically replacing source files with the merged output — is a
    * transaction-log concern this library leaves to the table format).
    *
    * Scale shape — coalesce-free by construction: rows are shuffled ONCE
    * on the bin id (`repartition(col("bin"))` puts each bin's rows in
    * exactly one task; a task holding several small bins still writes
    * one file PER bin via `partitionBy`), so a million-file lake
    * compacts with one job per table, parallel across bins, and no
    * driver-side file loop — the driver iterates TABLES (metadata-sized)
    * only. The file→bin assignment stays a DataFrame joined against
    * `input_file_name()`; the file list itself never reaches the driver.
    *
    * Returns the per-bin reconciliation report, with the input side from
    * the plan's footer sweep and the output side footer-read from the
    * rewritten layout:
    * `(table, bin_id, n_input_files, input_rows, input_bytes,
    *   n_output_files, output_rows, output_bytes)`. */
  def executeCompaction(
      spark: SparkSession, dir: String, outDir: String,
      targetBytes: Long = 128L << 20,
      tableFilter: Option[Seq[String]] = None): DataFrame = {
    import spark.implicits._
    val stats = ParquetLayout.fileStats(spark, dir)
      .select("table", "file", "n_rows", "compressed_bytes")
    val plan = compactionPlan(spark, dir, targetBytes)
    val bins = plan.where(col("action") === "compact")
      .where(tableFilter.map(ts => col("table").isInCollection(ts))
        .getOrElse(lit(true)))
      .join(stats.withColumnRenamed("compressed_bytes", "fbytes"),
        Seq("table", "file"))
    // one entry per TABLE — metadata-sized, unlike the file list
    val tables = bins.select("table").distinct().as[String].collect().sorted
    // fileStats strips an OPTIONAL .parquet suffix off the first path
    // segment, so re-appending a hardcoded ".parquet" broke bare-directory
    // layouts (dir/lineitem/part-*.parquet) AFTER bins were computed
    // (ADVICE r10) — re-derive each table's actual first segment from the
    // same listing fileStats read
    val root = new org.apache.hadoop.fs.Path(dir)
    val dirPath = root
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(root).toUri.getPath.stripSuffix("/")
    val segOf: Map[String, String] = ParquetLayout
      .listParquet(spark, dir)
      .flatMap { p =>
        val seg = p.stripPrefix(dirPath + "/").takeWhile(_ != '/')
        if (seg.isEmpty) None
        else Some(seg.replaceAll("\\.parquet$", "") -> seg)
      }.toMap
    val reports = tables.map { t =>
      val assign = bins.where(col("table") === t)
        .select(col("file").as("_f"), col("bin_id").as("bin"))
      spark.read.parquet(s"$dir/${segOf.getOrElse(t, s"$t.parquet")}")
        .withColumn("_f", regexp_extract(input_file_name(), "([^/]+)$", 1))
        .join(assign, Seq("_f"))     // inner join: keep-files drop out
        .drop("_f")
        .repartition(col("bin"))     // each bin's rows land in ONE task
        .write.mode("overwrite").partitionBy("bin")
        .parquet(s"$outDir/$t")
      val outRows = spark.read.parquet(s"$outDir/$t")
        .groupBy("bin").agg(count(lit(1)).as("output_rows"))
      // footer sweep of the rewritten layout: fileStats' first path
      // segment under outDir/<t> is the partition dir "bin=<id>"
      val outFiles = ParquetLayout.fileStats(spark, s"$outDir/$t")
        .select(
          regexp_extract(col("table"), "^bin=(\\d+)$", 1).cast("long")
            .as("bin"),
          col("n_rows"), col("compressed_bytes"))
        .groupBy("bin").agg(
          count(lit(1)).as("n_output_files"),
          sum("compressed_bytes").as("output_bytes"))
      bins.where(col("table") === t)
        .groupBy("bin_id").agg(
          count(lit(1)).as("n_input_files"),
          sum("n_rows").as("input_rows"),
          sum("fbytes").as("input_bytes"))
        .join(outRows.withColumnRenamed("bin", "bin_id"), Seq("bin_id"))
        .join(outFiles.withColumnRenamed("bin", "bin_id"), Seq("bin_id"))
        .select(lit(t).as("table"), col("bin_id"), col("n_input_files"),
          col("input_rows"), col("input_bytes"), col("n_output_files"),
          col("output_rows"), col("output_bytes"))
    }
    reports.reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataset[(String, Long, Long, Long, Long, Long,
        Long, Long)].toDF("table", "bin_id", "n_input_files", "input_rows",
        "input_bytes", "n_output_files", "output_rows", "output_bytes"))
      .orderBy("table", "bin_id")
  }
}
