package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet physical-layout profiler — the small-files / row-group-health
  * detector. At 100 TB the dominant silent performance killer is not a
  * bad plan but a bad LAYOUT: millions of KB-sized files (listing +
  * open() overhead dwarfs I/O; one task per file starves the scheduler)
  * or single-row-group multi-GB files (no intra-file parallelism, one
  * task pins a whole file). Both are invisible to `.explain` — the scan
  * node looks identical — so the profiler reads them from the layout
  * itself and reports, per file: row count, row-group count, compressed
  * bytes, and per-table rollups with the two pathology flags.
  *
  * Scale shape: FOOTER METADATA ONLY — the file list is distributed over
  * executors and each task reads the ~KB parquet footer (never data
  * pages), so profiling a 100 TB lake costs one footer round-trip per
  * file, embarrassingly parallel, zero shuffle beyond the final
  * table-level rollup. This is the R1/R2 catalog-enumeration loop
  * (reference Glue.java:154-171) applied to physical files instead of
  * catalog tables.
  *
  * Determinism: footer counts are write-time facts; output is
  * hash-stable. The driver gate cannot point DuckDB's `parquet_metadata`
  * at the same directory (oracle SQL sees table VIEWS, not paths), so
  * the query key is rows-only and `parquet_layout_audit` pins the
  * ground truth INSIDE the gate: per table, Σ footer rows must equal the
  * engine's own COUNT(*) of the scanned relation — a footer-vs-scan
  * consistency proof with an all-true VALUES oracle. */
object ParquetLayout {

  /** Default footer-read fan-out: plenty for a local test directory.
    * Callers profiling a real lake should raise it — the difference
    * between 64-way and 1000-way on a million-file listing. */
  val DefaultFooterParallelism: Int = 64

  /** Recursive parquet file listing under `dir` (data files only). */
  private[sources] def listParquet(spark: SparkSession, dir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith("_") &&
        !name.startsWith("."))
        out += f.getPath.toUri.getPath
    }
    out.result()
  }

  /** Per-file footer stats for every parquet data file under `dir`:
    * `(table, file, n_rows, n_row_groups, compressed_bytes)`. `table` is
    * the first path segment under `dir` with any `.parquet` suffix
    * stripped (`lineitem.parquet` the file and `lineitem.parquet/` the
    * directory of parts both profile as table `lineitem`). */
  def fileStats(
      spark: SparkSession, dir: String,
      footerParallelism: Int = DefaultFooterParallelism): DataFrame = {
    import spark.implicits._
    // derive the strip-prefix from the QUALIFIED path, the same form the
    // listing emits — anchoring on the caller's raw string broke relative
    // dirs (table '' for every file; ADVICE r9)
    val root = new org.apache.hadoop.fs.Path(dir)
    val dirPath = root
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(root).toUri.getPath.stripSuffix("/")
    val files = listParquet(spark, dir)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, footerParallelism)))
      .mapPartitions { it =>
        // fresh default Configuration per task: listing produced plain
        // paths on the cluster's default FS; footer reads need no
        // job-specific conf (document before pointing at a FS whose
        // endpoint lives only in the session conf)
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val groups = r.getFooter.getBlocks
            val nRows = r.getRecordCount
            var bytes = 0L
            groups.forEach(g => bytes += g.getCompressedSize)
            (f, nRows, groups.size().toLong, bytes)
          } finally r.close()
        }
      }
      .toDF("path", "n_rows", "n_row_groups", "compressed_bytes")
      .select(
        // Pattern.quote: a directory named "run (1)" would otherwise
        // inject a capture group (or a PatternSyntaxException) into the
        // table-name extraction
        regexp_replace(
          regexp_extract(col("path"),
            "^" + java.util.regex.Pattern.quote(dirPath + "/") + "([^/]+)", 1),
          "\\.parquet$", "").as("table"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("n_rows"), col("n_row_groups"), col("compressed_bytes"))
  }

  /** Per-row-group min/max of a 64-bit integer column, from footer
    * statistics only: `(file, group_idx, col_min, col_max)` — the zone
    * maps a stats-aware reader prunes row groups with. Groups without
    * stats for the column yield nulls. Footer-only like [[fileStats]]:
    * this is how clustering QUALITY is measured without scanning data
    * (see [[ZOrderLayout]]). */
  def rowGroupLongStats(
      spark: SparkSession, dir: String, column: String,
      footerParallelism: Int = DefaultFooterParallelism): DataFrame = {
    import spark.implicits._
    val files = listParquet(spark, dir)
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, footerParallelism)))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val out = Seq.newBuilder[(String, Int, Option[Long], Option[Long])]
            var gi = 0
            r.getFooter.getBlocks.forEach { g =>
              var mm: Option[(Long, Long)] = None
              g.getColumns.forEach { c =>
                if (c.getPath.toDotString == column) {
                  val st = c.getStatistics
                  if (st != null && st.hasNonNullValue) {
                    (st.genericGetMin, st.genericGetMax) match {
                      case (mn: java.lang.Long, mx: java.lang.Long) =>
                        mm = Some((mn.longValue, mx.longValue))
                      case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                        mm = Some((mn.longValue, mx.longValue))
                      case _ => ()
                    }
                  }
                }
              }
              out += ((f, gi, mm.map(_._1), mm.map(_._2)))
              gi += 1
            }
            out.result()
          } finally r.close()
        }
      }
      .toDF("path", "group_idx", "col_min", "col_max")
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file"),
        col("group_idx"), col("col_min"), col("col_max"))
  }

  /** Table-level layout rollup with pathology flags:
    * `small_files` = files under `smallFileBytes` compressed (the
    * listing/open-overhead pathology), `single_group_big` = files over
    * `bigFileBytes` with ONE row group (the no-intra-file-parallelism
    * pathology). Healthy at any scale: a handful of ~128 MB-1 GB files
    * per partition, multiple row groups each. */
  def tableRollup(
      spark: SparkSession, dir: String,
      smallFileBytes: Long = 4L << 20,
      bigFileBytes: Long = 1L << 30,
      footerParallelism: Int = DefaultFooterParallelism): DataFrame =
    fileStats(spark, dir, footerParallelism)
      .groupBy("table")
      .agg(
        count(lit(1)).as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_row_groups").as("n_row_groups"),
        sum("compressed_bytes").as("compressed_bytes"),
        count(when(col("compressed_bytes") < smallFileBytes, 1))
          .as("small_files"),
        count(when(col("n_row_groups") === 1L &&
          col("compressed_bytes") > bigFileBytes, 1))
          .as("single_group_big"))
}
