package graft.profiler

import java.time.{OffsetDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession

/** The multi-table orchestration driver — the rebuild of the reference's
  * `main` + per-table loops (Profiler.scala:76-253), minus AWS:
  * enumerate the catalog, profile each table, publish each table's metrics
  * to the partitioned parquet sink and the metadata sink.
  *
  * Differences from the reference, on purpose:
  *   - compute→publish per table instead of compute-all-then-publish-all
  *     (bounds driver memory on wide databases, SURVEY.md §3.1 note);
  *   - immutable [[RunnerArgs]] threaded explicitly instead of mutable
  *     object-level config vars (Profiler.scala:130-137);
  *   - tables profile independently, so a malformed table logs and skips
  *     rather than aborting the run.
  */
object Runner {

  /** CLI surface mirroring the reference flags (CommandLineArgs.scala:21-30;
    * defaults README.md:54-63). `dbName` is a parquet directory here;
    * `outPrefix` replaces `s3BucketPrefix`; `region` has no meaning without
    * AWS and is accepted-and-ignored for drop-in compatibility.
    * `tableParallelism` is new: the reference profiles strictly
    * sequentially (Profiler.scala:172-175), which at a 500-table catalog is
    * wall-clock × tables; >1 profiles that many tables concurrently
    * (Spark schedules jobs from multiple driver threads fine). Default 1
    * for reference parity. */
  final case class RunnerArgs(
      dbName: String = "",
      outPrefix: String = "",
      compExp: Boolean = false,
      statsPrefix: String = "DQP",
      profileUnsupportedTypes: Boolean = false,
      noOfBins: Int = 10,
      quantiles: Int = 10,
      tableParallelism: Int = 1) {
    def cfg: ProfilerConfig = ProfilerConfig(
      compExp, statsPrefix, profileUnsupportedTypes, noOfBins, quantiles)
  }

  /** Hand-rolled `--flag value` parser (no scopt in the environment). */
  def parseArgs(args: Array[String]): Either[String, RunnerArgs] = {
    def loop(rest: List[String], acc: RunnerArgs): Either[String, RunnerArgs] =
      rest match {
        case Nil =>
          if (acc.dbName.isEmpty) Left("--dbName is required")
          else if (acc.outPrefix.isEmpty) Left("--outPrefix is required")
          else Right(acc)
        case "--dbName" :: v :: t => loop(t, acc.copy(dbName = v))
        case "--outPrefix" :: v :: t => loop(t, acc.copy(outPrefix = v))
        case "--region" :: _ :: t => loop(t, acc) // accepted, ignored
        case "--compExp" :: v :: t => loop(t, acc.copy(compExp = v.toBoolean))
        case "--statsPrefix" :: v :: t => loop(t, acc.copy(statsPrefix = v))
        case "--profileUnsupportedTypes" :: v :: t =>
          loop(t, acc.copy(profileUnsupportedTypes = v.toBoolean))
        case "--noOfBins" :: v :: t => loop(t, acc.copy(noOfBins = v.toInt))
        case "--quantiles" :: v :: t => loop(t, acc.copy(quantiles = v.toInt))
        case "--tableParallelism" :: v :: t =>
          loop(t, acc.copy(tableParallelism = v.toInt))
        case other :: _ => Left(s"unknown argument: $other")
      }
    loop(args.toList, RunnerArgs())
  }

  /** The reference's main loop as ONE relation (Profiler.scala:166-253,
    * minus the sinks): enumerate the catalog, profile every table with the
    * given metric families, and union the per-table metric relations with
    * `(db_name, table_name)` identity columns — the queryable flagship
    * complement of [[run]]'s publish path. Per-table batteries each reduce
    * their table before the union, so the result stays metadata-sized no
    * matter the catalog's data volume; tables profile as independent jobs
    * exactly like [[run]]'s loop. */
  def profileAllTables(
      spark: SparkSession,
      catalog: TableCatalog,
      cfg: ProfilerConfig,
      fams: Set[String],
      tableParallelism: Int = 4): org.apache.spark.sql.DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val tables = catalog.listTables
    require(tables.nonEmpty, s"catalog ${catalog.name} has no tables")
    // per-table batteries are independent Spark jobs — submit a few
    // concurrently (the run() loop's tableParallelism pattern); results
    // are assembled in listTables order so the union is deterministic
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(tableParallelism, tables.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val per =
      try Await.result(
        Future.traverse(tables) { t =>
          Future {
            val rows = Profiler.metrics(catalog.load(t), cfg, fams)
            Profiler.metricsDF(spark, rows)
              .withColumn("db_name", org.apache.spark.sql.functions.lit(catalog.name))
              .withColumn("table_name", org.apache.spark.sql.functions.lit(t))
          }
        },
        Duration.Inf)
      finally { pool.shutdown(); () }
    per.reduce(_.unionByName(_))
  }

  /** Profile every table of `catalog` and publish (one run timestamp for
    * the whole run, like the reference's run_dt, Profiler.scala:74).
    * Returns (table → metric row count) for observability. */
  def run(
      spark: SparkSession,
      catalog: TableCatalog,
      args: RunnerArgs,
      runDt: OffsetDateTime = OffsetDateTime.now(ZoneOffset.UTC)): Map[String, Int] = {
    val cfg = args.cfg
    val parquetSink = new Sinks.MetricsParquetSink(args.outPrefix)
    // sibling dir, not inside the parquet root — a stray non-parquet
    // directory there breaks Hive-style partition discovery on read
    val metaSink = new Sinks.JsonMetadataSink(s"${args.outPrefix}_metadata")
    def profileOne(table: String): (String, Int) = {
      val n =
        try {
          val df = catalog.load(table)
          val rows = Profiler.metrics(df, cfg, Profiler.referenceBattery)
          val metrics = Profiler.profileRelation(spark, rows, df)
          parquetSink.write(
            Sinks.enrich(metrics, catalog.name, table, runDt), catalog.name, table)
          val (tableParams, columnParams) = Sinks.toParams(rows, cfg)
          metaSink.upsert(table, cfg.statsPrefix + "__", tableParams, columnParams)
          rows.size
        } catch {
          case e: Exception =>
            System.err.println(s"[runner] table $table failed: ${e.getMessage}")
            -1
        }
      table -> n
    }
    val tables = catalog.listTables
    if (args.tableParallelism <= 1) tables.map(profileOne).toMap
    else {
      // bounded driver-side parallelism: each thread submits independent
      // Spark jobs (per-table sinks touch disjoint paths, so no contention)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(args.tableParallelism)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try
        scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(tables)(t =>
            scala.concurrent.Future(profileOne(t))),
          scala.concurrent.duration.Duration.Inf).toMap
      finally { pool.shutdown(); () }
    }
  }

  def main(argv: Array[String]): Unit =
    parseArgs(argv) match {
      case Left(err) =>
        System.err.println(
          s"error: $err\nusage: Runner --dbName <parquetDir> --outPrefix <outDir> " +
            "[--compExp bool] [--statsPrefix s] [--profileUnsupportedTypes bool] " +
            "[--noOfBins n] [--quantiles n] [--tableParallelism n]")
        sys.exit(2)
      case Right(args) =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.codegen.maxFields", "1000")
          // TIMESTAMP(NANOS) parquet (events table) is unreadable as a
          // Spark timestamp; as a raw long the column profiles numerically.
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try {
          val results = Runner.run(spark, new ParquetDirCatalog(spark, args.dbName), args)
          results.toSeq.sortBy(_._1).foreach { case (t, n) =>
            println(s"$t: ${if (n < 0) "FAILED" else s"$n metrics"}")
          }
          if (results.valuesIterator.exists(_ < 0)) sys.exit(1)
        } finally spark.stop()
    }
}
