package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement aid for the optimization rounds (guide §1: measure first).
  *
  * For each requested query key this main
  *   1. prints the `.explain("formatted")` plan (optionally into a file,
  *      for the committed plans/r16/ before/after evidence),
  *   2. runs the query once under a SparkListener and prints a per-job
  *      wall/stage/task/shuffle breakdown, so a key's seconds decompose
  *      into "N jobs × floor" vs "one heavy stage" instead of guesswork.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Probe <key> [<key> ...] [--plans-dir plans/r16 --suffix _before]"
  *
  * Never invoked by the driver; purely a local iteration tool.
  */
object Probe {
  private final case class JobRow(
      id: Int, desc: String, wallMs: Long, stages: Int, tasks: Int,
      shuffleReadMB: Double, shuffleWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val (flags, keys0) = args.partition(a => a.startsWith("--"))
    var plansDir: Option[String] = None
    var suffix = ""
    var skipRun = false
    args.sliding(2).foreach {
      case Array("--plans-dir", d) => plansDir = Some(d)
      case Array("--suffix", s) => suffix = s
      case _ => ()
    }
    if (flags.contains("--no-run")) skipRun = true
    val keys = {
      val k = keys0.filterNot(a =>
        a == plansDir.orNull || a == suffix || a.startsWith("--"))
      if (k.nonEmpty) k.toSeq else Seq("profile_lineitem")
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    keys.foreach { key =>
      val fn = SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown query key: $key"))
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.maxFields", "1000")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        plansDir match {
          case Some(dir) =>
            val p = java.nio.file.Paths.get(dir, s"$key$suffix.txt")
            java.nio.file.Files.createDirectories(p.getParent)
            java.nio.file.Files.write(p,
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"PROBE_PLAN $key -> $p")
          case None =>
            println(s"===== PLAN $key ====="); println(plan)
        }
        if (!skipRun) {
          val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
          val rows = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
          val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Double, Double)]()
          val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
          val listener = new SparkListener {
            override def onJobStart(js: SparkListenerJobStart): Unit = {
              val desc = Option(js.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .getOrElse("")
              jobs.put(js.jobId, (System.nanoTime(), desc))
              js.stageIds.foreach(sid => stageToJob.put(sid, js.jobId))
            }
            override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val m = si.taskMetrics
              stageAgg.merge(stageToJob.getOrDefault(si.stageId, -1),
                (si.numTasks,
                  m.shuffleReadMetrics.totalBytesRead / 1e6,
                  m.shuffleWriteMetrics.bytesWritten / 1e6),
                (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
            }
            override def onJobEnd(je: SparkListenerJobEnd): Unit = {
              Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
                val agg = stageAgg.getOrDefault(je.jobId, (0, 0.0, 0.0))
                rows.add(JobRow(je.jobId, desc,
                  (System.nanoTime() - t0) / 1000000L, 0, agg._1, agg._2, agg._3))
              }
            }
          }
          // warm run (codegen/classloader), matching the bench's min-of-2
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(e) =>
            println(s"PROBE_WARM_FAIL $key ${e.getClass.getSimpleName}: ${e.getMessage}") }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener bus is async and its waitUntilEmpty is private[spark];
          // a short sleep is fine for a local probe tool
          Thread.sleep(800)
          spark.sparkContext.removeSparkListener(listener)
          println(f"PROBE_TOTAL $key%s wall=$wall%.3f s rows=$n%d jobs=${rows.size()}%d")
          import scala.jdk.CollectionConverters._
          rows.asScala.toSeq.sortBy(-_.wallMs).take(25).foreach { r =>
            println(f"PROBE_JOB ${r.id}%4d ${r.wallMs}%7d ms tasks=${r.tasks}%5d " +
              f"shR=${r.shuffleReadMB}%8.2f MB shW=${r.shuffleWriteMB}%8.2f MB  ${r.desc.take(80)}%s")
          }
        }
      } finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }
  }
}
