package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown for the winnow near-dup lane rows (r10):
  * times the fingerprint pass, the frequency/guard aggregation and the
  * full pair pipeline separately, per scale-lane directory.
  *
  * Run: `sbt "Test/runMain graft.WinnowLab [dirs...]"` */
object WinnowLab {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/sf1", "target/sf1cs")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- dirs) {
      val docs = spark.read.parquet(s"$d/documents.parquet")
      PerfLab.time(s"$d fingerprints+distinct") {
        graft.operators.Dedup
          .winnowFingerprints(docs, "doc_id", "text")
          .select(col("id"), col("hash")).distinct().count()
        ()
      }
      val fp = graft.operators.Dedup
        .winnowFingerprints(docs, "doc_id", "text")
        .select(col("id"), col("hash")).distinct().localCheckpoint(true)
      println(s"  fp rows: ${fp.count()}")
      PerfLab.time(s"$d freq agg") {
        fp.groupBy("hash").agg(count(lit(1))).count(); ()
      }
      val freq = fp.groupBy("hash").agg(count(lit(1)).as("bf"))
      val kept = fp.join(
        freq.where(col("bf") <= 128).select(col("hash"), col("bf")),
        Seq("hash"))
      PerfLab.time(s"$d kept join") { kept.count(); () }
      // df histogram + full-join vs prefix-join candidate volumes
      val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      val ranked = kept
        .withColumn("nf", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(w.orderBy(col("bf"), col("hash"))))
      val prefix = ranked
        .where(col("rn") <= col("nf") - ceil(col("nf") * lit(0.5)) + lit(1))
      def cpairs(r: org.apache.spark.sql.DataFrame): Long =
        r.groupBy("hash").agg(count(lit(1)).as("f"))
          .agg(coalesce(sum(col("f") * (col("f") - 1) / 2), lit(0L))
            .cast("long")).head().getLong(0)
      println(s"  full candidates: ${cpairs(kept)}  " +
        s"prefix candidates: ${cpairs(prefix.select(col("id"), col("hash")))}")
      println("  df deciles: " + freq.where(col("bf") <= 128)
        .select(col("bf")).stat.approxQuantile("bf",
          Array(0.5, 0.9, 0.99, 1.0), 0.001).mkString(","))
      for (cap <- Seq(16, 32, 64)) {
        val kc = fp.join(
          freq.where(col("bf") <= cap).select(col("hash"), col("bf")),
          Seq("hash"))
        val rc = kc.withColumn("nf", count(lit(1)).over(w))
          .withColumn("rn",
            row_number().over(w.orderBy(col("bf"), col("hash"))))
        val pc = rc.where(col("rn") <=
          col("nf") - ceil(col("nf") * lit(0.5)) + lit(1))
        println(s"  cap $cap: full ${cpairs(kc)}  " +
          s"prefix ${cpairs(pc.select(col("id"), col("hash")))}")
      }
      PerfLab.time(s"$d full winnowNearDup") {
        graft.operators.Dedup.winnowNearDup(docs, "doc_id", "text").count()
        ()
      }
      fp.unpersist()
    }
    spark.stop()
  }
}
