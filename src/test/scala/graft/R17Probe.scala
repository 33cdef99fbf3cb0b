package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway r17 measurement aid (never run by the driver): intermediate
  * cardinalities/bytes of the chunked substring front-end, to size the
  * candidate-join restructure before writing it. */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    println("PROBE docs=" + df.count() +
      " textBytes=" + df.agg(sum(length(col("text")))).head().getLong(0))
    val k = 8; val w = 4
    // inline charChunks (private[operators])
    val chunkChars = 1 << 19
    val stride = chunkChars - (k - 1)
    val n = coalesce(length(col("text")), lit(0))
    val lastIdx = when(n > chunkChars,
      ceil((n - chunkChars).cast("double") / stride).cast("int"))
      .otherwise(lit(0))
    val ch = df.select(col("doc_id").as("id"), col("text").as("txt"),
      explode(when(n > 0, sequence(lit(0), lastIdx)).otherwise(
        array().cast("array<int>"))).as("ci"))
      .select(
        col("id"), col("ci").cast("long").as("ci"),
        (col("ci").cast("long") * stride).as("off"),
        expr(s"substring(txt, ci * $stride + 1, $chunkChars)").as("t"))
      .localCheckpoint(true)
    println("PROBE chunks=" + ch.count())
    val rep = graft.operators.Dedup.chunkedAnchorSites(ch, k, w, chunkChars)
    println("PROBE anchorSites=" + rep.count())
    val kept = rep.join(
      rep.groupBy("doc", "hash").agg(count(lit(1)).as("occ"))
        .where(col("occ") <= 32).select("doc", "hash"),
      Seq("doc", "hash"))
    println("PROBE keptSites=" + kept.count())
    val pairs = kept.select(col("doc"), col("hash"), col("gpos").as("g1"),
      col("ci").as("ci1"), col("pos").as("p1"))
      .join(kept.select(col("doc"), col("hash"), col("gpos").as("g2"),
        col("ci").as("ci2"), col("pos").as("p2")), Seq("doc", "hash"))
      .where(col("g1") < col("g2"))
    println("PROBE candidatePairs=" + pairs.count())
    println("PROBE chunkPairGroups=" +
      pairs.groupBy("doc", "ci1", "ci2").count().count())
    println("PROBE maxPairsPerChunkPair=" +
      pairs.groupBy("doc", "ci1", "ci2").count()
        .agg(max("count")).head().getLong(0))
    spark.stop()
  }
}
