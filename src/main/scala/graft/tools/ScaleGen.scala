package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-lane data generator: blows the driver's sf0.1 testdata up by an
  * integer factor so the bench can measure how query time GROWS with data
  * size (the empirical "would it survive 100×?" check from VERDICT r7
  * task 4). This is a BENCH-ONLY derivation of the driver's own parquet —
  * correctness still runs exclusively on `/root/testdata` — and it never
  * writes outside the repo.
  *
  * Replication scheme (copy i of K):
  *  - fact keys shift by `i * (max_key + 1)` so each copy is a disjoint
  *    key range; FK columns shift by the SAME stride as their parent PK,
  *    preserving join selectivity and fan-out exactly (a join that hit
  *    4 rows per key at sf0.1 still hits 4 at sf1);
  *  - `nation`/`region` stay as-is (dimension semantics — broadcast side
  *    stays broadcast-sized at any sf, as it would at 100 TB);
  *  - `documents.text` gets a copy-salt token injected between words so
  *    the K copies are NOT cross-copy near-duplicates: each copy behaves
  *    like an independent sf0.1 corpus, keeping shingle/MinHash workload
  *    linear in K instead of manufacturing artificial K-sized dup
  *    clusters that no organic corpus would have;
  *  - `events` keeps the time range and shifts `user_id`/`event_id`:
  *    volume grows K× over the same period (more users, same window) —
  *    the realistic shape for sessionization/watermark work;
  *  - `embeddings` shifts `vec_id` only; identical vectors across copies
  *    leave top-k and threshold-pair workloads linear in K.
  */
object ScaleGen {
  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "target/sf1")
    val k = sys.env.get("SPARK_GRAFT_SCALE_K")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 1).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame = spark.read.parquet(s"$srcDir/$name.parquet")

    def replicate(df: DataFrame, shifts: Map[String, Long],
                  saltText: Option[String] = None): DataFrame = {
      val copies = (0 until k).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i.toLong * s)) }
        saltText.fold(shifted) { tc =>
          // inject a copy-specific token between words so cross-copy
          // shingle overlap vanishes (copy 0 keeps the original text so
          // sf0.1-verified answers remain a subset)
          if (i == 0) shifted
          else shifted.withColumn(
            tc, regexp_replace(col(tc), " ", s" c$i "))
        }
      }
      copies.reduce(_ unionAll _)
    }

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"wrote $name x$k")
    }

    val lineitem = read("lineitem"); val orders = read("orders")
    val customer = read("customer"); val part = read("part")
    val supplier = read("supplier"); val documents = read("documents")
    val embeddings = read("embeddings"); val events = read("events")

    val sOrder = stride(orders, "o_orderkey")
    val sCust = stride(customer, "c_custkey")
    val sPart = stride(part, "p_partkey")
    val sSupp = stride(supplier, "s_suppkey")

    write(replicate(lineitem, Map(
      "l_orderkey" -> sOrder, "l_partkey" -> sPart, "l_suppkey" -> sSupp)),
      "lineitem")
    write(replicate(orders, Map(
      "o_orderkey" -> sOrder, "o_custkey" -> sCust)), "orders")
    write(replicate(customer, Map("c_custkey" -> sCust)), "customer")
    write(replicate(part, Map("p_partkey" -> sPart)), "part")
    write(replicate(supplier, Map("s_suppkey" -> sSupp)), "supplier")
    write(replicate(documents,
      Map("doc_id" -> stride(documents, "doc_id")),
      saltText = Some("text")), "documents")
    write(replicate(embeddings,
      Map("vec_id" -> stride(embeddings, "vec_id"))), "embeddings")
    write(replicate(events, Map(
      "event_id" -> stride(events, "event_id"),
      "user_id" -> stride(events, "user_id"))), "events")
    // dimension tables pass through unchanged
    Seq("nation", "region").foreach(n => write(read(n), n))
    spark.stop()
  }
}
