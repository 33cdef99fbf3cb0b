package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist filtering with a Bloom-filter shuffle guard (E69).
  *
  * The curation primitive behind robots.txt opt-outs, spam-domain lists
  * and takedown registries: remove every corpus row whose key appears in
  * a blocklist relation. Semantically a plain left-anti equi-join — and
  * that is exactly what the oracle checks — but joined naively at 100 TB
  * the WHOLE corpus shuffles on the key even though blocked rows are a
  * sliver. A broadcast join fixes that only while the blocklist fits in
  * executor memory; real URL blocklists (hundreds of millions of entries)
  * do not.
  *
  * Scale shape: build a Bloom filter over the blocklist keys (distributed
  * aggregation via `DataFrameStatFunctions.bloomFilter`; only the fixed-size
  * bit array reaches the driver), broadcast the bits, and route map-side:
  *   - `mightContain == false` → DEFINITELY not blocked (Bloom has no
  *     false negatives): the row bypasses the join entirely — no shuffle;
  *   - `mightContain == true` → possibly blocked: only this sliver
  *     (true matches + the fpp share of false positives) flows into the
  *     exact anti-join, which removes real matches and lets false
  *     positives through.
  * The result is therefore EXACT for any fpp; fpp only tunes how much of
  * the corpus pays the join. Null keys are never blocked (SQL join
  * semantics) and take the no-join path.
  */
object Blocklist {

  /** Remove rows of `df` whose `keyCol` appears in `blocklist.blKeyCol`.
    * `expectedItems`/`fpp` size the Bloom filter (bits ∝ items·ln(1/fpp);
    * 1M items at 1% ≈ 1.2 MB broadcast). */
  def filterOut(
      df: DataFrame, keyCol: String,
      blocklist: DataFrame, blKeyCol: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val keys = blocklist.select(col(blKeyCol).cast("string").as(blKeyCol))
    val bloom = keys.stat.bloomFilter(blKeyCol, expectedItems, fpp)
    val bloomBc = df.sparkSession.sparkContext.broadcast(bloom)
    val might = udf { key: String =>
      key != null && bloomBc.value.mightContainString(key)
    }
    val marked = df.withColumn("__bl_might", might(col(keyCol).cast("string")))
    val clean = marked.where(!col("__bl_might"))
    // only the Bloom-positive sliver reaches the exact join; at test scale
    // AQE broadcasts it, at blocklist scale it shuffles this sliver only
    val suspect = marked.where(col("__bl_might"))
      .join(
        keys.select(col(blKeyCol).as("__bl_key")).distinct(),
        marked(keyCol).cast("string") === col("__bl_key"),
        "left_anti")
    clean.unionByName(suspect).drop("__bl_might")
  }
}
