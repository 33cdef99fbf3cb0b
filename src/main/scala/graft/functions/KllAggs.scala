package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable quantile sketches for the incremental profiler, built on the
  * Apache DataSketches KLL implementation that ships with Spark 4
  * (`/opt/spark/jars/datasketches-java-6.2.0.jar` — the same library
  * backing `hll_sketch_agg`).
  *
  * Why not `percentile_approx`: Spark's Greenwald-Khanna buffers only merge
  * inside one query execution — they cannot be persisted per ingest batch
  * and unioned later. A KLL sketch serializes to a compact byte array
  * (~3 KB at k=200), merges associatively with bounded error (~1.65%
  * normalized rank error), and so supports the profile-100-TB-one-batch-
  * at-a-time operating mode for quantiles exactly like the HLL column does
  * for distinct counts. The reference stack (Deequ 1.0.2) must rescan.
  *
  * Note: KLL compaction is randomized (per the KLL paper), so repeated
  * runs give slightly different — always error-bounded — estimates; these
  * metrics are declared approximate (no oracle), like ApproxCountDistinct.
  */
object KllAggs {

  private val K = 200 // sketch size parameter: ~1.65% rank error, ~3 KB

  /** `Double` values → serialized KLL sketch. Boxed input so SQL NULLs are
    * skipped instead of silently becoming 0.0. */
  private final class SketchAgg
      extends Aggregator[java.lang.Double, KllDoublesSketch, Array[Byte]] {
    override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(K)
    override def reduce(b: KllDoublesSketch, v: java.lang.Double): KllDoublesSketch = {
      if (v != null) b.update(v.doubleValue())
      b
    }
    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    override def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def bufferEncoder: Encoder[KllDoublesSketch] =
      Encoders.kryo[KllDoublesSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized sketches → merged serialized sketch (the state-merge side,
    * mirroring `hll_union_agg`). */
  private final class MergeAgg
      extends Aggregator[Array[Byte], KllDoublesSketch, Array[Byte]] {
    override def zero: KllDoublesSketch = KllDoublesSketch.newHeapInstance(K)
    override def reduce(b: KllDoublesSketch, bytes: Array[Byte]): KllDoublesSketch = {
      if (bytes != null && bytes.nonEmpty)
        b.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
      b
    }
    override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
      a.merge(b); a
    }
    override def finish(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def bufferEncoder: Encoder[KllDoublesSketch] =
      Encoders.kryo[KllDoublesSketch]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a double column into a serialized KLL sketch. */
  def kllSketchAgg(v: Column): Column = udaf(new SketchAgg, Encoders.DOUBLE).apply(v)

  /** Merge a column of serialized KLL sketches. */
  def kllMergeAgg(sketch: Column): Column = udaf(new MergeAgg, Encoders.BINARY).apply(sketch)

  /** Quantile estimates at probabilities `ps` from a serialized sketch
    * (inclusive rank semantics); null for an empty sketch. Runs on
    * metric-sized relations (one row per profiled column), never the data
    * path. */
  def quantiles(bytes: Array[Byte], ps: Seq[Double]): Option[Seq[Double]] = {
    if (bytes == null || bytes.isEmpty) return None
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) None else Some(ps.map(p => sk.getQuantile(p)))
  }
}
