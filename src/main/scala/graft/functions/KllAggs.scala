package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

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
  * Implemented as native [[TypedImperativeAggregate]]s (the same plan
  * shape as `hll_sketch_agg`/`percentile_approx`: ObjectHashAggregate with
  * the live sketch as the buffer object, serialization only at shuffle/
  * spill boundaries) rather than a `udaf(Aggregator)` wrapper, which pays
  * an encoder round trip per input row.
  *
  * Note: KLL compaction is randomized (per the KLL paper), so repeated
  * runs give slightly different — always error-bounded — estimates; these
  * metrics are declared approximate (no oracle), like ApproxCountDistinct.
  */
object KllAggs {

  private[graft] val K = 200 // sketch size parameter: ~1.65% rank error, ~3 KB

  private def sketchOf(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Shared shape of both sketch aggregates. Declares its input type so a
    * mistyped column fails analysis (with a cast attempt) instead of a
    * runtime ClassCastException mid-job. */
  sealed trait KllAggBase
      extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {
    /** Declared input type of the aggregate (checked at analysis). */
    protected def expectedInputType: DataType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == expectedInputType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ${expectedInputType.catalogString} input, " +
          s"got ${child.dataType.catalogString}")
    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(K)
    override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
      b.merge(o); b
    }
    override def eval(b: KllDoublesSketch): Any = b.toByteArray
    override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def deserialize(storage: Array[Byte]): KllDoublesSketch = {
      // heapified compact sketches are read-only; merge into a writable one
      val fresh = KllDoublesSketch.newHeapInstance(K)
      fresh.merge(sketchOf(storage))
      fresh
    }
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
  }

  /** `double` values → serialized KLL sketch (NULL inputs skipped). */
  case class KllSketchAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KllAggBase {
    override protected def expectedInputType: DataType = DoubleType
    override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) b.update(v.asInstanceOf[Double])
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_sketch_agg"
  }

  /** Serialized sketches → merged serialized sketch (the state-merge side,
    * mirroring `hll_union_agg`). */
  case class KllMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0) extends KllAggBase {
    override protected def expectedInputType: DataType = BinaryType
    override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) {
        val bytes = v.asInstanceOf[Array[Byte]]
        if (bytes.nonEmpty) b.merge(sketchOf(bytes))
      }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_kll_merge_agg"
  }

  /** Scalar quantile extraction from a serialized sketch column:
    * `graft_kll_quantiles(sketch, array(p₁,…,p_k))` → `array<double>`
    * (null for a null/empty sketch). The distributed half of the
    * per-GROUP quantile battery (E82's scale mode): after
    * `groupBy(g).agg(kllSketchAgg(v))` the estimates come out where the
    * group rows sit — no driver collect, so a 10⁸-group rollup never
    * funnels sketch bytes through the driver. The probability array
    * must be a foldable literal; evaluation runs once per GROUP row
    * (never per data row), so the heapify-per-call cost is off the hot
    * path by construction. */
  case class KllQuantilesExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    // CodegenFallback is deliberate: evaluated once per GROUP row, never
    // per data row — see the scaladoc
    import org.apache.spark.sql.types.ArrayType
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, ArrayType(DoubleType, _)) if right.foldable =>
          TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "graft_kll_quantiles requires (binary, foldable array<double>)")
      }
    @transient private lazy val ps: Array[Double] =
      right.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray()
    override protected def nullSafeEval(b: Any, ignored: Any): Any = {
      val bytes = b.asInstanceOf[Array[Byte]]
      if (bytes.isEmpty) null
      else {
        val sk = sketchOf(bytes)
        if (sk.isEmpty) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(
          ps.map(p => sk.getQuantile(p)))
      }
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): KllQuantilesExpr =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_kll_quantiles"
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll_sketch_agg",
      exprs => KllSketchAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll_merge_agg",
      exprs => KllMergeAgg(exprs(0)).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kll_quantiles",
      exprs => KllQuantilesExpr(exprs(0), exprs(1)), "built-in")
  }

  /** Aggregate a double column into a serialized KLL sketch (requires
    * [[register]] on the session first). */
  def kllSketchAgg(v: Column): Column = call_function("graft_kll_sketch_agg", v)

  /** Merge a column of serialized KLL sketches (requires [[register]]). */
  def kllMergeAgg(sketch: Column): Column = call_function("graft_kll_merge_agg", sketch)

  /** Quantile estimates at probabilities `ps` from a serialized sketch
    * (inclusive rank semantics); None for an empty sketch. Runs on
    * metric-sized relations (one row per profiled column), never the data
    * path. */
  def quantiles(bytes: Array[Byte], ps: Seq[Double]): Option[Seq[Double]] = {
    if (bytes == null || bytes.isEmpty) return None
    val sk = sketchOf(bytes)
    if (sk.isEmpty) None else Some(ps.map(p => sk.getQuantile(p)))
  }
}
