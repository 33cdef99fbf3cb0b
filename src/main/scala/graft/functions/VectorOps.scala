package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double elements).
  *
  * A custom Catalyst `Expression` with code generation: the
  * `zip_with(...)` + `aggregate(...)` formulation allocates an intermediate
  * 64-element array per pair and evaluates two lambda closures per element;
  * this expression is one tight primitive loop, which matters when the
  * similarity operators score millions of candidate pairs. The fold is the
  * identical left-to-right double accumulation starting at 0.0, so results
  * are bit-for-bit the same as the higher-order-function form and the
  * DuckDB `list_reduce` oracle.
  *
  * Contract: element arrays contain no nulls (embedding vectors); lengths
  * are expected equal (the loop runs over the shorter).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_vector_dot requires array<float|double> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dot(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorOps.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vector_dot"
}

/** All LSH band keys of a vector under deterministic ±1 random hyperplanes:
  * `bands` independent bands of `bitsPerBand` sign bits each (an
  * OR-construction — a pair is a near-dup candidate if ANY band key
  * collides). Key encoding: `(band << bitsPerBand) | bits`, so keys are
  * globally unique across bands and a single `explode` + equi-join on the
  * key replaces a corpus-wide cross join.
  *
  * The hyperplane for global plane index `p = band * bitsPerBand + bit` is
  * the same splitmix64 ±1 pattern as
  * [[graft.operators.Similarity.hyperplanes]] (cross-checked in tests), so
  * band 0 of a `(1, k)` call equals `Similarity.lshBucket` with `k` planes.
  */
case class VectorLshBands(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 56,
    "bands > 0 and 0 < bitsPerBand <= 56 required")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_vector_lsh_bands requires an array<float|double> argument, got ${t.catalogString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.lshBands(v.asInstanceOf[ArrayData], isFloat, bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.lshBands($v, $isFloat, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): VectorLshBands =
    copy(child = newChild)

  override def prettyName: String = "graft_vector_lsh_bands"
}

object VectorOps {

  /** Called from generated code. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Deterministic ±1 hyperplane sign for (plane p, dimension d) —
    * splitmix64 mix, the single source of truth shared with
    * [[graft.operators.Similarity.hyperplanes]]. */
  def planeSign(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  // The ±1 plane matrix depends only on (planes, dim): computed once per
  // JVM and shared across rows/tasks (2 MB at 4096 planes × 64 dims) so the
  // per-row work is a pure multiply-add loop, not hashing. Bounded: an
  // embedding corpus has one (or very few) vector dimensions — many
  // distinct dims means ragged upstream data, and an unbounded cache would
  // retain one matrix per dim forever on every executor.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private val PlaneCacheMax = 8

  private def planes(n: Int, dim: Int): Array[Array[Double]] = {
    if (planeCache.size > PlaneCacheMax) planeCache.clear()
    planeCache.computeIfAbsent(
      (n, dim), _ => Array.tabulate(n, dim)((p, d) => planeSign(p, d)))
  }

  /** Called from generated code: all `bands` LSH band keys of one vector. */
  def lshBands(v: ArrayData, vFloat: Boolean, bands: Int, bitsPerBand: Int): ArrayData = {
    val dim = v.numElements()
    val pl = planes(bands * bitsPerBand, dim)
    val keys = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var key = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val plane = pl(band * bitsPerBand + bit)
        var proj = 0.0
        var d = 0
        while (d < dim) {
          val x = if (vFloat) v.getFloat(d).toDouble else v.getDouble(d)
          proj += x * plane(d)
          d += 1
        }
        if (proj >= 0) key |= (1L << bit)
        bit += 1
      }
      keys(band) = (band.toLong << bitsPerBand) | key
      band += 1
    }
    new GenericArrayData(keys)
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vector_lsh_bands",
      exprs => VectorLshBands(
        exprs(0), litInt(exprs(1), "bands"), litInt(exprs(2), "bitsPerBand")),
      "built-in")
  }

  /** Column builder (requires [[register]] on the session first). */
  def vectorDot(a: Column, b: Column): Column = call_function("graft_vector_dot", a, b)

  /** Column builder (requires [[register]] on the session first). */
  def vectorLshBands(v: Column, bands: Int, bitsPerBand: Int): Column =
    call_function("graft_vector_lsh_bands", v, lit(bands), lit(bitsPerBand))
}
