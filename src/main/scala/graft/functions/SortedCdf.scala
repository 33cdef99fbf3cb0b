package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Normalized mid-rank CDF lookup against a fixed sorted split array —
  * the per-row half of the KLL-approximate Spearman path
  * ([[graft.profiler.Correlation.spearmanApprox]]).
  *
  * Given K split points taken from a column's KLL sketch at evenly
  * spaced interior probabilities i/(K+1), a value `v` maps to
  * `(lowerBound(v) + upperBound(v)) / (2·(K+1))` — the midpoint of the
  * CDF span the splits assign to `v`. For a value tied across a run of
  * equal splits (a heavy discrete mass) this is exactly the normalized
  * AVERAGE rank of the tie group up to sketch resolution, matching the
  * average-tie-rank convention of the exact Spearman twin (the constant
  * 1/(2n) offset between the two conventions is uniform and cancels in
  * Pearson).
  *
  * A custom Catalyst expression with codegen: two tight binary searches
  * over a referenced double[] per row — no lambda interpretation, no
  * per-row allocation; the split array rides along as a codegen
  * reference object, never a per-row argument. The second argument must
  * be a FOLDABLE array<double> literal (the splits). */
case class SortedCdf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_sorted_cdf requires (double, foldable array<double>), " +
            s"got ${left.dataType.catalogString} and " +
            right.dataType.catalogString)
    }

  @transient private lazy val splits: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    SortedCdfOps.midrank(v.asInstanceOf[Double], splits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("splits", splits, "double[]")
    defineCodeGen(ctx, ev, (v, _) =>
      s"graft.functions.SortedCdfOps.midrank($v, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCdf =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_cdf"
}

object SortedCdfOps {

  /** `(#splits < v  +  #splits ≤ v) / (2·(K+1))` via two binary
    * searches — the mid-rank CDF estimate described on [[SortedCdf]].
    * Shared by interpreted eval and generated code (identical results
    * by construction). */
  def midrank(v: Double, splits: Array[Double]): Double = {
    var lo = 0
    var hi = splits.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (splits(m) < v) lo = m + 1 else hi = m
    }
    val lower = lo
    hi = splits.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (splits(m) <= v) lo = m + 1 else hi = m
    }
    (lower + lo) / (2.0 * (splits.length + 1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_cdf", exprs => SortedCdf(exprs(0), exprs(1)), "built-in")
}
