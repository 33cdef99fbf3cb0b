package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application: replace every non-overlapping adjacent
  * `(left, right)` symbol pair in the sequence with the concatenated
  * symbol, scanning LEFT TO RIGHT (the standard greedy order — in
  * `a a a` merging `(a,a)` produces `aa a`, not `a aa`). The kernel of
  * [[graft.operators.BpeInduction]]'s iterative vocabulary induction.
  *
  * A codegen'd Catalyst expression: the merge runs once per vocabulary
  * word per iteration, inside whole-stage codegen with no lambda
  * interpretation (the WinnowSelect precedent). The identical greedy scan
  * is a `list_reduce` fold in DuckDB (an accumulator list whose last
  * element either absorbs the next symbol or not), which makes every
  * iteration oracle-verifiable. */
case class BpeMergeStep(arr: Expression, left: Expression, right: Expression)
    extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = left
  override def third: Expression = right

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (arr.dataType.isInstanceOf[ArrayType] &&
      arr.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bpe_merge_step requires (array<string>, string, string), got " +
        Seq(arr, left, right).map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(a: Any, l: Any, r: Any): Any =
    BpeMergeStep.merge(
      a.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, l, r) =>
      s"graft.functions.BpeMergeStep.merge($a, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMergeStep =
    copy(arr = newFirst, left = newSecond, right = newThird)

  override def prettyName: String = "bpe_merge_step"
}

object BpeMergeStep {

  /** Called from generated code — public, static-shaped. */
  def merge(arr: ArrayData, left: UTF8String, right: UTF8String): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new Array[UTF8String](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(left) && arr.getUTF8String(i + 1).equals(right)) {
        out(o) = UTF8String.concat(left, right)
        i += 2 // non-overlapping: the merged symbol cannot re-merge this pass
      } else {
        out(o) = cur
        i += 1
      }
      o += 1
    }
    if (o == n) arr
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], o))
  }

  /** Register `bpe_merge_step(symbols, left, right)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_merge_step",
      exprs => BpeMergeStep(exprs.head, exprs(1), exprs(2)),
      "built-in")
}
