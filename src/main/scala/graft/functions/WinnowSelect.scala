package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, IntegerLiteral, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document winnowing selection (Schleimer, Wilkerson, Aiken,
  * SIGMOD '03) as ONE native codegen'd Catalyst expression:
  * `winnow_select(text, k, w)` returns the DISTINCT packed
  * `hash·2²⁰ + (2²⁰−1−pos)` fingerprint keys — the same values the
  * original `transform(sequence(...), i -> rolling_hash(substr(...)))` +
  * `slice`/`array_min`/`array_distinct` pipeline produced, computed in
  * one compiled pass per document.
  *
  * Why an expression and not the higher-order-function pipeline it
  * replaces: Spark evaluates lambda bodies INTERPRETED, and the
  * interpreted plan allocates a UTF8String + java String per k-gram
  * (`substr` + `toString`) and an array per window (`slice`) — measured
  * 4.6 s for the fingerprint pass over 16.7M chars at the 10× lane
  * point vs ~1 s compiled. Here the k-gram hashes land in one long
  * array, window minima come from an O(n) monotonic deque, and dedup is
  * sort+unique — zero per-k-gram allocations, inside whole-stage
  * codegen.
  *
  * Parity contract (shared with [[RollingHash]] and the DuckDB oracle):
  * UTF-16 code-unit iteration — identical to codepoint iteration for
  * ASCII and the BMP; the hash is `h·31 + unit mod (2³¹−1)`; positions
  * are 1-based; ties cannot occur in the window minimum because the
  * packed position term makes keys distinct within a document. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_select requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.select($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)

  override def prettyName: String = "winnow_select"
}

object WinnowSelect {
  /** Packing base: positions occupy the low 20 bits (caps documents at
    * 2²⁰−1 chars — enforced here AND by the caller's raise_error guard,
    * which names the offending document id). */
  final val PosBase: Long = 1L << 20

  /** Called from generated code — public, static-shaped. */
  def select(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n >= PosBase)
      throw new IllegalArgumentException(
        s"winnow_select: document length $n >= 2^20 packing cap; chunk long documents first")
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val keys = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = i
      val end = i + k
      while (j < end) {
        h = (h * 31 + str.charAt(j)) % 2147483647L
        j += 1
      }
      // original 1-based position i+1, packed rightmost-tie-break style
      keys(i) = h * PosBase + (PosBase - 2L - i)
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val minima = new Array[Long](nw)
    // O(m) sliding-window minimum: monotonic deque of key indices
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    var p = 0
    while (p < m) {
      while (tail > head && keys(deque(tail - 1)) >= keys(p)) tail -= 1
      deque(tail) = p
      tail += 1
      if (deque(head) < p - w + 1) head += 1
      if (p >= w - 1) minima(p - w + 1) = keys(deque(head))
      p += 1
    }
    // shorter-than-one-window document: a single window over all keys
    if (m < w) minima(0) = keys(deque(head))
    java.util.Arrays.sort(minima)
    var out = 0
    var q = 0
    while (q < nw) {
      if (q == 0 || minima(q) != minima(q - 1)) {
        minima(out) = minima(q)
        out += 1
      }
      q += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(minima, out))
  }

  /** Register `winnow_select(text, k, w)` (k and w must be integer
    * literals) in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_select",
      exprs => {
        def litInt(e: Expression): Int = e match {
          case IntegerLiteral(v) => v
          case other => throw new IllegalArgumentException(
            s"winnow_select: k and w must be integer literals, got $other")
        }
        WinnowSelect(exprs.head, litInt(exprs(1)), litInt(exprs(2)))
      },
      "built-in")
}
