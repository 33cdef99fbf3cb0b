package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Jaro '89, Winkler '90) as a native Catalyst
  * `Expression` with code generation — the second string-distance
  * primitive on the entity-resolution shelf next to Spark's built-in
  * `levenshtein` (E101/E249 verdicts): Levenshtein counts edits, J-W
  * weights AGREEMENT with a transposition discount plus Winkler's
  * common-prefix boost, which is the scorer record-linkage practice
  * (Census merge/purge, Febrl, Splink) actually ranks candidate pairs
  * with — typo'd names score ~0.9+ where a 2-edit Levenshtein on a
  * short string reads as far.
  *
  * Semantics pinned to the published algorithm AND bit-for-bit to
  * DuckDB's `jaro_winkler_similarity` (the oracle's independent
  * implementation, rapidfuzz lineage), verified over its edge cases:
  *  - operates on UTF-8 BYTES (both engines; 'café' vs 'cafe' reads
  *    5-vs-4 units), match window `max(l1,l2)/2 − 1` floored at 0,
  *  - either side empty → 0.0 (INCLUDING both-empty — not the 1.0
  *    some libraries return), zero matches → 0.0,
  *  - transpositions = half the order-mismatched match positions,
  *  - Winkler boost `jw = j + min(prefix,4)·0.1·(1−j)` applied only
  *    when `j > 0.7` (strict; a prefix pair at j ≤ 0.7 stays at j).
  *
  * The hot loop is a branch-free-ish two-scan over stack arrays called
  * statically from generated code (the [[RollingHash]] pattern): no
  * boxing, no UDF serialization, whole-stage codegen keeps pair scoring
  * scan-speed inside the blocked join a 100 TB linkage runs. O(l1·l2)
  * worst case like every J-W; candidate keys are name-length. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  /** Called from generated code — public, static-shaped, allocation-light. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // order-mismatches between the two matched subsequences
    var k = 0
    var halfT2 = 0 // twice nothing — count of mismatched positions
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) halfT2 += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - halfT2 / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Register `jaro_winkler` so `expr("jaro_winkler(a, b)")` and SQL
    * text resolve it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
}
