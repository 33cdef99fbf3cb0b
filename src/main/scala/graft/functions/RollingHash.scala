package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * `h_k = (h_{k-1} * 31 + char_k) mod (2^31 - 1)`, `h_0 = 0`.
  *
  * A native Catalyst `Expression` with code generation — the hot loop runs
  * inside whole-stage codegen with no boxing and no UDF serialization
  * penalty, so fingerprinting stays scan-speed at 100 TB. The identical
  * fold is expressible in DuckDB (`list_reduce` over `ord()` codepoints),
  * which makes this custom expression oracle-verifiable.
  *
  * Character semantics: iterates UTF-16 code units; identical to codepoint
  * iteration for ASCII and the BMP (the declared contract for fingerprint
  * parity).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** 2^31 − 1 (Mersenne prime): keeps `h * 31 + c` well inside Long range. */
  final val Modulus = 2147483647L

  /** Called from generated code — must stay public, static-shaped and cheap. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * 31 + str.charAt(i)) % Modulus
      i += 1
    }
    h
  }

  /** Register `rolling_hash` in the session's function registry so it is
    * usable from `expr("rolling_hash(c)")` and SQL text. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
