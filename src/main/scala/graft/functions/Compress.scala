package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compressed size of a string's UTF-8 bytes — the classic
  * compression-ratio quality signal (E72).
  *
  * `deflate_len(text) / octet_length(text)` approximates the text's
  * Kolmogorov density: machine-generated spam, keyword stuffing and
  * template boilerplate compress far below prose, and near-random noise
  * sits near 1. CCNet/RefinedWeb-style pipelines use exactly this ratio
  * as a cheap model-free quality filter; it complements the repetition
  * metrics (E26) — those catch short-range loops, DEFLATE's LZ77 window
  * catches structure up to 32 KiB apart.
  *
  * Implemented as a codegen-capable Catalyst expression (the Deflater
  * call dominates, but the expression stays inside the WholeStageCodegen
  * span — no UDF serialization boundary, no row-at-a-time encoder). Each
  * call uses a fresh JDK Deflater in raw (nowrap) mode at the fixed
  * level; output length for a given input is deterministic for a given
  * zlib, and the operator contract is ORDINAL (thresholds are calibrated
  * per corpus, like lm_quality's scores), so no cross-engine oracle is
  * declared — correctness is pinned by invariant tests (bounds,
  * determinism, repetitive << random) instead.
  */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Compress.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Compress.deflateLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)

  override def prettyName: String = "deflate_len"
}

object Compress {

  /** Fixed compression level: 6 is zlib's default speed/size trade and
    * part of the (ordinal) contract — changing it rescales every score. */
  final val Level = 6

  /** Called from generated code — public, static-shaped. Raw-deflate
    * (nowrap) so the 6-byte zlib envelope doesn't bias short strings. */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(Level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      n
    } finally d.end()
  }

  /** Register `deflate_len` for `expr(...)`/SQL use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", exprs => DeflateLength(exprs.head), "built-in")
}
