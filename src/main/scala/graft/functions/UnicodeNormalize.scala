package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst `Expression` — Spark has
  * no built-in Unicode-normalize function, and text corpora routinely mix
  * precomposed ("é") and combining ("e" + U+0301) forms that defeat exact
  * dedup, tokenization and fingerprinting unless canonicalized first.
  *
  * Codegen'd (`doGenCode` → a static call into `Normalizer`), so the
  * normalization runs inside whole-stage codegen at scan speed with no UDF
  * serialization penalty — the same pattern as [[RollingHash]]. DuckDB's
  * `nfc_normalize` implements the identical Unicode canonical composition,
  * which makes this custom expression oracle-verifiable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Called from generated code — must stay public and static-shaped.
    * Skips the (allocating) normalize call for strings that are already in
    * NFC, which is the overwhelmingly common case in real corpora. */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Register `graft_nfc_normalize` in the session registry (the
    * VectorOps/RollingHash pattern for building Columns from a custom
    * Expression without private Column constructors). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")

  /** Column builder (requires [[register]] on the session first). */
  def nfc(c: Column): Column = call_function("graft_nfc_normalize", c)

  /** Canonical text-normalization pipeline for corpus preprocessing:
    * NFC-compose, lowercase, collapse whitespace runs to single spaces,
    * trim. Every step has an exact DuckDB twin
    * (`nfc_normalize` / `lower` / `regexp_replace(…, '\s+', ' ', 'g')` /
    * `trim`), so normalized text is engine-portable — the property that
    * makes cross-engine dedup of a shared corpus possible at all. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(nfc(c)), "\\s+", " "))
}
