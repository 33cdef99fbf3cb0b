package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `numHashes` MinHash signature components of a shingle array in ONE
  * codegen'd pass — the map-side signature primitive for streaming-side
  * dedup, where a groupBy signature is unavailable (a stream row must
  * carry its own signature).
  *
  * Bit-parity contract (the thing that makes stream and batch verdicts
  * agree): component i equals `min(xxhash64(lit(i), shingle))` over the
  * array — Spark's XxHash64 with default seed 42 hashes the int literal
  * first (`XXH64.hashInt(i, 42)`) and that value seeds the string hash,
  * so this expression precomputes the `numHashes` int-seeds once and
  * runs `XXH64.hashUnsafeBytes` per (element, seed) via the same static
  * kernel the built-in uses. Asserted against the built-in expression
  * tree by MinhashSigsSpec and end-to-end by `streaming_state_dedup_audit`
  * (stream verdicts ≡ batch groupBy-signature verdicts).
  *
  * Why it exists (r16 optimization, guide §4 "eliminate non-codegen
  * expressions in the hot path"): the r15 shape —
  * `array_min(transform(sh_arr, s => xxhash64(lit(i), s)))` × 32 —
  * evaluates the lambda INTERPRETED per element per component (measured
  * 7.3 s of the streaming_state_dedup key's 10.3 s at sf0.1); this
  * expression is one static call per row, whole-stage-codegen friendly,
  * and hashes each element's bytes without per-call allocation.
  *
  * Returns `array<bigint>` of length `numHashes`; an EMPTY input array
  * yields NULL (the `when(size > 0, ...)` semantics of the r15 shape). */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"minhash_sigs: numHashes=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigs.compute($c, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinhashSigs {

  /** seed_i = XXH64.hashInt(i, 42) — exactly what Spark's
    * `xxhash64(lit(i), s)` computes before hashing the string; cached
    * per numHashes (a handful of distinct values per JVM). */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private[functions] def seedsFor(numHashes: Int): Array[Long] = seeds(numHashes)

  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, n => {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = XXH64.hashInt(i, 42L); i += 1 }
      out
    })

  /** Static kernel, called from generated code ([[RollingHash]] pattern).
    * Null (not an empty array) for an empty input. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val sd = seeds(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var k = 0
    while (k < n) {
      val s = arr.getUTF8String(k)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off, len, sd(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  private[functions] def litInt(e: Expression, what: String): Int =
    if (e.foldable) e.eval() match {
      case i: Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case other => sys.error(s"$what: bad literal $other")
    } else sys.error(s"$what must be a literal")

  /** Register `minhash_sigs(arr, k)` and `minhash_sigs_tokens(toks, n, k)`
    * for `call_function`/SQL use; the int arguments must be foldable. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs",
      exprs => {
        require(exprs.length == 2, "minhash_sigs(arr, numHashes)")
        MinhashSigs(exprs.head, litInt(exprs(1), "minhash_sigs numHashes"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs_tokens",
      exprs => {
        require(exprs.length == 3, "minhash_sigs_tokens(toks, n, numHashes)")
        MinhashSigsTokens(exprs.head,
          litInt(exprs(1), "minhash_sigs_tokens n"),
          litInt(exprs(2), "minhash_sigs_tokens numHashes"))
      },
      "built-in")
  }
}

/** [[MinhashSigs]] fused one step earlier: token array → n-gram shingles
  * → all `numHashes` signature minima, one codegen'd pass, no
  * intermediate shingle-array materialization. Bit-parity contract:
  * component i equals
  * `min(xxhash64(lit(i), array_join(slice(toks, w+1, n), " ")))` over
  * every window w — the shingle string is built with the same single
  * space `array_join` uses (UTF8String.concatWs), and duplicates don't
  * matter under min, so skipping `array_distinct` changes nothing.
  * Fewer than `n` tokens yields NULL (the `when(size ≥ n)` semantics of
  * the expression chain it replaces). r16: the interpreted
  * transform+array_join+array_distinct chain was the residual hot path
  * of streaming_state_dedup after the signature lambda fix. */
case class MinhashSigsTokens(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n > 0 && numHashes > 0,
    s"minhash_sigs_tokens: n=$n numHashes=$numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs_tokens requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigsTokens.compute(input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigsTokens.compute($c, $n, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigsTokens =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs_tokens"
}

object MinhashSigsTokens {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static kernel, called from generated code. Null when the token
    * array has fewer than `n` elements (no shingles). */
  def compute(toks: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return null
    val sd = MinhashSigs.seedsFor(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var w = 0
    while (w <= cnt - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(w + j); j += 1 }
      val s = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off, len, sd(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
