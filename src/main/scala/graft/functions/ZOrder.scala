package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleave key — the multi-dimensional clustering
  * primitive behind "OPTIMIZE ZORDER BY"-style layout optimization: a
  * range-partition + sort on the interleaved key co-locates rows that
  * are close in EVERY dimension, so per-row-group min/max stats become
  * tight for all of them at once and a filter on ANY keyed column
  * prunes row groups — where a plain sort gives pruning on the leading
  * column only. At 100 TB this is a write-once cost that every
  * subsequent selective scan collects on.
  *
  * Built entirely from codegen'd integer built-ins (shiftleft / & / |)
  * via the standard magic-mask bit-spreading ladder — no UDF, no custom
  * Expression, whole-stage codegen keeps the key computation inside the
  * scan's stage.
  *
  * Keys are first normalized to 16-bit buckets (`bucket16`): rank-free
  * proportional scaling against broadcast min/max literals, so the key
  * is a pure deterministic function of the value and two corpus
  * constants — stable across runs and partitionings. */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at bit 2i
    * (0b1111 → 0b01010101): four magic-mask ladder steps. */
  def spread16(x: Column): Column = {
    val s0 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 4))).bitwiseAND(lit(0x0F0F0F0F))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x33333333))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555))
  }

  /** Proportional 16-bit bucket of `x` in [lo, hi] (corpus min/max,
    * inlined as literals by the caller): 0 for the min, 65535 for the
    * max. The ratio is computed in DOUBLE — a 64-bit integer
    * `(x − lo) · 65535` wraps for domains wider than ~2⁴⁷ (a
    * microsecond-epoch key spans ~2⁴⁸ over a decade) and ANSI-off Spark
    * would return garbage buckets silently; the double path is monotone
    * and exact to far more than the 16 bits kept. Degenerate domains
    * (hi == lo) and nulls map to bucket 0 so every row keeps a sort
    * key. */
  def bucket16(x: Column, lo: Long, hi: Long): Column =
    if (hi <= lo) lit(0)
    else when(x.isNull, lit(0)).otherwise(
      // explicit null branch FIRST: least() SKIPS null arguments, so a
      // null x inside least would bucket to 65535 instead of 0
      least(lit(65535),
        ((x.cast("double") - lit(lo.toDouble)) * 65535.0 /
          lit((hi - lo).toDouble)).cast("int")))

  /** 32-bit Morton key interleaving two 16-bit buckets: a's bit i at
    * 2i, b's at 2i+1. */
  def morton(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))
}
