package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inferred-type histogram for string columns — the DataType analyzer of
  * the Deequ family (reference Profiler.scala:333-348 configures the
  * battery; DataType is the one inference analyzer it leaves out), the
  * first question asked of any string-typed landing-zone column: is this
  * REALLY a string, or a number/boolean that lost its type on ingest?
  *
  * Each non-null value is classified by anchored regex (priority order —
  * the classes are mutually exclusive by construction): Boolean
  * (`true`/`false`), Integral (optional sign + digits), Fractional
  * (decimal point, optional exponent), else String; nulls count
  * separately. The column's inferred type follows the Deequ promotion
  * rule: all-Boolean → Boolean; all-Integral → Integral; all-numeric →
  * Fractional; any other non-null value → String; no non-null values →
  * Unknown.
  *
  * Scale shape: ONE map-side-combined global aggregation carrying five
  * codegen'd conditional-count slots per column (the E48/E79 funnel
  * shape — no per-column scans, no shuffle of row data; the exchange
  * moves one partial row per task). The unpivot to one row per column
  * runs over that single aggregate row. Regexes are RE2-compatible so
  * the DuckDB oracle applies the identical patterns. */
object TypeInference {

  val BoolRe = "^(true|false)$"
  val IntRe = "^[-+]?[0-9]+$"
  val FracRe = "^[-+]?([0-9]*\\.[0-9]+|[0-9]+\\.[0-9]*)([eE][-+]?[0-9]+)?$"

  def inferredTypes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to classify")
    val slots = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val v = col(c)
      Seq(
        count(when(v.rlike(BoolRe), 1)).as(s"b_$c"),
        count(when(v.rlike(IntRe), 1)).as(s"i_$c"),
        count(when(v.rlike(FracRe), 1)).as(s"f_$c"),
        count(when(v.isNotNull && !v.rlike(BoolRe) && !v.rlike(IntRe) &&
          !v.rlike(FracRe), 1)).as(s"s_$c"),
        count(when(v.isNull, 1)).as(s"u_$c"))
    }
    val g = df.agg(slots.head, slots.tail: _*)
    val stackArgs = lit(cols.size) +: cols.flatMap(c =>
      Seq(lit(c), col(s"b_$c"), col(s"i_$c"), col(s"f_$c"), col(s"s_$c"),
        col(s"u_$c")))
    val nn = col("n_boolean") + col("n_integral") + col("n_fractional") +
      col("n_string")
    g.select(col("n_rows"), stack(stackArgs: _*)
        .as(Seq("instance", "n_boolean", "n_integral", "n_fractional",
          "n_string", "n_null")))
      .select(col("instance"),
        when(nn === 0, "Unknown")
          .when(col("n_boolean") === nn, "Boolean")
          .when(col("n_integral") === nn, "Integral")
          .when(col("n_integral") + col("n_fractional") === nn, "Fractional")
          .otherwise("String").as("inferred_type"),
        col("n_rows"), col("n_boolean"), col("n_integral"),
        col("n_fractional"), col("n_string"), col("n_null"))
  }
}
