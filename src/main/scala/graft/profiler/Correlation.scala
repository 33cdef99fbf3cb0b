package graft.profiler

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Pairwise Pearson correlation across numeric columns — the Correlation
  * analyzer of the Deequ family the reference's battery stops short of
  * (reference Profiler.scala:333-348 ends at StandardDeviation). One
  * single-pass wide aggregation computes all five pairwise-complete
  * moments (n, Σx, Σy, Σx², Σy², Σxy) for every column pair — 6·C(k,2)
  * aggregate slots, one table scan, no shuffle beyond the scalar agg —
  * then unpivots the 1-row result into `(col_a, col_b, n, corr)`.
  *
  * Determinism: moments use the engine's DECIMAL(38,6) quantized-addend
  * sums (order-independent, cf. ScanMetrics.decSum), and the correlation
  * is assembled from them in double with a fixed expression shape mirrored
  * verbatim by the oracle. Degenerate pairs (zero variance, empty overlap)
  * yield null, guarded BEFORE the sqrt (DuckDB raises on sqrt of a
  * negative; Spark would return NaN — the guard keeps both on the null
  * path). Pairwise-complete masks make each moment sum over exactly the
  * rows where BOTH columns are present. */
object Correlation {

  private val Dec = DecimalType(38, 6)

  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def xd(c: String) = col(c).cast(DoubleType)
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      val m = col(a).isNotNull && col(b).isNotNull
      Seq(
        count(when(m, lit(1))).as(s"n_$k"),
        sum(when(m, col(a).cast(Dec))).cast(DoubleType).as(s"sx_$k"),
        sum(when(m, col(b).cast(Dec))).cast(DoubleType).as(s"sy_$k"),
        sum(when(m, (xd(a) * xd(a)).cast(Dec))).cast(DoubleType).as(s"sxx_$k"),
        sum(when(m, (xd(b) * xd(b)).cast(Dec))).cast(DoubleType).as(s"syy_$k"),
        sum(when(m, (xd(a) * xd(b)).cast(Dec))).cast(DoubleType).as(s"sxy_$k"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val out = pairs.zipWithIndex.map { case ((a, b), k) =>
      val nD = col(s"n_$k").cast(DoubleType)
      val num = nD * col(s"sxy_$k") - col(s"sx_$k") * col(s"sy_$k")
      val g = (nD * col(s"sxx_$k") - col(s"sx_$k") * col(s"sx_$k")) *
        (nD * col(s"syy_$k") - col(s"sy_$k") * col(s"sy_$k"))
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"), col(s"n_$k").as("n"),
        round(when(g > 0, num / sqrt(g)), 6).as("corr"))
    }
    row.select(explode(array(out: _*)).as("p")).select("p.*")
  }
}
