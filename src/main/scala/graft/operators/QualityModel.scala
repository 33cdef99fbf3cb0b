package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** In-engine model training (E164) — a logistic-regression quality /
  * language classifier learned with full-batch gradient descent INSIDE
  * the query engine: the "train a fastText-style filter on corpus
  * features" step of a curation pipeline (the GPT-3 / CCNet recipe
  * trains exactly such a linear filter over document statistics), here
  * as a deterministic, oracle-replayable operator instead of an external
  * ML job.
  *
  * Spark-first iteration shape (the E159 BPE precedent): the corpus
  * reduces ONCE to a quantized feature relation (6-dp features, the
  * engine-parity contract); each of the fixed `iterations` steps is one
  * map-side-combined aggregation computing the gradient's decimal term
  * sums + the pre-update log-loss and accuracy with the CURRENT weights
  * inlined as literals, followed by a 1-row collect and a driver-side
  * weight update — driver traffic is one row per iteration, executor
  * state is a dozen aggregate buffers.
  *
  * Determinism (the decSum contract, end to end): features and weights
  * are 6-dp quantities, so the logit z is the same fixed-order double
  * expression on both engines; per-row gradient terms
  * `ROUND((σ(z) − y)·x_j, 6)` and log-loss terms
  * `ROUND(ln(1 + e^(−(2y−1)z)), 6)` are quantized to DECIMAL(38,6)
  * BEFORE summing (a last-ulp `exp`/`ln` disagreement moves a term by
  * ~1e−16 — six orders below the rounding grain); means are
  * `ROUND(CAST(sum AS DOUBLE)/n, 6)`; updates
  * `w ← ROUND(w − lr·g, 6)`. Accuracy thresholds on `z ≥ 0`, never on
  * σ(z) — no transcendental on the decision boundary. DuckDB replays
  * every step in chained CTEs (OracleSql.qualityLogreg) — a FULL hash
  * oracle for model training.
  *
  * Cites reference scope: model training is absent from awsdataprofiler
  * (Profiler.scala:166-253 profiles only) — extension per SURVEY §2.E. */
object QualityModel {

  /** Train on `(featureCols, labelCol)` — features pre-quantized 6-dp
    * doubles, label 0.0/1.0. Returns one row per iteration:
    * `(iter, w0, w1…, mean_logloss, accuracy)` with POST-update weights
    * and PRE-update loss/accuracy (iteration k's loss is measured on the
    * weights iteration k−1 produced — the curve a training log shows). */
  def logregTrain(
      features: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      iterations: Int = 6,
      lr: Double = 1.0): DataFrame = {
    require(featureCols.nonEmpty && iterations > 0)
    val spark = features.sparkSession
    val dec6 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val src = graft.profiler.ScanMetrics.spread(features)
      .localCheckpoint(true)
    val nf = featureCols.size
    var w = Array.fill(nf + 1)(0.0) // w(0) = bias
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Seq.newBuilder[Row]
    for (it <- 1 to iterations) {
      val z: Column = featureCols.zipWithIndex.foldLeft(lit(w(0))) {
        case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
      }
      val y = col(labelCol)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val xs: Seq[Column] = lit(1.0) +: featureCols.map(col)
      val gradAggs = xs.zipWithIndex.map { case (x, j) =>
        sum(round((p - y) * x, 6).cast(dec6)).as(s"g_$j")
      }
      val aggs = gradAggs ++ Seq(
        count(lit(1)).as("n"),
        sum(round(log(lit(1.0) + exp(-(lit(2.0) * y - lit(1.0)) * z)), 6)
          .cast(dec6)).as("ll"),
        count(when((z >= 0) === (y === 1.0), 1)).as("hits"))
      val row = src.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n")
      require(n > 0, "logregTrain: empty feature relation")
      val g = (0 to nf).map(j =>
        r6(row.getDecimal(j).doubleValue() / n))
      w = w.zip(g).map { case (wj, gj) => r6(wj - lr * gj) }
      val logloss = r6(row.getAs[java.math.BigDecimal]("ll").doubleValue() / n)
      val acc = r6(row.getAs[Long]("hits").toDouble / n)
      out += Row.fromSeq(it.toLong +: w.toSeq :+ logloss :+ acc)
    }
    val schema = StructType(
      StructField("iter", LongType, nullable = false) +:
        (0 to nf).map(j => StructField(s"w$j", DoubleType, nullable = false)) :+
        StructField("mean_logloss", DoubleType, nullable = false) :+
        StructField("accuracy", DoubleType, nullable = false))
    spark.createDataFrame(
      java.util.Arrays.asList(out.result(): _*), schema)
  }

  /** The documents-table training set both engines derive identically:
    * 6-dp quality features (length score, punctuation ratio, stopword
    * ratio — the E9 ingredients) and the is-English label; rows with no
    * chars or no tokens carry undefined ratios and are excluded on both
    * sides. */
  def docFeatures(docs: DataFrame, textCol: String, langCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val t = col(textCol)
    val nChars = length(t).cast("double")
    val ws = TextFunctions.wsTokenCount(t)
    docs
      .where(coalesce(length(t), lit(0)) > 0 &&
        TextFunctions.wsTokenCount(t) > 0)
      .select(
        round(least(ws.cast("double") / lit(100.0), lit(1.0)), 6).as("x1"),
        round(TextFunctions.punctCount(t).cast("double") / nChars, 6).as("x2"),
        round(TextFunctions.stopwordCount(
          TextFunctions.wsTokens(lower(t)),
          TextFunctions.Stopwords.collectFirst { case ("en", ww) => ww }.get)
          .cast("double") / ws.cast("double"), 6).as("x3"),
        when(col(langCol) === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
  }
}
