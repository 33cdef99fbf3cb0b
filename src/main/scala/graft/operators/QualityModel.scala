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

  /** Classifier calibration table (E175) — the reliability diagram
    * behind every "keep docs with p ≥ τ" curation threshold: bucket a
    * 6-dp predicted probability column into tenths and report, per
    * bucket, the count, the mean predicted probability (decimal-summed)
    * and the observed positive fraction — a well-calibrated filter has
    * mean_p ≈ frac_pos per bucket, and the deviation IS the threshold
    * correction to apply (the Platt-scaling input). In production the
    * score column is [[logregTrain]]'s final-weight sigmoid; the
    * operator takes ANY 6-dp p so cheap heuristic scores calibrate the
    * same way.
    *
    * Determinism: p must arrive rounded to 6 dp, so both engines bucket
    * the identical double via the shared ×10 floor. Scale: map-only
    * scoring, ≤10-group map-side-combined hash agg — nothing else. */
  def calibrationTable(
      scored: DataFrame,
      probCol: String,
      labelCol: String): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    scored
      .select(col(probCol).as("p"), col(labelCol).as("y"))
      .where(col("p").isNotNull)
      .groupBy(least(floor(col("p") * 10).cast("long"), lit(9L)).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("p").cast(dec6)).cast("double") / count(lit(1)), 6)
          .as("mean_p"),
        round(count(when(col("y") === 1.0, 1)).cast("double") /
          count(lit(1)), 6).as("frac_pos"))
  }

  /** Top principal component by deterministic power iteration (E172) —
    * the second in-engine TRAINING operator (after [[logregTrain]]):
    * the direction of maximum variance of the embedding cloud, the
    * whitening/compression primitive ahead of ANN and clustering (and
    * the exact-machinery sibling of E148's covariance-free effective-
    * dims estimate).
    *
    * Spark-first shape: ONE distributed pass reduces the corpus to the
    * uncentered dim×dim Gram matrix — per-row upper-triangle products,
    * 6-dp-rounded and DECIMAL(38,6)-summed (order-free, the decSum
    * contract), map-side combined into ≤ dim(dim+1)/2 groups — then the
    * power iteration runs DRIVER-SIDE on the metadata-sized matrix (the
    * hybrid-CC precedent: 64×64 doubles, `iterations`·dim² flops; a
    * 100 TB corpus changes only the one scan). Every iteration step is
    * engine-replayable: matvec terms `ROUND(G_ij·v_j, 6)` decimal-
    * summed, norm on decimal-summed `ROUND(w_i², 6)`, update
    * `v ← ROUND(w/‖w‖, 6)` — DuckDB replays all `iterations` steps in
    * chained CTEs (the E159/E164 pattern), a FULL hash oracle for an
    * eigenvector computation.
    *
    * Start vector is the uniform `ROUND(1/√dim, 6)`; its overlap with
    * the top eigenvector of a Gram matrix of real embedding data is
    * far from 0, so `iterations` = 8 converges the direction to the
    * 6-dp grain. Returns `(dim_idx, loading, eigenvalue)` — eigenvalue
    * the norm of the final matvec (= the Rayleigh estimate under a
    * normalized v). */
  def pcaPower(
      emb: DataFrame, vecCol: String, iterations: Int = 8): DataFrame = {
    require(iterations >= 1)
    val spark = emb.sparkSession
    val dec6 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
    val upper = emb
      .select(col(vecCol).as("v")).where(col("v").isNotNull)
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("v")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(round(col("xi") * col("xj").cast("double"), 6).cast(dec6))
        .as("g"))
    val cells = upper.collect() // ≤ dim(dim+1)/2 rows — metadata-sized
    require(cells.nonEmpty, "pcaPower: no embeddings")
    val dim = cells.map(_.getAs[Int]("j")).max + 1
    val G = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val i = r.getAs[Int]("i"); val j = r.getAs[Int]("j")
      val g = r.getDecimal(2).doubleValue()
      G(i)(j) = g; G(j)(i) = g
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Σ ROUND(term, 6) as exact decimals — the order-free sum both
    // engines agree on bit-for-bit
    def decSum(ts: Iterator[Double]): Double =
      ts.foldLeft(BigDecimal(0))((a, t) =>
        a + BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .toDouble
    var v = Array.fill(dim)(r6(1.0 / math.sqrt(dim.toDouble)))
    var lam = 0.0
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(dim)(i =>
        decSum((0 until dim).iterator.map(j => G(i)(j) * v(j))))
      val norm = math.sqrt(decSum(w.iterator.map(wi => wi * wi)))
      require(norm > 0, "pcaPower: matvec collapsed to zero")
      v = w.map(wi => r6(wi / norm))
      lam = r6(norm)
    }
    import spark.implicits._
    v.toSeq.zipWithIndex
      .map { case (x, i) => (i.toLong, x, lam) }
      .toDF("dim_idx", "loading", "eigenvalue")
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
