package graft.profiler

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declarative data-quality constraint: compare the metric
  * `(instance, metric)` from a metrics relation against `threshold` with
  * `op` (">=" or "<="). */
final case class Constraint(
    check_name: String,
    instance: String,
    metric: String,
    op: String,
    threshold: Double)

/** Deequ-style constraint verification (Schelter et al., PVLDB 2018 —
  * the library the reference delegates its analyzers to pairs them with a
  * `VerificationSuite` that turns metrics into pass/fail checks; reference
  * Profiler.scala:274-297 computes only the metrics). This closes that
  * loop: a constraint suite is evaluated AGAINST the already-computed
  * metrics relation — no second scan of the data, the verification cost is
  * the size of the metrics relation (metadata-sized), whatever the table
  * size.
  *
  * Status semantics: `pass` / `fail` by comparison; `unknown` when the
  * suite references a metric the profile did not produce (nonexistent
  * column or family not computed) — surfaced rather than silently
  * dropped. */
object Checks {

  def evaluate(
      spark: SparkSession,
      metrics: DataFrame,
      suite: Seq[Constraint]): DataFrame = {
    require(suite.nonEmpty, "empty constraint suite")
    require(suite.forall(c => c.op == ">=" || c.op == "<="),
      "op must be >= or <=")
    val suiteDf = spark.createDataFrame(suite)
    suiteDf
      .join(
        broadcast(metrics.select(
          col("instance"), col("name").as("metric"), col("value"))),
        Seq("instance", "metric"), "left")
      .select(
        col("check_name"),
        col("instance"),
        col("metric"),
        col("op"),
        col("threshold"),
        round(col("value"), 6).as("value"),
        when(col("value").isNull, lit("unknown"))
          .when(
            (col("op") === ">=" && col("value") >= col("threshold")) ||
              (col("op") === "<=" && col("value") <= col("threshold")),
            lit("pass"))
          .otherwise(lit("fail")).as("status"))
  }
}
