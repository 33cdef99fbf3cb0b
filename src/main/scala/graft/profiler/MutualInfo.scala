package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType, LongType}

/** Pairwise mutual information across categorical columns — the
  * MutualInformation analyzer of the Deequ family the reference's battery
  * stops short of (reference Profiler.scala:333-348 ends at
  * StandardDeviation), and the natural next step after [[Correlation]]:
  * Pearson sees only linear numeric association, MI catches ANY
  * dependence between discrete columns (ship mode ↔ ship instruction,
  * status ↔ priority), in nats.
  *
  * Semantics: pairwise-complete (a pair's table counts exactly the rows
  * where BOTH columns are non-null), MI(X,Y) = Σ_{x,y} p(x,y) ·
  * ln(p(x,y) / (p(x)·p(y))) computed from counts as
  * (c_xy/n) · ln((n·c_xy)/(c_x·c_y)).
  *
  * Scale shape: ONE explode of a |pairs|-sized struct array collapses
  * map-side (partial_count) to the joint-frequency relation — the only
  * shuffle touching row data, keyed (pair, x, y), output bounded by joint
  * cardinality. For genuinely categorical pairs that is metadata-sized;
  * for a degenerate ID-like column (the `o_custkey` pair in the declared
  * query exercises this) it approaches row count — still three compact
  * columns, never payloads, and the marginal windows shuffle that same
  * relation keyed (pair, x)/(pair, y), so the worst case is two more
  * compact-key exchanges, not a blowup. Per-term products run in double from the
  * start (n·c and c_x·c_y as double·double), so no 64-bit overflow at any
  * row count. Each term is rounded to 12 dp and summed as DECIMAL(38,12)
  * (the engine-wide decSum contract) — partition-order independent, and
  * mirrored verbatim by the DuckDB oracle. Empty pairs (no complete rows)
  * surface as a row with null n/mi, exactly like the oracle's aggregate
  * over an empty set. */
object MutualInfo {

  private val Dec12 = DataTypes.createDecimalType(38, 12)

  /** The shared joint-frequency relation `(pid, x, y, c)` — ONE explode
    * of a |pairs|-sized struct array collapsing map-side to joint
    * cardinality; the only shuffle touching row data in any of the
    * association measures built on it ([[pairs]], [[chiSquare]],
    * [[theilsU]]). */
  private def jointCounts(
      dfIn: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    require(cols.nonEmpty, "need at least one column pair")
    // single-row-group sources would serialize the partial phase of the
    // joint-count shuffle — the ScanMetrics.spread Expand-pass rationale
    val df = ScanMetrics.spread(dfIn)
    val entries = cols.zipWithIndex.map { case ((a, b), i) =>
      when(col(a).isNotNull && col(b).isNotNull,
        struct(lit(i).as("pid"),
          col(a).cast("string").as("x"), col(b).cast("string").as("y")))
    }
    df.select(explode(array(entries: _*)).as("e"))
      .where(col("e").isNotNull)
      .groupBy(col("e.pid").as("pid"), col("e.x").as("x"), col("e.y").as("y"))
      .agg(count(lit(1)).as("c"))
  }

  private def pairLookup(
      spark: org.apache.spark.sql.SparkSession,
      cols: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    cols.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("pid", "col_a", "col_b")
  }

  def pairs(dfIn: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    val joint = jointCounts(dfIn, cols)
    val byPid = Window.partitionBy("pid")
    val m = joint
      .withColumn("cx", sum("c").over(Window.partitionBy("pid", "x")))
      .withColumn("cy", sum("c").over(Window.partitionBy("pid", "y")))
      .withColumn("n", sum("c").over(byPid))
    // counts → double up front: identical double algebra on the oracle
    // side, and no 64-bit product overflow however large n grows
    val term = (col("c").cast(DoubleType) / col("n").cast(DoubleType)) *
      log((col("n").cast(DoubleType) * col("c").cast(DoubleType)) /
        (col("cx").cast(DoubleType) * col("cy").cast(DoubleType)))
    val agg = m.groupBy("pid").agg(
      sum("c").cast(LongType).as("n_joint"),
      round(sum(round(term, 12).cast(Dec12)).cast(DoubleType), 6).as("mi"))
    broadcast(pairLookup(dfIn.sparkSession, cols)).join(agg, Seq("pid"), "left")
      .select(col("col_a"), col("col_b"), col("n_joint"), col("mi"))
  }

  /** Pearson chi-square independence test (E99) over the same joint
    * relation as [[pairs]] — the hypothesis-test face of the dependence
    * MI measures in nats: χ² = Σ_cells (observed − expected)² / expected
    * with expected = c_x·c_y/n, plus the degrees of freedom
    * (|X|−1)·(|Y|−1) needed to read it. Same single joint-count shuffle,
    * same marginal windows, all-double cell algebra (no 64-bit product
    * overflow), ROUND(·,12) → DECIMAL(38,12) term sums. Cells absent
    * from the joint table contribute (0−e)²/e = e, so χ² is computed as
    * Σ_present ((o−e)²/e − e) + n — exact without materializing the
    * |X|·|Y| cell cross product. */
  def chiSquare(dfIn: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    val joint = jointCounts(dfIn, cols)
    val byPid = Window.partitionBy("pid")
    val m = joint
      .withColumn("cx", sum("c").over(Window.partitionBy("pid", "x")))
      .withColumn("cy", sum("c").over(Window.partitionBy("pid", "y")))
      .withColumn("n", sum("c").over(byPid))
    val e = (col("cx").cast(DoubleType) * col("cy").cast(DoubleType)) /
      col("n").cast(DoubleType)
    val o = col("c").cast(DoubleType)
    // present-cell term minus the absent-cell correction it will get back
    // via the closed-form "+ n" below
    val term = (o - e) * (o - e) / e - e
    val agg = m.groupBy("pid").agg(
      sum("c").cast(LongType).as("n_joint"),
      countDistinct("x").as("card_x"),
      countDistinct("y").as("card_y"),
      (sum(round(term, 12).cast(Dec12)).cast(DoubleType) +
        max(col("n")).cast(DoubleType)).as("chi2_raw"))
    // Cramér's V: χ² normalized to [0,1] effect size — the number that
    // compares dependence strength ACROSS pairs of different cardinality;
    // degenerate 1×k tables (min(card)−1 = 0) yield null, not a div-0
    val minDim = least(col("card_x"), col("card_y")) - lit(1)
    val v = when(minDim <= 0, lit(null).cast(DoubleType))
      .otherwise(sqrt(col("chi2_raw") /
        (col("n_joint").cast(DoubleType) * minDim.cast(DoubleType))))
    broadcast(pairLookup(dfIn.sparkSession, cols)).join(agg, Seq("pid"), "left")
      .select(col("col_a"), col("col_b"), col("n_joint"),
        ((col("card_x") - 1) * (col("card_y") - 1)).cast(LongType).as("dof"),
        round(col("chi2_raw"), 6).as("chi2"),
        round(v, 6).as("cramers_v"))
  }

  /** Theil's uncertainty coefficient (E105) — the DIRECTIONAL member of
    * the association suite: U(X|Y) = MI / H(X) ∈ [0,1] answers "how much
    * of X does knowing Y explain" and, unlike MI/χ²/V, is asymmetric —
    * U(status|priority) ≠ U(priority|status) tells you which way the
    * dependence points. Reported both ways per pair.
    *
    * Same single [[jointCounts]] shuffle; entropies come from the
    * marginal relations (two metadata-sized aggs over the joint table)
    * using the proven F2 entropy algebra, with the Σ c·ln(c) terms
    * quantized ROUND(·,12) → DECIMAL(38,12) (unlike F2's few-distinct
    * text columns, a high-cardinality marginal would make an unquantized
    * double sum shuffle-order dependent). Single-valued marginals
    * (H = 0) yield null U, not a div-0. */
  def theilsU(dfIn: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    val joint = jointCounts(dfIn, cols)
    val byPid = Window.partitionBy("pid")
    val m = joint
      .withColumn("cx", sum("c").over(Window.partitionBy("pid", "x")))
      .withColumn("cy", sum("c").over(Window.partitionBy("pid", "y")))
      .withColumn("n", sum("c").over(byPid))
    val miTerm = (col("c").cast(DoubleType) / col("n").cast(DoubleType)) *
      log((col("n").cast(DoubleType) * col("c").cast(DoubleType)) /
        (col("cx").cast(DoubleType) * col("cy").cast(DoubleType)))
    val miAgg = m.groupBy("pid").agg(
      sum("c").cast(LongType).as("n_joint"),
      sum(round(miTerm, 12).cast(Dec12)).cast(DoubleType).as("mi_raw"))
    def entropy(margKey: String, out: String) = {
      val marg = joint.groupBy("pid", margKey)
        .agg(sum("c").as("cm"))
      val term = round(
        col("cm").cast(DoubleType) * log(col("cm").cast(DoubleType)), 12)
        .cast(Dec12)
      marg.groupBy("pid").agg(
        (log(sum(col("cm")).cast(DoubleType)) -
          sum(term).cast(DoubleType) / sum(col("cm")).cast(DoubleType))
          .as(out))
    }
    def u(h: Column) =
      when(h > 0, round(col("mi_raw") / h, 6)).otherwise(lit(null))
    broadcast(pairLookup(dfIn.sparkSession, cols))
      .join(miAgg, Seq("pid"), "left")
      .join(entropy("x", "h_a"), Seq("pid"), "left")
      .join(entropy("y", "h_b"), Seq("pid"), "left")
      .select(col("col_a"), col("col_b"), col("n_joint"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        u(col("h_a")).as("u_ab"), u(col("h_b")).as("u_ba"))
  }
}
