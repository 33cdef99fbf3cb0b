package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query returns a deterministic result: explicit total-order ORDER BY
  * and ROUND(value, 6), mirrored exactly by the DuckDB SQL in [[oracleSql]]
  * (SURVEY.md §7.3 determinism contract).
  */
object SparkEntry {

  /** Expensive battery on for declared queries — the full capability surface. */
  private val cfg = ProfilerConfig(compExp = true)

  /** Shared by the `pattern_match` query and its oracle: (check, column,
    * regex) — one full-match format check, one partial (search) check,
    * one expected-to-pass-everywhere check. */
  private val patternSpecs = Seq(
    ("name_format", "c_name", "^Customer#[0-9]{9}$"),
    ("name_even_id", "c_name", "[02468]$"),
    ("segment_upper", "c_mktsegment", "^[A-Z]+$"))

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")

  /** Metrics-relation-shaped query `(instance, name, value)` over lineitem. */
  private def metricQuery(fams: Set[String]): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val rows = Profiler.metrics(lineitem(s, dir), cfg, fams)
      Profiler.metricsDF(s, rows)
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Profiler.profile(
      spark,
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
      cfg)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A scan-shareable battery (D1, N1-N9, T1-T5)
    "size" -> metricQuery(Set("size")),
    "completeness" -> metricQuery(Set("completeness")),
    "minimum" -> metricQuery(Set("minimum")),
    "maximum" -> metricQuery(Set("maximum")),
    "mean" -> metricQuery(Set("mean")),
    "sum" -> metricQuery(Set("sum")),
    "stddev_pop" -> metricQuery(Set("stddev_pop")),
    "distinctness" -> metricQuery(Set("distinctness")),
    "max_length" -> metricQuery(Set("max_length")),
    "min_length" -> metricQuery(Set("min_length")),
    "approx_count_distinct" -> metricQuery(Set("approx_count_distinct")),
    "approx_quantiles" -> metricQuery(Set("approx_quantiles")),
    "quantiles_exact" -> metricQuery(Set("quantiles_exact")),
    // winsorized robust moments: exact [p01, p99] clip envelope per
    // numeric column, decimal-quantized clipped mean/stddev + clip count
    "winsorized_stats" -> ((s, dir) =>
      graft.profiler.RobustStats.winsorizedStats(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance", "name")),
    // E70's 100 TB path (r9): KLL bounds pass (fixed-size mergeable
    // state, never a value-map percentile aggregate) + the UNCHANGED
    // exact decSum clipped-moment pass — the only approximation is where
    // the clip bounds land; rows-only, pinned by winsorized_stats_audit
    "winsorized_stats_approx" -> ((s, dir) =>
      graft.profiler.RobustStats.winsorizedStatsApprox(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance", "name")),
    "winsorized_stats_audit" -> ((s, dir) => {
      import s.implicits._
      val cols = OracleSql.Lineitem.numeric
      val li = lineitem(s, dir).select(cols.map(col): _*)
      val approx = graft.profiler.RobustStats
        .winsorizedStatsApprox(li, cols).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      // interval-based boundary logic (see mad_outliers_audit): each
      // sketch bound must be a true value whose exact tie-interval
      // [P(x<v), P(x<=v)] overlaps its target rank +/- 3eps
      val tol = 1e-5
      val aggs = cols.flatMap { c =>
        val lo = approx((c, "WinsorizedLow-0.01"))
        val hi = approx((c, "WinsorizedHigh-0.99"))
        val x = col(c).cast("double")
        Seq(
          count(x).as(s"n_$c"),
          count(when(x < lo - tol, 1)).as(s"lolt_$c"),
          count(when(x <= lo + tol, 1)).as(s"lole_$c"),
          count(when(x < hi - tol, 1)).as(s"hilt_$c"),
          count(when(x <= hi + tol, 1)).as(s"hile_$c"))
      }
      val e = li.agg(aggs.head, aggs.tail: _*).head()
      def g(n: String) = e.getAs[Long](n)
      cols.map { c =>
        val n = g(s"n_$c").toDouble
        val slack = 3.0 * approx((c, "WinsorizedRankEps"))
        def rankOk(p: Double, ltKey: String, leKey: String): Boolean =
          g(ltKey) / n <= p + slack && g(leKey) / n >= p - slack
        (c,
          rankOk(0.01, s"lolt_$c", s"lole_$c"),
          rankOk(0.99, s"hilt_$c", s"hile_$c"))
      }.toDF("instance", "lo_rank_ok", "hi_rank_ok")
        .orderBy("instance")
    }),
    // exact two-sample KS drift between the even/odd-order halves (E98)
    "ks_drift" -> ((s, dir) => {
      val li = lineitem(s, dir)
      graft.profiler.Checks.ksDrift(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    // approximate-FD discovery (E110): g3 violations + conformance ratio
    // for four lhs->rhs pairs in one explode pass
    "fd_discovery" -> ((s, dir) =>
      graft.profiler.Integrity.functionalDependencies(
        lineitem(s, dir), Seq(
          ("l_orderkey", "l_returnflag"),
          ("l_partkey", "l_suppkey"),
          ("l_returnflag", "l_linestatus"),
          ("l_suppkey", "l_partkey")))
        .orderBy("fd")),
    // approximate KS via mergeable KLL sketches (E109) — E98's 100 TB
    // path: one union scan, two k-bounded sketches on the wire, no
    // global-order window; randomized compaction → rows-only here, the
    // bound vs the exact twin is pinned by ks_drift_audit
    "ks_drift_approx" -> ((s, dir) => {
      val li = lineitem(s, dir)
      graft.profiler.Checks.ksDriftApprox(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        "l_extendedprice")
    }),
    "ks_drift_audit" -> ((s, dir) => {
      import s.implicits._
      val li = lineitem(s, dir)
      val even = li.where(col("l_orderkey") % 2 === 0)
      val odd = li.where(col("l_orderkey") % 2 === 1)
      def one(before: org.apache.spark.sql.DataFrame,
          after: org.apache.spark.sql.DataFrame, c: String) = {
        val a = graft.profiler.Checks.ksDriftApprox(before, after, c).head()
        val e = graft.profiler.Checks.ksDrift(before, after, c).head()
        (a.getDouble(3), a.getDouble(4), e.getDouble(3),
          a.getLong(0) == e.getLong(0) && a.getLong(1) == e.getLong(1))
      }
      // same-distribution halves: D̂ within 3ε of the exact twin
      val (dSame, epsSame, dExactSame, countsSame) =
        one(even, odd, "l_extendedprice")
      // disjoint-support pair: price vs discount — exact D = 1; the
      // sketch must still see (near-)total separation
      val (dShift, _, dExactShift, _) =
        one(li.select(col("l_extendedprice").as("v")),
          li.select(col("l_discount").as("v")), "v")
      Seq(
        ("same_within_3eps", math.abs(dSame - dExactSame) <= 3 * epsSame),
        ("shift_within_3eps", math.abs(dShift - dExactShift) <= 3 * epsSame),
        ("d_in_unit", dSame >= 0.0 && dSame <= 1.0 &&
          dShift >= 0.0 && dShift <= 1.0),
        ("counts_exact", countsSame),
        ("shift_detected", dShift >= 0.9))
        .toDF("property", "ok").orderBy("property")
    }),
    // co-missingness correlation (E104): which columns go missing together
    "null_corr" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val dirty = o.select(
        when(col("o_orderkey") % 7 < 2, lit(null))
          .otherwise(col("o_totalprice")).as("price"),
        when(col("o_orderkey") % 7 < 2, lit(null))
          .otherwise(col("o_custkey")).as("cust"),
        when(col("o_orderkey") % 5 === 0, lit(null))
          .otherwise(col("o_orderdate")).as("odate"))
      graft.profiler.Correlation.nullCorrelation(
        dirty, Seq("price", "cust", "odate"))
        .orderBy("col_a", "col_b")
    }),
    // Spearman rank correlation over two numeric pairs (E103)
    "spearman_corr" -> ((s, dir) =>
      graft.profiler.Correlation.spearman(
        lineitem(s, dir),
        Seq(("l_quantity", "l_extendedprice"), ("l_discount", "l_tax")))
        .orderBy("col_a", "col_b")),
    // E103's 100 TB mode (r8): ranks from each column's KLL sketch CDF —
    // two shuffle-free scans, no global-order window. Approximate by
    // design → no hash oracle; spearman_audit pins |ρ̂ − ρ| vs the exact
    // twin on a correlated AND a near-independent pair.
    "spearman_approx" -> ((s, dir) =>
      graft.profiler.Correlation.spearmanApprox(
        lineitem(s, dir),
        Seq(("l_quantity", "l_extendedprice"), ("l_discount", "l_tax")))
        .orderBy("col_a", "col_b")),
    "spearman_audit" -> ((s, dir) => {
      import s.implicits._
      // three regimes, because the testdata's own column pairs are all
      // near-independent (|ρ| < 0.01 — they'd pass any rank mapping):
      // a perfectly monotone pair (exact ρ = 1, the sensitivity check),
      // a near-independent pair, and a heavy-ties pair (few distinct
      // values — the regime the mid-rank tie convention exists for)
      val base = lineitem(s, dir).select(
        col("l_extendedprice").cast("double").as("v"),
        log(col("l_extendedprice")).as("lv"),
        col("l_discount").as("d"), col("l_tax").as("t"),
        col("l_quantity").as("q"), col("l_linenumber").as("ln"))
      val pairs = Seq(("v", "lv"), ("d", "t"), ("q", "ln"))
      def keyed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
      val ap = keyed(graft.profiler.Correlation
        .spearmanApprox(base, pairs).collect())
      val ex = keyed(graft.profiler.Correlation
        .spearman(base, pairs).collect())
      def diffOk(p: (String, String)) = (ap(p)._2, ex(p)._2) match {
        case (Some(a), Some(e)) => math.abs(a - e) <= 0.02
        case (a, e) => a.isEmpty == e.isEmpty
      }
      Seq(
        ("counts_match", pairs.forall(p => ap(p)._1 == ex(p)._1)),
        ("independent_within_bound", diffOk(pairs(1))),
        ("monotone_near_one", ap(pairs(0))._2.exists(_ >= 0.98)),
        ("monotone_within_bound", diffOk(pairs(0))),
        ("rho_in_unit", ap.values.flatMap(_._2).forall(r => math.abs(r) <= 1.0)),
        ("ties_within_bound", diffOk(pairs(2))))
        .toDF("property", "ok").orderBy("property")
    }),
    // Benford first-digit screen on the price column (E97)
    "benford_digits" -> ((s, dir) =>
      graft.profiler.RobustStats.benfordTest(
        lineitem(s, dir), "l_extendedprice")
        .orderBy("digit")),
    // Tukey-fence outlier tail sizes per numeric column (E96)
    "iqr_outliers" -> ((s, dir) =>
      graft.profiler.RobustStats.iqrOutliers(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance")),
    // E96's 100 TB path (r9): ONE KLL sketch scan — quartiles from the
    // sketch, tail counts as CDF rank lookups on the same sketch (no
    // second pass at all); rows-only, pinned by iqr_outliers_audit
    "iqr_outliers_approx" -> ((s, dir) =>
      graft.profiler.RobustStats.iqrOutliersApprox(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance")),
    "iqr_outliers_audit" -> ((s, dir) => {
      import s.implicits._
      val cols = OracleSql.Lineitem.numeric
      val li = lineitem(s, dir).select(cols.map(col): _*)
      val approx = graft.profiler.RobustStats
        .iqrOutliersApprox(li, cols).collect()
        .map(r => r.getString(0) -> r).toMap
      // interval-based boundary logic — see mad_outliers_audit's note on
      // tie atoms sitting exactly on a rounded fence
      val tol = 1e-5
      val aggs = cols.flatMap { c =>
        val r = approx(c)
        val (q1, q3, lo, hi) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))
        val x = col(c).cast("double")
        Seq(
          count(x).as(s"n_$c"),
          count(when(x < q1 - tol, 1)).as(s"q1lt_$c"),
          count(when(x <= q1 + tol, 1)).as(s"q1le_$c"),
          count(when(x < q3 - tol, 1)).as(s"q3lt_$c"),
          count(when(x <= q3 + tol, 1)).as(s"q3le_$c"),
          count(when(x < lo - tol, 1)).as(s"blomin_$c"),
          count(when(x <= lo + tol, 1)).as(s"blomax_$c"),
          count(when(x > hi + tol, 1)).as(s"ahimin_$c"),
          count(when(x >= hi - tol, 1)).as(s"ahimax_$c"))
      }
      val e = li.agg(aggs.head, aggs.tail: _*).head()
      def g(n: String) = e.getAs[Long](n)
      cols.map { c =>
        val r = approx(c)
        val n = g(s"n_$c").toDouble
        val slack = 3.0 * r.getDouble(7)
        // each sketch quartile must be a true value whose tie-interval
        // [P(x<v), P(x<=v)] overlaps p +/- 3eps
        def rankOk(p: Double, ltKey: String, leKey: String): Boolean =
          g(ltKey) / n <= p + slack && g(leKey) / n >= p - slack
        val cntSlack = slack * n + 1
        def cntOk(est: Long, minKey: String, maxKey: String): Boolean =
          est >= g(minKey) - cntSlack && est <= g(maxKey) + cntSlack
        (c,
          rankOk(0.25, s"q1lt_$c", s"q1le_$c"),
          rankOk(0.75, s"q3lt_$c", s"q3le_$c"),
          cntOk(r.getLong(5), s"blomin_$c", s"blomax_$c"),
          cntOk(r.getLong(6), s"ahimin_$c", s"ahimax_$c"))
      }.toDF("instance", "q1_rank_ok", "q3_rank_ok",
        "below_ok", "above_ok")
        .orderBy("instance")
    }),
    // bucketized interval join (E117): overlapping tolerance bands vs
    // lineitem prices as a hash equi-join on buckets, never a BNLJ
    "range_join_bands" -> ((s, dir) => {
      val bands = s.range(1, 11).select(
        col("id").as("band_id"),
        (col("id") * lit(1350.0)).as("lo"),
        (col("id") * lit(1650.0)).as("hi"))
      graft.operators.AsOf.rangeJoin(
        lineitem(s, dir).select(col("l_extendedprice")), "l_extendedprice",
        bands, "lo", "hi", bucketWidth = 500.0)
        .groupBy("band_id")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)))
            .cast("double"), 6).as("sum_price"))
        .orderBy("band_id")
    }),
    // MAD robust outlier screen (E114): median +/- 3*MAD fences
    "mad_outliers" -> ((s, dir) =>
      graft.profiler.RobustStats.madOutliers(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance")),
    // E114's 100 TB path (r9): two KLL sketch scans, tail counts as
    // CDF lookups on the pass-1 sketch — no third pass; randomized
    // compaction → rows-only, bounds pinned by mad_outliers_audit
    "mad_outliers_approx" -> ((s, dir) =>
      graft.profiler.RobustStats.madOutliersApprox(
        lineitem(s, dir).select(OracleSql.Lineitem.numeric.map(col): _*),
        OracleSql.Lineitem.numeric)
        .orderBy("instance")),
    "mad_outliers_audit" -> ((s, dir) => {
      import s.implicits._
      val cols = OracleSql.Lineitem.numeric
      val li = lineitem(s, dir).select(cols.map(col): _*)
      val approx = graft.profiler.RobustStats
        .madOutliersApprox(li, cols).collect()
        .map(r => r.getString(0) -> r).toMap
      // one wide exact pass with every approx estimate inlined. The
      // audit sees only the 6-dp-rounded display values, and lineitem
      // columns are tie-heavy 2-dp grids — an atom can sit EXACTLY on a
      // recomputed median/fence, where float noise (|0.04-0.05| =
      // 0.010000000000000002 vs the rounded 0.01) flips the atom's whole
      // tie mass across the boundary. So every check is interval-based:
      // strict count below (v - tol) vs inclusive count at (v + tol) —
      // the estimate must agree with SOME tie-breaking of the boundary
      // atom within sketch error.
      val tol = 1e-5
      val aggs = cols.flatMap { c =>
        val r = approx(c)
        val (m, mad, lo, hi) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))
        val x = col(c).cast("double")
        val d = abs(x - lit(m))
        Seq(
          count(x).as(s"n_$c"),
          count(when(x < m - tol, 1)).as(s"mlt_$c"),
          count(when(x <= m + tol, 1)).as(s"mle_$c"),
          count(when(d < mad - tol, 1)).as(s"dlt_$c"),
          count(when(d <= mad + tol, 1)).as(s"dle_$c"),
          count(when(x < lo - tol, 1)).as(s"blomin_$c"),
          count(when(x <= lo + tol, 1)).as(s"blomax_$c"),
          count(when(x > hi + tol, 1)).as(s"ahimin_$c"),
          count(when(x >= hi - tol, 1)).as(s"ahimax_$c"))
      }
      val e = li.agg(aggs.head, aggs.tail: _*).head()
      def g(n: String) = e.getAs[Long](n)
      cols.map { c =>
        val r = approx(c)
        val n = g(s"n_$c").toDouble
        val slack = 3.0 * r.getDouble(7)
        // the sketch median/MAD must be a true value at rank 0.5±3eps:
        // with ties the exact rank is the [P(x<v), P(x<=v)] interval,
        // which must overlap [0.5-slack, 0.5+slack]
        def rankOk(ltKey: String, leKey: String): Boolean =
          g(ltKey) / n <= 0.5 + slack && g(leKey) / n >= 0.5 - slack
        val cntSlack = slack * n + 1
        def cntOk(est: Long, minKey: String, maxKey: String): Boolean =
          est >= g(minKey) - cntSlack && est <= g(maxKey) + cntSlack
        (c,
          rankOk(s"mlt_$c", s"mle_$c"),
          rankOk(s"dlt_$c", s"dle_$c"),
          cntOk(r.getLong(5), s"blomin_$c", s"blomax_$c"),
          cntOk(r.getLong(6), s"ahimin_$c", s"ahimax_$c"))
      }.toDF("instance", "med_rank_ok", "mad_rank_ok",
        "below_ok", "above_ok")
        .orderBy("instance")
    }),
    // §2.A frequency battery (F1-F5)
    "count_distinct" -> metricQuery(Set("count_distinct")),
    "entropy" -> metricQuery(Set("entropy")),
    "unique_value_ratio" -> metricQuery(Set("unique_value_ratio")),
    "uniqueness" -> metricQuery(Set("uniqueness")),
    "histogram" -> metricQuery(Set("histogram")),
    // §2.B relational pipeline operators
    "dedup_column_names" -> ((s, dir) =>
      lineitem(s, dir)
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")),
    "metrics_type_join" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val rows = Profiler.metrics(li, cfg, Set("size", "completeness"))
      Profiler.metricsDF(s, rows)
        .join(broadcast(Profiler.schemaDF(s, li)), Seq("instance"), "left")
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"), col("type"))
        .orderBy("instance", "name")
    }),
    "cast_unsupported" -> ((s, dir) => {
      val derived = lineitem(s, dir).select(
        (col("l_quantity") > 25.0).as("flag"),
        col("l_shipdate").cast(DateType).as("ship_day"))
      val rows = Profiler.metrics(
        derived,
        cfg.copy(profileUnsupportedTypes = true),
        Set("min_length", "max_length", "histogram"))
      Profiler.metricsDF(s, rows)
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
    }),
    "sorted_metrics_head" -> ((s, dir) => {
      val rows = Profiler.metrics(
        lineitem(s, dir), cfg,
        Set("size", "completeness", "minimum", "maximum", "max_length", "min_length"))
      Profiler.metricsDF(s, rows)
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
        .limit(100)
    }),
    "metrics_split" -> ((s, dir) => {
      val rows = Profiler.metrics(lineitem(s, dir), cfg, Set("size", "completeness"))
      Profiler.metricsDF(s, rows)
        .where(col("entity") === lit("Column"))
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
    }),
    "schema_df" -> ((s, dir) =>
      Profiler.schemaDF(s, lineitem(s, dir)).orderBy("instance")),
    // structural drift: baseline schema vs an evolved variant (dropped,
    // retyped, and added columns)
    "schema_drift" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val evolved = li.drop("l_tax")
        .withColumn("l_linenumber", col("l_linenumber").cast("long"))
        .withColumn("l_flag", col("l_quantity") > 25.0)
      graft.profiler.Checks.schemaDrift(
        Profiler.schemaDF(s, li), Profiler.schemaDF(s, evolved))
        .orderBy("instance")
    }),
    // §2.B R13 metadata upsert (Glue Parameters semantics against the local
    // JSON store): seed a store with pre-existing table/column params, run a
    // real profile→params→upsert round trip, read the store back as rows.
    // Exercises the full contract — table params MERGE (stale prefixed keys
    // at table level survive, the reference's actual Glue.java:67-80
    // behavior), column params RESET the stats prefix then add (stale
    // DQP__* deleted, foreign keys survive, even on columns absent from the
    // new profile).
    "metadata_upsert" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_meta_").toString
      val sink = new graft.profiler.Sinks.JsonMetadataSink(tmp)
      // seed under a non-matching prefix so nothing is reset away
      sink.upsert(
        "lineitem", "SEED__",
        Map("DQP__Stale" -> "999.0", "owner" -> "1.5"),
        Map(
          "l_orderkey" -> Map("DQP__Stale" -> "888.0", "note" -> "2.5"),
          "ghost_col" -> Map("DQP__Old" -> "7.0", "keep" -> "3.5")))
      val rows = Profiler.metrics(lineitem(s, dir), cfg, Set("size", "completeness"))
      val (tableParams, columnParams) = graft.profiler.Sinks.toParams(rows, cfg)
      sink.upsert("lineitem", cfg.statsPrefix + "__", tableParams, columnParams)
      val meta = sink.read("lineitem")
      // the store is fully materialized in `meta` — remove the temp dir so
      // repeated Verify/Bench invocations don't accumulate orphans
      deleteRecursively(java.nio.file.Paths.get(tmp))
      val flat =
        meta.tableParams.toSeq.map { case (k, v) => ("table", k, v.toDouble) } ++
          meta.columnParams.toSeq.flatMap { case (c, m) =>
            m.toSeq.map { case (k, v) => (c, k, v.toDouble) }
          }
      s.createDataFrame(flat).toDF("scope", "key", "value")
        .select(col("scope"), col("key"), round(col("value"), 6).as("value"))
        .orderBy("scope", "key")
    }),
    // equi-width numeric histogram (10 bins over l_extendedprice)
    "numeric_histogram" -> ((s, dir) =>
      graft.profiler.NumericHistogram.equiWidth(lineitem(s, dir), "l_extendedprice", 10)
        .orderBy("bucket")),
    // pairwise Pearson correlation across all numeric columns: one wide
    // single-pass aggregation of decimal-quantized moments
    "column_corr" -> ((s, dir) =>
      graft.profiler.Correlation.matrix(
        lineitem(s, dir), OracleSql.Lineitem.numeric)
        .orderBy("col_a", "col_b")),
    // Deequ-style verification: a constraint suite evaluated against the
    // metrics relation (no second data scan; unknown metrics surfaced)
    "constraint_check" -> ((s, dir) => {
      import graft.profiler.{Checks, Constraint}
      val rows = Profiler.metrics(
        lineitem(s, dir), cfg,
        Set("size", "completeness", "distinctness", "minimum", "max_length"))
      Checks.evaluate(s, Profiler.metricsDF(s, rows), Seq(
        Constraint("c1_size_min", "*", "Size", ">=", 1000.0),
        Constraint("c2_orderkey_complete", "l_orderkey", "Completeness", ">=", 1.0),
        Constraint("c3_quantity_complete", "l_quantity", "Completeness", ">=", 0.95),
        Constraint("c4_orderkey_distinctness", "l_orderkey", "Distinctness", "<=", 0.5),
        Constraint("c5_quantity_min", "l_quantity", "Minimum", ">=", 1.0),
        Constraint("c6_returnflag_len", "l_returnflag", "MaxLength", "<=", 1.0),
        Constraint("c7_ghost_metric", "no_such_col", "Completeness", ">=", 0.5)))
        .orderBy("check_name")
    }),
    // profile drift monitoring: metrics of the even-orderkey half vs the
    // odd half, flagged at 5% relative change — a pure metrics-relation
    // join, no data rescans
    "profile_drift" -> ((s, dir) => {
      import graft.profiler.Checks
      val li = lineitem(s, dir)
      val fams = Set("size", "completeness", "mean", "sum")
      def half(m: Int): DataFrame = Profiler.metricsDF(
        s, Profiler.metrics(li.where(col("l_orderkey") % 2 === m), cfg, fams))
      Checks.drift(half(0), half(1), relTol = 0.05)
        .orderBy("instance", "name")
    }),
    // §2.B R15 flagship pipelines
    "profile_lineitem" -> ((s, dir) =>
      Profiler.profile(s, lineitem(s, dir), cfg, Profiler.deterministicFamilies)
        .select(
          col("entity"), col("instance"), col("name"),
          round(col("value"), 6).as("value"), col("type"))
        .orderBy("instance", "name")),
    // mergeable incremental profiling: two disjoint halves profiled
    // independently, states merged WITHOUT rescanning, exact metrics must
    // equal the whole-table oracle
    "incremental_profile" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val halves = Seq(
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 0)),
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 1)))
      IncrementalProfiler.metrics(IncrementalProfiler.merge(halves))
        // sketch estimates (HLL distinct, KLL quantiles): tested, not oracled
        .where(col("name") =!= lit("ApproxCountDistinct") &&
          !col("name").startsWith("ApproxQuantiles"))
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
    }),
    // mergeable quantiles: KLL sketches built per split, merged without
    // rescan, quantiles read from the merged sketch (error-bounded,
    // randomized compaction -> rows-only check like the other sketches)
    "incremental_quantiles" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val halves = Seq(
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 0)),
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 1)))
      IncrementalProfiler.metrics(IncrementalProfiler.merge(halves))
        .where(col("name").startsWith("ApproxQuantiles"))
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")
    }),
    // segmented incremental profiling (E100): per-returnflag mergeable
    // states, split/merged without rescan, exact metrics per segment
    "segmented_incremental_profile" -> ((s, dir) => {
      val li = lineitem(s, dir)
      val halves = Seq(
        IncrementalProfiler.snapshotBy(
          li.where(col("l_orderkey") % 2 === 0), "l_returnflag"),
        IncrementalProfiler.snapshotBy(
          li.where(col("l_orderkey") % 2 === 1), "l_returnflag"))
      IncrementalProfiler.metricsBy(IncrementalProfiler.mergeBy(halves))
        .where(col("name") =!= lit("ApproxCountDistinct") &&
          !col("name").startsWith("ApproxQuantiles"))
        .select(col("segment"), col("instance"), col("name"),
          round(col("value"), 6).as("value"))
        .orderBy("segment", "instance", "name")
    }),
    "profile_lineitem_full" -> ((s, dir) =>
      Profiler.profile(s, lineitem(s, dir), cfg)
        .select(
          col("entity"), col("instance"), col("name"),
          round(col("value"), 6).as("value"), col("type"))
        .orderBy("instance", "name")),
    // ===== training-data-pipeline extensions =====
    // deduplication (documents table)
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(documents(s, dir), "doc_id", Seq("text")).orderBy("doc_id")),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),
    // r8: the five shingle-family reports (E2/E128/E129/E135/E147) off
    // ONE staged shingle relation — tokenize once, not five times; each
    // family reduced to (n_rows, quantized score sum), hash-checked
    // against the five standalone DuckDB twins
    "dedup_family_rollup" -> ((s, dir) =>
      Dedup.shingleFamilyRollup(
        documents(s, dir), "doc_id", "text", n = 3,
        jaccardThreshold = 0.5, containThreshold = 0.5, minJaccard = 0.1)),
    // blocklist removal: sources whose hash bucket < 3000 are "blocked";
    // Bloom prefilter routes the clean bulk around the exact anti-join
    "blocklist_filter" -> ((s, dir) => {
      val docs = documents(s, dir)
      val bl = docs.select(col("source")).distinct()
        .where(Sampling.hashBucket(col("source"), "blocklist") < 3000)
      graft.operators.Blocklist.filterOut(docs, "source", bl, "source")
        .select("doc_id", "source").orderBy("doc_id")
    }),
    // paragraph-level dedup: strip 5-word spans repeating >= 2 times
    // corpus-wide, reassemble survivors in order (map-only after the
    // one span-frequency shuffle)
    "paragraph_dedup" -> ((s, dir) =>
      graft.operators.SpanDedup.dropHotSpans(
        documents(s, dir), "doc_id", "text", spanWords = 5, minFreqToDrop = 2)
        .orderBy("doc_id")),
    // cross-snapshot dedup: the newest 20% of docs checked against the
    // existing 80% by content hash — the daily-ingest dedup mode
    "dedup_incremental" -> ((s, dir) => {
      val docs = documents(s, dir)
      val cut = 400L // sf-independent ratio not needed: fixed id cut, both engines agree
      Dedup.incrementalExact(
        docs.where(col("doc_id") >= cut),
        docs.where(col("doc_id") < cut),
        "doc_id", Seq("text"))
        .orderBy("doc_id")
    }),
    // E205: cross-batch NEAR-dup dedup against the PERSISTED signature
    // store — batch = doc_id >= 400, store = dedupState(doc_id < 400);
    // exact stage bloom-prefiltered, near stage banded vs stored
    // signatures, signature-estimated Jaccard (no payload rescan by
    // construction: the state relation carries no text column).
    // Band hashes are xxhash64 → rows-only in the gate; the audit twin
    // pins merge-equals-whole, exact parity and planted capture.
    "dedup_incremental_lsh" -> ((s, dir) => {
      val docs = documents(s, dir)
      val cut = 400L
      val state = Dedup.dedupState(
        docs.where(col("doc_id") < cut), "doc_id", "text")
      Dedup.incrementalLsh(
        docs.where(col("doc_id") >= cut), state, "doc_id", "text")
        .orderBy("id")
    }),
    // E205 audit: (a) state built in two sub-batches then unioned is
    // row-identical to the one-pass state (the minhash_merge_audit
    // mergeability, at store granularity); (b) detection against the
    // merged store equals detection against the one-pass store;
    // (c) dup_exact agrees with incrementalExact on every batch doc;
    // (d) planted byte-identical cross-batch copies are caught by BOTH
    // stages with est_jaccard = 1.0.
    "dedup_incremental_lsh_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir).select("doc_id", "text")
      val cut = 400L
      val known = docs.where(col("doc_id") < cut)
      val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      // plant: 20 store docs re-ingested verbatim under new batch ids
      // (deterministic pick; ≥5 tokens so each has a minhash signature)
      val planted = known
        .where(col("doc_id") % 20 === 0 &&
          size(split(col("text"), "\\s+")) >= 5)
        .orderBy("doc_id").limit(20)
        .select((col("doc_id") + lit(off)).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val batch = docs.where(col("doc_id") >= cut).unionByName(planted)
      val oneShot = Dedup.dedupState(known, "doc_id", "text")
        .localCheckpoint(true)
      val merged = Dedup
        .dedupState(known.where(col("doc_id") % 2 === 0), "doc_id", "text")
        .unionByName(Dedup.dedupState(
          known.where(col("doc_id") % 2 === 1), "doc_id", "text"))
        .localCheckpoint(true)
      val stateMergeEq =
        merged.exceptAll(oneShot).count() + oneShot.exceptAll(merged).count() == 0L
      val outMerged = Dedup.incrementalLsh(batch, merged, "doc_id", "text")
        .localCheckpoint(true)
      val outOne = Dedup.incrementalLsh(batch, oneShot, "doc_id", "text")
      val detInvariant =
        outMerged.exceptAll(outOne).count() + outOne.exceptAll(outMerged).count() == 0L
      val exactRef = Dedup.incrementalExact(batch, known, "doc_id", Seq("text"))
        .select(col("doc_id").as("id"), col("dup").as("ref_dup"))
      val exactParity = outMerged.join(exactRef, Seq("id"), "full_outer")
        .where(col("dup_exact").isNull || col("ref_dup").isNull ||
          col("dup_exact") =!= col("ref_dup")).count() == 0L
      val nPlanted = planted.count()
      val plantedCaught = outMerged
        .where(col("id") >= off && col("dup_exact") && col("near_dup") &&
          col("est_jaccard") === 1.0)
        .count() == nPlanted
      Seq(
        ("detection_state_invariant", detInvariant),
        ("exact_parity_with_incremental_exact", exactParity),
        ("planted_cross_dups_caught", plantedCaught),
        ("state_merge_equals_whole", stateMergeEq))
        .toDF("property", "ok").orderBy("property")
    }),
    // cluster assignment: pair relation -> connected components with the
    // smallest doc id as canonical representative (alternating-star CC)
    "dedup_clusters" -> ((s, dir) =>
      graft.operators.Clustering.dedupClusters(
        Dedup.ngramJaccard(documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5))
        .orderBy("doc_id")),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),
    // LSH recall curve (E203): per Jaccard band, how many exact pairs
    // the banded sketch stage caught — what the (bands, rows) geometry
    // DELIVERS vs its 1-(1-s^r)^b promise. Band hashes engine-specific
    // -> rows-only; the audit pins subset, J=1 capture, band partition
    "lsh_recall_curve" -> ((s, dir) =>
      Dedup.lshRecallCurve(documents(s, dir), "doc_id", "text")
        .orderBy("band")),
    "lsh_recall_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val curve = Dedup.lshRecallCurve(docs, "doc_id", "text").persist()
      val lsh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, threshold = 0.5)
      try {
        val subsetBad = curve.where(col("n_caught") > col("n_exact")).count()
        val perfBad = curve.where(col("band") === 10L &&
          col("n_caught") =!= col("n_exact")).count()
        val caught = curve.agg(coalesce(sum(col("n_caught")), lit(0L)))
          .head().getLong(0)
        val nLsh = lsh.count()
        Seq(
          ("caught_subset_per_band", subsetBad == 0L),
          ("perfect_band_fully_caught", perfBad == 0L),
          ("total_caught_equals_lsh_pairs", caught == nLsh))
          .toDF("property", "ok").orderBy("property")
      } finally { curve.unpersist(); () }
    }),
    // dedup survival curve (E202): per threshold 0.1..0.9 the exact
    // pair count, drop-rule removals and survivors — the threshold-
    // picking artifact, one pair relation instead of nine re-runs
    "dedup_survival" -> ((s, dir) =>
      Dedup.dedupSurvival(documents(s, dir), "doc_id", "text")
        .orderBy("threshold")),
    // MinHash cluster relation (E195): connected components over the
    // LSH-banded VERIFIED pair graph — the production cluster-then-
    // keep-one shape at 100 TB (hybrid driver union-find under the
    // counted threshold). Band hashes are engine-specific -> rows-only;
    // the audit pins refinement of the exact components
    "minhash_clusters" -> ((s, dir) =>
      graft.operators.Clustering.dedupClusters(
        Dedup.minhashLsh(documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5))
        .orderBy("doc_id")),
    // E195 audit: min-id labels, each LSH cluster inside ONE exact
    // cluster (verified pairs are a subset of the exact relation),
    // keep-one yield bounded by the exact graph's
    "minhash_clusters_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val lsh = graft.operators.Clustering.dedupClusters(
        Dedup.minhashLsh(docs, "doc_id", "text", n = 3, threshold = 0.5))
        .persist()
      val exact = graft.operators.Clustering.dedupClusters(
        Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5))
        .persist()
      try {
        val joined = lsh.withColumnRenamed("cluster_id", "cl")
          .join(exact.withColumnRenamed("cluster_id", "ce"),
            Seq("doc_id"), "left")
        val orphan = joined.where(col("ce").isNull).count()
        val refine = joined.groupBy("cl")
          .agg(countDistinct(col("ce")).as("k"))
          .where(col("k") =!= 1L).count()
        val labelBad = lsh.groupBy("cluster_id")
          .agg(min(col("doc_id")).as("m"))
          .where(col("m") =!= col("cluster_id")).count()
        val yLsh = lsh.count() - lsh.select("cluster_id").distinct().count()
        val yEx = exact.count() - exact.select("cluster_id").distinct().count()
        Seq(
          ("cluster_label_is_min_id", labelBad == 0L),
          ("clusters_refine_exact", refine == 0L && orphan == 0L),
          ("yield_at_most_exact", yLsh <= yEx))
          .toDF("property", "ok").orderBy("property")
      } finally { lsh.unpersist(); exact.unpersist(); () }
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(documents(s, dir), "doc_id", "text", maxHamming = 3)
        .orderBy("id_a", "id_b")),
    // benchmark decontamination: every 50th doc plays the eval set; train
    // docs sharing >= 3 word-3-gram shingles with any eval doc are flagged
    "contamination" -> ((s, dir) => {
      val docs = documents(s, dir)
      Dedup.contamination(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, minShared = 3)
        .orderBy("train_id", "bench_id")
    }),
    // per-UTC-day monitoring profile (E95)
    "daily_profile" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.dailyProfile(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us", "user_id", "value")
        .orderBy("day")
    }),
    // gap-based batch sessionization (E108): 30-minute inactivity gap
    "sessionize" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.sessionize(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "user_id", "ts_us", "event_id", "event_type",
        gapUs = 30L * 60 * 1000 * 1000)
        .orderBy("user_id", "session_idx")
    }),
    // daily-volume autocorrelation at lags 1 and 7 (E116)
    "volume_autocorr" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.volumeAutocorr(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us", lags = Seq(1, 7))
        .orderBy("col_a", "col_b")
    }),
    // trailing-7-day rolling volume monitor (E115): RANGE frame over day
    // numbers so outage gaps shrink the window instead of stretching it
    "rolling_daily_volume" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.rollingDailyVolume(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us", windowDays = 7)
        .orderBy("day")
    }),
    // per-state event transition entropy (E111)
    "transition_entropy" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.transitionEntropy(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "user_id", "ts_us", "event_id", "event_type")
        .orderBy("prev_type")
    }),
    // timestamp-column profile (E118): the battery face for the column
    // class the reference Skips, robust to parquet writer drift
    "ts_profile" -> ((s, dir) =>
      graft.operators.Events.tsProfile(
        s.read.parquet(s"$dir/events.parquet"), "ts")),
    // per-user inter-arrival gap distribution (E119)
    "interarrival_stats" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.interarrivalStats(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "user_id", "ts_us", "event_id")
    }),
    // hour-of-week traffic heatmap (E120)
    "hourly_activity" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.hourlyActivity(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us", "user_id")
        .orderBy("dow", "hour")
    }),
    // retrospective CUSUM change-point screen over daily volume (E121)
    "volume_cusum" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.volumeCusum(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us")
        .orderBy("day")
    }),
    // one-row session rollup over the E108 sessionization (E126)
    "session_stats" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.sessionStats(
        graft.operators.Events.sessionize(
          ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
          "user_id", "ts_us", "event_id", "event_type",
          gapUs = 30L * 60 * 1000 * 1000),
        "user_id")
    }),
    // E119/E126 scale lanes: KLL sketch quantiles + exact scalars in the
    // same single wide agg; randomized compaction → rows-only, every
    // number pinned by the 3ε rank-interval audits below
    "interarrival_stats_approx" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.interarrivalStatsApprox(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "user_id", "ts_us", "event_id")
    }),
    "session_stats_approx" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.sessionStatsApprox(
        graft.operators.Events.sessionize(
          ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
          "user_id", "ts_us", "event_id", "event_type",
          gapUs = 30L * 60 * 1000 * 1000),
        "user_id")
    }),
    // 3ε rank-bound audits (the mad_outliers_audit pattern): ONE exact
    // pass over the same gap/session relation with every approx estimate
    // inlined — scalars must match exactly, each sketch quantile's exact
    // rank interval [P(<v), P(<=v)] must overlap [p−3ε, p+3ε]. Display
    // values are 6-dp-rounded (≤5e-7 shift), so thresholds back off by
    // 6e-7 s / 0.5 µs — strictly conservative, never a false fail.
    "interarrival_stats_audit" -> ((s, dir) => {
      import s.implicits._
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.withColumn(
        "ts_us", graft.operators.Events.tsMicros(ev, "ts"))
      val a = graft.operators.Events
        .interarrivalStatsApprox(e, "user_id", "ts_us", "event_id").head()
      val gaps = graft.operators.Events
        .gapRelation(e, "user_id", "ts_us", "event_id")
      val slack = 3.0 * a.getAs[Double]("rank_eps")
      val qs = Seq((0.25, "p25_s"), (0.5, "p50_s"), (0.75, "p75_s"),
        (0.95, "p95_s"))
      val tolUs = 0.5
      val aggs = qs.zipWithIndex.flatMap { case ((_, cname), i) =>
        val vUs = a.getAs[Double](cname) * 1e6
        Seq(count(when(col("gap_us") < vUs - tolUs, 1)).as(s"lt_$i"),
          count(when(col("gap_us") <= vUs + tolUs, 1)).as(s"le_$i"))
      } ++ Seq(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("nu"),
        min(col("gap_us")).as("mn"), max(col("gap_us")).as("mx"),
        sum(col("gap_us")).as("sm"))
      val ex = gaps.agg(aggs.head, aggs.tail: _*).head()
      val n = ex.getAs[Long]("n").toDouble
      val rows = qs.zipWithIndex.map { case ((p, cname), i) =>
        (cname.stripSuffix("_s"),
          ex.getAs[Long](s"lt_$i") / n <= p + slack &&
            ex.getAs[Long](s"le_$i") / n >= p - slack)
      } :+ ("scalars",
        a.getAs[Long]("n_gaps") == ex.getAs[Long]("n") &&
          a.getAs[Long]("n_users") == ex.getAs[Long]("nu") &&
          a.getAs[Long]("min_gap_us") == ex.getAs[Long]("mn") &&
          a.getAs[Long]("max_gap_us") == ex.getAs[Long]("mx") &&
          math.abs(a.getAs[Double]("mean_gap_s") -
            math.rint(ex.getAs[Long]("sm").toDouble /
              ex.getAs[Long]("n") / 1e6 * 1e6) / 1e6) < 1e-9)
      rows.toDF("property", "ok").orderBy("property")
    }),
    "session_stats_audit" -> ((s, dir) => {
      import s.implicits._
      val ev = s.read.parquet(s"$dir/events.parquet")
      val sess = graft.operators.Events.sessionize(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "user_id", "ts_us", "event_id", "event_type",
        gapUs = 30L * 60 * 1000 * 1000)
      val a = graft.operators.Events
        .sessionStatsApprox(sess, "user_id").head()
      val slack = 3.0 * a.getAs[Double]("rank_eps")
      val qs = Seq((0.5, "p50_duration_s"), (0.9, "p90_duration_s"))
      val tolUs = 0.5
      val aggs = qs.zipWithIndex.flatMap { case ((_, cname), i) =>
        val vUs = a.getAs[Double](cname) * 1e6
        Seq(count(when(col("duration_us") < vUs - tolUs, 1)).as(s"lt_$i"),
          count(when(col("duration_us") <= vUs + tolUs, 1)).as(s"le_$i"))
      } ++ Seq(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("nu"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("ns"),
        sum(col("n_events")).as("te"), sum(col("duration_us")).as("td"))
      val ex = sess.agg(aggs.head, aggs.tail: _*).head()
      val n = ex.getAs[Long]("n").toDouble
      val rows = qs.zipWithIndex.map { case ((p, cname), i) =>
        (cname.stripSuffix("_duration_s"),
          ex.getAs[Long](s"lt_$i") / n <= p + slack &&
            ex.getAs[Long](s"le_$i") / n >= p - slack)
      } :+ ("scalars",
        a.getAs[Long]("n_sessions") == ex.getAs[Long]("n") &&
          a.getAs[Long]("n_users") == ex.getAs[Long]("nu") &&
          a.getAs[Long]("n_single_event") == ex.getAs[Long]("ns") &&
          math.abs(a.getAs[Double]("mean_events") -
            math.rint(ex.getAs[Long]("te").toDouble /
              ex.getAs[Long]("n") * 1e6) / 1e6) < 1e-9 &&
          math.abs(a.getAs[Double]("mean_duration_s") -
            math.rint(ex.getAs[Long]("td").toDouble /
              ex.getAs[Long]("n") / 1e6 * 1e6) / 1e6) < 1e-9)
      rows.toDF("property", "ok").orderBy("property")
    }),
    // market-basket association rules over event types (E122)
    "assoc_rules" -> ((s, dir) =>
      graft.operators.Events.assocRules(
        s.read.parquet(s"$dir/events.parquet"), "user_id", "event_type")
        .orderBy("antecedent", "consequent")),
    // per-type daily volume burst screen (E127)
    "type_burst" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      graft.operators.Events.typeBurst(
        ev.withColumn("ts_us", graft.operators.Events.tsMicros(ev, "ts")),
        "ts_us", "event_type")
        .orderBy("event_type", "day")
    }),
    // power-user/long-tail activity histogram (E132)
    "user_activity_histogram" -> ((s, dir) =>
      graft.operators.Events.userActivityHistogram(
        s.read.parquet(s"$dir/events.parquet"), "user_id")
        .orderBy("bucket")),
    // asymmetric n-gram containment pairs (E128): the quoted-inside
    // relation Jaccard under-reports
    "ngram_containment" -> ((s, dir) =>
      Dedup.ngramContainment(
        documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("id_sub", "id_super")),
    // per-document n-gram novelty score (E129)
    "ngram_novelty" -> ((s, dir) =>
      Dedup.ngramNovelty(documents(s, dir), "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // per-dimension embedding profile (E130): dead/skewed/shifted axes
    "embedding_dim_stats" -> ((s, dir) =>
      Similarity.dimStats(embeddings(s, dir), "embedding")
        .orderBy("dim")),
    // corpus-calibrated quality percentile (E131): PERCENT_RANK without
    // the single-partition global window
    "score_percentile" -> ((s, dir) =>
      graft.operators.Ranking.scorePercentile(
        documents(s, dir).select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score")),
        "doc_id", "score")
        .orderBy("doc_id")),
    // join-cardinality / fan-out profile of the lineitem->orders edge (E133)
    "join_cardinality" -> ((s, dir) =>
      graft.profiler.Integrity.joinCardinality(
        s.read.parquet(s"$dir/lineitem.parquet"), "l_orderkey",
        s.read.parquet(s"$dir/orders.parquet"), "o_orderkey")),
    // declared-vs-detected language confusion matrix (E134)
    "lang_agreement" -> ((s, dir) =>
      graft.operators.CorpusStats.langAgreement(
        documents(s, dir), "lang", "text")
        .orderBy("declared", "detected")),
    // dedup-threshold sensitivity sweep (E135): pair counts per J band
    "jaccard_histogram" -> ((s, dir) =>
      Dedup.jaccardHistogram(
        documents(s, dir), "doc_id", "text", n = 3, minJaccard = 0.1)
        .orderBy("bucket")),
    // order-independent table content digests (E136): CDC equality
    // primitive over the integer/string star-schema columns
    "table_digest" -> ((s, dir) => {
      import graft.profiler.Integrity
      Integrity.tableDigest(
        s.read.parquet(s"$dir/region.parquet"), "region",
        Seq("r_regionkey", "r_name"))
        .unionAll(Integrity.tableDigest(
          s.read.parquet(s"$dir/nation.parquet"), "nation",
          Seq("n_nationkey", "n_name", "n_regionkey")))
        .unionAll(Integrity.tableDigest(
          s.read.parquet(s"$dir/customer.parquet"), "customer",
          Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")))
        .orderBy("tbl")
    }),
    // JSON payload key inventory of events.props (E137)
    "props_key_profile" -> ((s, dir) =>
      graft.operators.Events.jsonKeyProfile(
        s.read.parquet(s"$dir/events.parquet"), "props")
        .orderBy("key")),
    // normalized near-exact dedup (E138): C4-style formatting-invariant
    "dedup_normalized" -> ((s, dir) =>
      Dedup.normalizedExact(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // token-weighted quality-decile report (E139)
    "quality_deciles" -> ((s, dir) =>
      graft.operators.Ranking.scoreDeciles(
        documents(s, dir).select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score"),
          TextFunctions.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "score", "n_tokens")
        .orderBy("decile")),
    // stream-static enrichment (E140): replayed event stream broadcast-
    // joined to a static dimension — the streaming face of R6's join
    "streaming_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dim = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type")).distinct()
        .withColumn("type_rank",
          row_number().over(Window.orderBy(col("event_type"))).cast("long"))
      graft.streaming.StreamingProfile.replayParquet(
        s, s"$dir/events.parquet",
        stream => stream.select(col("event_id"), col("event_type"))
          .join(broadcast(dim), Seq("event_type")),
        "append")
        .select("event_id", "event_type", "type_rank")
        .orderBy("event_id")
    }),
    // partition-pruning audit (E141): the predicate must reach the file
    // listing, not just the row filter
    "partition_pruning_audit" -> ((s, dir) =>
      graft.sources.FormatRoundtrip.partitionPruningAudit(
        s, s"$dir/documents.parquet", "lang", "en")),
    // parquet physical-layout profile (r9): the small-files / row-group
    // health detector — footer metadata only, never data pages. The
    // rollup numbers are write-time facts but the oracle SQL cannot see
    // paths (views only) → rows-only; parquet_layout_audit pins footer
    // row counts against the engine's own scan counts
    "parquet_layout" -> ((s, dir) =>
      graft.sources.ParquetLayout.tableRollup(s, dir).orderBy("table")),
    "parquet_layout_audit" -> ((s, dir) => {
      import s.implicits._
      val layout = graft.sources.ParquetLayout.tableRollup(s, dir)
        .select("table", "n_rows", "n_files", "n_row_groups").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      OracleSql.AllTables.map { t =>
        val scanned = s.read.parquet(s"$dir/$t.parquet").count()
        val (footer, files, groups) = layout(t)
        // Σ footer rows == the scan's COUNT(*): the footer-vs-data
        // consistency proof; layout sanity: ≥1 file, ≥1 group per file
        (t, footer == scanned, files >= 1L && groups >= files)
      }.toDF("table", "rows_match", "layout_sane").orderBy("table")
    }),
    // z-order clustering report (r9): stage linear-sorted vs
    // Morton-interleaved layouts of (l_partkey, l_suppkey), measure each
    // column's average normalized zone-map span from footers only — the
    // OPTIMIZE-ZORDER trade quantified; rows-only (paths invisible to
    // the oracle), claims pinned by zorder_audit
    "zorder_clustering" -> ((s, dir) =>
      graft.sources.ZOrderLayout.clusteringReport(
        s, lineitem(s, dir).select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", cacheKey = dir)),
    "zorder_audit" -> ((s, dir) => {
      import s.implicits._
      val spans = graft.sources.ZOrderLayout.clusteringReport(
        s, lineitem(s, dir).select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", cacheKey = dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
      val (linA, linB) = (spans(("linear", "l_partkey")),
        spans(("linear", "l_suppkey")))
      val (zA, zB) = (spans(("zorder", "l_partkey")),
        spans(("zorder", "l_suppkey")))
      // the four clustering claims: a single-column sort is sharp on its
      // own column and BLIND on the other; z-order bounds both at once
      // and at least halves the unsorted column's zone-map width
      Seq((
        linA <= 0.2,
        linB >= 0.8,
        zB <= 0.5 * linB,
        math.max(zA, zB) <= 0.75))
        .toDF("linear_sharp_on_a", "linear_blind_on_b",
          "zorder_improves_b", "zorder_bounds_both")
    }),
    // the pruned READ the z-order spans predict (r10): a two-sided range
    // filter (middle 50% of l_partkey x middle 10% of l_suppkey) over
    // both staged layouts — zone-map arithmetic says which row groups a
    // stats-aware scan CANNOT skip; the audit pins that the z-ordered
    // layout reads strictly fewer groups for identical results, i.e.
    // "spans are tighter" cashes out as "reads are smaller"
    "zorder_prune_audit" -> ((s, dir) => {
      import s.implicits._
      val rep = graft.sources.ZOrderLayout.pruneReport(
        s, lineitem(s, dir).select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", "l_suppkey", cacheKey = dir)
        .collect().map(r => r.getString(0) -> r).toMap
      val lin = rep("linear"); val z = rep("zorder")
      Seq((
        // both layouts return the same non-empty result
        lin.getLong(3) == z.getLong(3) && lin.getLong(3) > 0L,
        // the z-ordered scan skips row groups the linear one cannot
        z.getLong(2) < lin.getLong(2),
        // z-order reads at most half the row groups for this filter
        z.getLong(2) * 2 <= z.getLong(1),
        // candidates never exceed totals (span-arithmetic sanity)
        lin.getLong(2) <= lin.getLong(1) && z.getLong(2) <= z.getLong(1)))
        .toDF("results_equal", "zorder_skips_more",
          "zorder_prunes_half", "bounds_sane")
    }),
    // 3-DIMENSIONAL z-order (r10 — closes the "stops at 2 dims" gap):
    // Morton interleave of three 16-bit keys (48-bit long key) over
    // (l_partkey, l_suppkey, l_orderkey); rows-only + claims audit
    "zorder3_clustering" -> ((s, dir) =>
      graft.sources.ZOrderLayout.clusteringReportN(
        s, lineitem(s, dir), Seq("l_partkey", "l_suppkey", "l_orderkey"),
        nRanges = 16, cacheKey = dir)),
    "zorder3_audit" -> ((s, dir) => {
      import s.implicits._
      // 16 ranges: 4 partition bits over the 48-bit key, so every
      // dimension's top bit gets a real split (8 ranges left the
      // third dimension un-split and its span near-blind)
      val spans = graft.sources.ZOrderLayout.clusteringReportN(
        s, lineitem(s, dir), Seq("l_partkey", "l_suppkey", "l_orderkey"),
        nRanges = 16, cacheKey = dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
      def lin(c: String) = spans(("linear", c))
      def z(c: String) = spans(("zorder", c))
      val others = Seq("l_suppkey", "l_orderkey")
      Seq((
        // single-column sort: sharp on its own column, blind on BOTH
        // others
        lin("l_partkey") <= 0.2 && others.forall(lin(_) >= 0.8),
        // the 3-dim curve bounds ALL THREE dimensions at once
        Seq("l_partkey", "l_suppkey", "l_orderkey").forall(z(_) <= 0.8),
        // and strictly improves every column the linear sort is blind on
        others.forall(c => z(c) < lin(c))))
        .toDF("linear_blind_on_others", "zorder_bounds_all_three",
          "zorder_improves_others")
    }),
    // small-file compaction plan (r9): the ACTION half of the layout
    // profiler — FFD bin packing per table, executor-side, pure footer
    // metadata; rows-only (paths invisible to the oracle), claims pinned
    // by compaction_audit on a staged 12-file layout
    "compaction_plan" -> ((s, dir) =>
      graft.sources.Compaction.compactionPlan(s, dir)),
    "compaction_audit" -> ((s, dir) => {
      import s.implicits._
      // stage a deliberately fragmented layout (12 small files) — the
      // per-JVM + _SUCCESS staging contract (see ZOrderLayout.stage)
      val staged = s"/tmp/graft_compact/p${ProcessHandle.current().pid()}"
      if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$staged/docs.parquet/_SUCCESS")))
        s.read.parquet(s"$dir/documents.parquet").repartition(12)
          .write.mode("overwrite").parquet(s"$staged/docs.parquet")
      val plan1 = graft.sources.Compaction.compactionPlan(s, staged).collect()
      val plan2 = graft.sources.Compaction.compactionPlan(s, staged).collect()
      val target = 128L << 20
      val nStagedFiles = graft.sources.ParquetLayout
        .fileStats(s, staged).count()
      Seq((
        // every staged file planned exactly once
        plan1.length.toLong == nStagedFiles &&
          plan1.map(_.getString(1)).distinct.length == plan1.length,
        // 12 small files, ~6 MB total: ONE compaction bin, nothing kept
        plan1.forall(_.getString(3) == "compact") &&
          plan1.map(_.getLong(4)).distinct.length == 1,
        // no bin overfills the target
        plan1.forall(_.getLong(6) <= target),
        // the plan is deterministic run-to-run
        plan1.map(_.toString).toSeq == plan2.map(_.toString).toSeq))
        .toDF("coverage", "single_bin", "fill_ok", "deterministic")
    }),
    // compaction EXECUTOR (r10): each compact bin rewritten into one
    // merged file, keep files and the source layout untouched — the
    // rewrite half of Delta-OPTIMIZE, footer-reconciled end to end;
    // rows-only (paths + write-time bytes invisible to the oracle)
    // scoped to two tables: the declared key demonstrates the executor's
    // shape (the audit exercises keep/compact end to end on a staged
    // layout); rewriting the ENTIRE testdata dir per bench run timed
    // 13 s of pure parquet re-encoding that measures the codec, not the
    // operator
    "compaction_execute" -> ((s, dir) =>
      graft.sources.Compaction.executeCompaction(
        s, dir, s"/tmp/graft_compact_exec/p${ProcessHandle.current().pid()}",
        tableFilter = Some(Seq("documents", "orders")))
        .drop("output_bytes")), // encoding-dependent; the audit bounds it
    "compaction_execute_audit" -> ((s, dir) => {
      import s.implicits._
      // stage a layout with BOTH pathologies' counterparts: a 12-shard
      // fragmented table (all compact) and a single-file table sized
      // exactly at the target (keep — must never be read or rewritten)
      val staged = s"/tmp/graft_compact_x/p${ProcessHandle.current().pid()}"
      val outDir = s"${staged}_out"
      if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$staged/docs.parquet/_SUCCESS"))) {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        docs.repartition(12)
          .write.mode("overwrite").parquet(s"$staged/docs.parquet")
        docs.coalesce(1)
          .write.mode("overwrite").parquet(s"$staged/whole.parquet")
      }
      def listing() = graft.sources.ParquetLayout.fileStats(s, staged)
        .select("table", "file", "n_rows", "compressed_bytes")
        .collect().map(_.toString).sorted.toSeq
      // target = the single file's exact size: `whole` plans keep
      // (packFFD keeps at >= target), the 12 shards pack into bins
      val target = graft.sources.ParquetLayout.fileStats(s, staged)
        .where(col("table") === "whole")
        .agg(max("compressed_bytes")).head().getLong(0)
      val before = listing()
      val report = graft.sources.Compaction
        .executeCompaction(s, staged, outDir, target).collect()
      val after = listing()
      val srcRows = s.read.parquet(s"$staged/docs.parquet").count()
      def L(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
      Seq((
        // every compaction bin merged into exactly ONE output file
        report.nonEmpty && report.forall(L(_, "n_output_files") == 1L),
        // per-bin AND total row preservation vs the source scan
        report.forall(r => L(r, "input_rows") == L(r, "output_rows")) &&
          report.map(L(_, "output_rows")).sum == srcRows,
        // merged bytes within tolerance of the bin's input (merging may
        // shrink bytes — 12 footers/dictionaries collapse into one)
        report.forall { r =>
          val ib = L(r, "input_bytes"); val ob = L(r, "output_bytes")
          ob >= (math.min(ib, target) * 0.4).toLong && ob <= (ib * 3) / 2 },
        // the keep table was not rewritten: no `whole` rows in the
        // report and no output directory for it
        report.forall(_.getString(0) == "docs") &&
          !java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$outDir/whole")),
        // the SOURCE layout is byte-identical after the rewrite
        before == after))
        .toDF("one_file_per_bin", "rows_preserved", "bytes_sane",
          "keep_untouched", "source_untouched")
    }),
    // quality-proportional deterministic sampling (E142)
    "quality_weighted_sample" -> ((s, dir) =>
      Sampling.qualityWeightedSample(
        documents(s, dir).select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score")),
        "doc_id", "score")
        .orderBy("doc_id")),
    // embedding-space occupancy diversity (E143)
    "cluster_balance" -> ((s, dir) =>
      Similarity.clusterBalance(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)),
    // HTML tag stripping over a deterministic render (E144): the piiScan
    // constructed-input precedent — cleaning is exact-checked end to end
    "html_strip" -> ((s, dir) => {
      val raw = concat(
        lit("<html><body class=\"doc\"><p>"), col("text"),
        lit("</p><br/><div>footer "), col("doc_id").cast("string"),
        lit("</div></body></html>"))
      val clean = TextFunctions.htmlStrip(raw)
      documents(s, dir).select(
        col("doc_id"),
        length(raw).cast("long").as("n_raw"),
        length(clean).cast("long").as("n_clean"),
        substring(sha2(clean, 256), 1, 16).as("clean_sha"))
        .orderBy("doc_id")
    }),
    // regex-layer sentence segmentation stats (E145)
    "sentence_stats" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"),
        TextFunctions.sentenceCount(col("text")).as("n_sentences"),
        TextFunctions.meanSentenceChars(col("text")).as("mean_sentence_chars"))
        .orderBy("doc_id")),
    // per-language character-class profile (E146): encoding QA
    "char_class_stats" -> ((s, dir) =>
      graft.operators.CorpusStats.charClassStats(
        documents(s, dir), "lang", "text")
        .orderBy("lang")),
    // near-dup graph degree histogram (E147): the hub diagnostic that
    // sets the maxDocFreq/maxBandFreq caps
    "dup_graph_degrees" -> ((s, dir) =>
      Dedup.dupGraphDegrees(documents(s, dir), "doc_id", "text")
        .orderBy("degree")),
    // participation-ratio intrinsic dimensionality (E148)
    "effective_dims" -> ((s, dir) =>
      Similarity.effectiveDims(embeddings(s, dir), "embedding")),
    // MinHash merge-associativity audit (E150): per-batch signatures
    // least()-merge into the whole-set signature — incremental dedup
    // without revisiting earlier batches
    "minhash_merge_audit" -> ((s, dir) =>
      Dedup.minhashMergeAudit(documents(s, dir), "doc_id", "text")),
    // parquet schema-evolution audit (E151): old batches stay readable
    // as the producer schema grows
    "schema_evolution_audit" -> ((s, dir) =>
      graft.sources.FormatRoundtrip.schemaEvolutionAudit(
        s, s"$dir/documents.parquet")),
    // Bloom pre-filter soundness audit (E149): the shuffle-free semi-join
    // accelerator — membership on content hashes, train side vs all docs
    "bloom_membership_audit" -> ((s, dir) => {
      val docs = documents(s, dir)
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      graft.profiler.Integrity.bloomMembershipAudit(
        docs.where(col("doc_id") % 50 =!= 0), "h",
        docs, "h",
        expectedItems = 100000L, fpp = 0.01)
    }),
    // document-frequency stopword discovery (E123)
    "doc_freq" -> ((s, dir) =>
      graft.operators.CorpusStats.docFrequency(
        documents(s, dir), "text", k = 50)),
    // chars/bytes-per-token fertility report by language (E125)
    "tokenizer_fertility" -> ((s, dir) =>
      graft.operators.CorpusStats.tokenizerFertility(
        documents(s, dir), "lang", "text")
        .orderBy("lang")),
    // dedup-yield cluster-size histogram (E124) over the E2/E24 clusters
    "dedup_yield" -> ((s, dir) => {
      val docs = documents(s, dir)
      graft.operators.Clustering.dedupYield(
        graft.operators.Clustering.dedupClusters(
          Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)),
        docs)
        .orderBy("cluster_size")
    }),
    // bounded-state streaming dedup (E94): dropDuplicatesWithinWatermark
    // over a replayed stream carrying deterministic duplicates — state
    // follows the watermark horizon, not corpus size; single-batch replay
    // here so the dedup is exact (the eviction trade is sbt-tested)
    "streaming_dedup_watermark" -> ((s, dir) => {
      // every-5th subset: the state store cost is per KEY (HDFS-backed
      // snapshots), and a full-corpus replay spends 4/5 of its time
      // writing state for rows that never exercise the dedup semantics
      val ev = s.read.parquet(s"$dir/events.parquet")
        .where(col("event_id") % 5 === 0)
      val staged = s"/tmp/graft_wm_stage/${new java.io.File(dir).getName}"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(staged, "_SUCCESS")))
        ev.unionAll(ev.where(col("event_id") % 10 === 0))
          .coalesce(1).write.mode("overwrite").parquet(staged)
      graft.streaming.StreamingProfile.replayParquet(
        s, s"$staged/*.parquet",
        stream => graft.streaming.StreamingProfile.dedupWithinWatermark(
          stream.withColumn("_evt",
            timestamp_micros(graft.operators.Events.tsMicros(stream, "ts"))),
          Seq("event_id"), "_evt", "1 hour")
          .select("event_id", "user_id", "value"),
        "append").orderBy("event_id")
    }),
    // per-eval-doc dirty-fraction report (E93): what share of each eval
    // item's n-grams exists anywhere in train
    "contamination_ratio" -> ((s, dir) => {
      val docs = documents(s, dir)
      Dedup.contaminationRatio(
        docs.where(col("doc_id") % 50 =!= 0),
        docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    // similarity search (embeddings table)
    "ann_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    "ann_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    // embedding-space bucketing: nearest-centroid assignment (centroid set
    // = vec_id % 83 == 0), max 6-dp cosine with smaller-id tie-break
    "knn_assign" -> ((s, dir) =>
      Similarity.nearestCentroid(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)
        .orderBy("vec_id")),
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(embeddings(s, dir), "vec_id", "embedding")),
    // SemDeDup (E158): cluster-scoped semantic dedup — per-vector
    // KEEP/REMOVE verdict, the member closer to its centroid removed
    // from every within-cluster duplicate pair (cos >= 0.35)
    "semdedup" -> ((s, dir) =>
      Similarity.semDedup(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0, threshold = 0.35)
        .orderBy("vec_id")),
    // SemDeDup EXECUTOR (E186): the action half — removed vectors
    // dropped via ids-only broadcast anti join, kept corpus returns
    // with n_dims + 6-dp norm; fully hash-oracled (the verdict is
    // deterministic, unlike the sketch-based E185)
    "semdedup_execute" -> ((s, dir) =>
      Similarity.semDedupExecute(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0, threshold = 0.35)
        .orderBy("vec_id")),
    "events_json" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .agg(
          count(lit(1)).as("n_events"),
          round(
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
              .cast("double"), 6).as("sum_value"))
        .orderBy("k")
    }),
    // as-of enrichment: each purchase annotated with the latest
    // strictly-prior view of the same user (value, time, gap)
    "asof_enrich" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("event_id"), col("user_id"),
        graft.operators.Events.tsMicros(ev, "ts").as("ts_us"),
        col("event_type"), col("value"))
      graft.operators.AsOf.lastPrior(
        e, "user_id", "ts_us",
        col("event_type") === "view",
        Seq("value" -> "last_view_value", "ts_us" -> "last_view_ts_us"),
        tieBreak = Seq("event_id"))
        .where(col("event_type") === "purchase")
        .select(
          col("event_id"), col("user_id"), col("ts_us"), col("value"),
          col("last_view_value"), col("last_view_ts_us"),
          (col("ts_us") - col("last_view_ts_us")).as("gap_us"))
        .orderBy("event_id")
    }),
    // deterministic corpus curation (documents table): engine-portable
    // hash-bucket sampling + stable train/valid/test splits
    "sample_deterministic" -> ((s, dir) =>
      Sampling.deterministicSample(documents(s, dir), "doc_id", rate = 0.1)
        .select("doc_id").orderBy("doc_id")),
    // mixture balancing: up to 10 docs per char-length stratum, picked in
    // deterministic hash order
    "stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
        documents(s, dir), "doc_id",
        expr("length(text) div 100").cast("long"), perStratum = 10)
        .select(col("doc_id"), col("stratum").cast("long").as("stratum"))
        .orderBy("doc_id")),
    "dataset_split" -> ((s, dir) =>
      Sampling.hashSplit(
        documents(s, dir), "doc_id",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split").orderBy("doc_id")),
    // temperature-weighted mixture rebalance: languages resampled at
    // p ∝ share^0.5 keeping the corpus size constant in expectation —
    // dominant en downsampled, low-resource langs kept (rates cap at 1)
    "mixture_resample" -> ((s, dir) =>
      Sampling.mixtureResample(
        documents(s, dir), "doc_id", col("lang"), alpha = 0.5)
        .select("doc_id", "lang").orderBy("doc_id")),
    // BPE vocabulary induction (E159): the merge-table learner — eight
    // deterministic most-frequent-pair merges over the word-frequency
    // vocabulary, each step one aggregation + a codegen'd merge pass
    "bpe_merges" -> ((s, dir) =>
      graft.operators.BpeInduction.bpeMerges(documents(s, dir), "text", 8)
        .orderBy("merge_rank")),
    // BPE encode (E160): the inference half — per-doc token stats under
    // the learned 8-merge table (rank-order application, vocab-level)
    "bpe_encode" -> ((s, dir) =>
      graft.operators.BpeInduction.bpeEncode(documents(s, dir), "doc_id", "text", 8)
        .orderBy("doc_id")),
    // DSIR importance weights (E157): every document scored by the log
    // importance ratio of its hashed unigram+bigram profile against the
    // English-labeled target slice — the principled quality-filter
    // replacement (sample ∝ w); fully hash-oracled
    "dsir_weights" -> ((s, dir) =>
      Sampling.dsirWeights(
        documents(s, dir), "doc_id", "text", col("lang") === "en")
        .orderBy("doc_id")),
    // DSIR's action half: Gumbel top-k over the log weights draws the
    // without-replacement sample ∝ w — deterministic noise from the
    // engine's sha256 bucket, so the selection is fully hash-oracled
    "dsir_select" -> ((s, dir) =>
      Sampling.dsirSelect(
        documents(s, dir), "doc_id", "text", col("lang") === "en", k = 100)),
    // leakage-safe split: near-dup cluster members share one split label
    // (split key = canonical cluster id, singletons split by own id)
    "leakage_safe_split" -> ((s, dir) => {
      val docs = documents(s, dir)
      val clusters = graft.operators.Clustering.dedupClusters(
        Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5))
      Sampling.leakageSafeSplit(
        docs, "doc_id", clusters,
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split").orderBy("doc_id")
    }),
    // context-window packing: distributed prefix sum over token counts in
    // doc_id order; pack = floor(tokens-before / 1000)
    "sequence_packing" -> ((s, dir) =>
      graft.operators.Packing.packSequences(
        documents(s, dir).select(
          col("doc_id"), TextFunctions.wsTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 1000)
        .orderBy("doc_id")),
    // training-mixture composition report: docs + tokens per split x language
    "mixture_stats" -> ((s, dir) => {
      val d = Sampling.hashSplit(
        documents(s, dir), "doc_id",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .select(
          col("split"),
          TextFunctions.langId(col("text")).as("lang"),
          TextFunctions.wsTokenCount(col("text")).as("ntok"))
      d.groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"))
        .orderBy("split", "lang")
    }),
    // context-window chunking: 64-token windows, 16-token overlap
    "doc_chunks" -> ((s, dir) =>
      TextFunctions.chunkDocuments(documents(s, dir), "doc_id", "text", 64, 16)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")),
    // text analysis (documents table)
    "token_count" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"),
        TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
        TextFunctions.bpeishTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")),
    // DEFLATE density quality proxy (codegen expression; ordinal contract,
    // invariant-tested — no cross-engine oracle, SURVEY §2.E E72)
    "compression_ratio" -> ((s, dir) => {
      graft.functions.Compress.register(s)
      documents(s, dir).select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        expr("deflate_len(text)").cast("long").as("deflate_bytes"),
        round(
          when(octet_length(col("text")) > 0,
            expr("deflate_len(text)").cast("double") / octet_length(col("text")))
            .otherwise(lit(null)), 6).as("ratio"))
        .orderBy("doc_id")
    }),
    "text_quality" -> ((s, dir) =>
      documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
        round(
          when(
            length(col("text")) > 0,
            TextFunctions.punctCount(col("text")).cast("double") /
              length(col("text")).cast("double")), 6).as("punct_ratio"),
        round(
          when(
            TextFunctions.wsTokenCount(col("text")) > 0,
            TextFunctions.stopwordCount(
              TextFunctions.wsTokens(lower(col("text"))),
              TextFunctions.Stopwords.collectFirst { case ("en", w) => w }.get)
              .cast("double") /
              TextFunctions.wsTokenCount(col("text")).cast("double")), 6)
          .as("stopword_ratio"),
        round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")),
    // CCNet-style LM quality filter: corpus-trained unigram model, per-doc
    // mean token log-probability + perplexity
    "lm_quality" -> ((s, dir) =>
      graft.operators.LangModel.unigramScore(documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // tokenizer-coverage gate: OOV rate vs the corpus top-100 vocabulary
    "vocab_coverage" -> ((s, dir) =>
      graft.operators.CorpusStats.vocabCoverage(
        documents(s, dir), "doc_id", "text", k = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // add-1 bigram LM: word-salad scores badly even when unigrams look fine
    "bigram_lm" -> ((s, dir) =>
      graft.operators.LangModel.bigramScore(documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // interpolated trigram perplexity (E174): Jelinek-Mercer fixed-lambda
    // backoff over corpus-trained tri/bi/unigram counts - the next step
    // toward the CCNet KenLM filter; full hash oracle
    "trigram_lm" -> ((s, dir) =>
      graft.operators.LangModel.trigramScore(documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // composite quality gate (E198): Gopher rules AND ccnet tertile AND
    // one-pass NB classifier — three independent verdicts, conjunctive
    // keep, every stage's verdict kept in the row
    "quality_gate" -> ((s, dir) =>
      graft.operators.Curate.qualityGate(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // cross-corpus KN perplexity (E197): the CCNet setup — model trained
    // on the reference slice, scoring the web slice; unseen contexts
    // back off level by level, unseen last words are counted as OOV
    "kn_cross_ppl" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.LangModel.kneserNeyCrossScore(
        d.where(col("doc_id") % 101 === 0),
        d.where(col("doc_id") % 101 =!= 0), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),
    // Naive-Bayes quality filter (E196, in-engine training #5 — the
    // ONE-PASS one): per-bucket class counts + priors learned in a
    // single corpus scan; keep on the exact decimal log-odds
    "naive_bayes_filter" -> ((s, dir) =>
      graft.operators.QualityModel.naiveBayesFilter(
        documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // Gopher quality-rule battery (E192): the seven Rae et al. heuristic
    // checks + conjunctive keep, every cut an integer comparison, one
    // map-only pass
    "gopher_rules" -> ((s, dir) =>
      graft.operators.CorpusStats.gopherRules(
        documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // interpolated Kneser-Ney trigram perplexity (E191): absolute
    // discounting with continuation-type counts (the KenLM/CCNet
    // smoothing), three-level interpolation, decimal-summed logprobs
    "kneser_ney_lm" -> ((s, dir) =>
      graft.operators.LangModel.kneserNeyScore(
        documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // PageRank over the near-dup graph (E173): 8 damped iterations,
    // 12-dp decimal contribution sums - graph centrality as the
    // template-center signal; full hash oracle (chained CTE replay)
    "dup_pagerank" -> ((s, dir) =>
      graft.operators.Clustering.dupPagerank(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // classifier calibration table (E175): reliability diagram for a
    // 6-dp probability column vs the is-English label - here a fixed
    // logistic over the quality score (in production: logregTrain's
    // final-weight sigmoid); mean_p vs frac_pos per tenth-bucket
    "calibration_table" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val q = round(TextFunctions.qualityScore(col("text")), 6)
      val p = round(
        lit(1.0) / (lit(1.0) + exp(-(lit(8.0) * (q - lit(0.5))))), 6)
      val scored = documents(s, dir).select(p.as("p"),
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
      graft.operators.QualityModel.calibrationTable(scored, "p", "y")
        .orderBy("bucket")
    }),
    // reproducible-export shard manifest (E176): sha256-bucket routing,
    // order-free XOR content digest - map-side-combined, no sort
    "shard_manifest" -> ((s, dir) =>
      graft.operators.Sampling.shardManifest(documents(s, dir), "doc_id", "text")
        .orderBy("shard")),
    // Gopher-style repetition filters: duplicate-token fraction and
    // most-common-bigram share per document
    "repetition_metrics" -> ((s, dir) =>
      TextFunctions.repetitionMetrics(documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // PII scrubbing: detection counts + masked-text digest over a
    // deterministically rendered text column (the corpus text enriched with
    // synthetic contact strings derived from doc_id — identical expression
    // in the DuckDB oracle, so detection AND redaction are exact-checked)
    "pii_scan" -> ((s, dir) => {
      import graft.functions.PiiFunctions
      val d = col("doc_id")
      val rendered = concat(
        col("text"),
        lit(" contact user"), d.cast("string"), lit("@example.com"),
        when(d % 3 === 0,
          concat(lit(" ip 10."), (d % 256).cast("string"), lit("."),
            ((d * 7) % 256).cast("string"), lit(".8"))).otherwise(lit("")),
        when(d % 5 === 0,
          concat(lit(" tel 25-989-741-"), lpad((d % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")))
      documents(s, dir).select(
        col("doc_id"),
        PiiFunctions.emailCount(rendered).cast("long").as("n_emails"),
        PiiFunctions.ipv4Count(rendered).cast("long").as("n_ipv4"),
        PiiFunctions.phoneCount(rendered).cast("long").as("n_phones"),
        sha2(PiiFunctions.redact(rendered), 256).as("redacted_sha"))
        .orderBy("doc_id")
    }),
    // topical tagging: top-3 TF-IDF terms per document
    "tfidf_keywords" -> ((s, dir) =>
      graft.operators.Search.tfidfTopTerms(documents(s, dir), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank")),
    // BM25 keyword retrieval: rank the corpus for a fixed 3-term query
    "bm25_topk" -> ((s, dir) =>
      graft.operators.Search.bm25TopK(
        documents(s, dir), "doc_id", "text", Seq("spark", "merge", "vector"))),
    // multi-query BM25 (E190): every eval-slice doc retrieves its top-10
    // corpus docs through a term-filtered inverted index — postings
    // pruned map-side to the query-term set, df stopping + per-query
    // rarest-16 terms bound candidates absolutely, exact-decimal ranking
    "bm25_multi" -> ((s, dir) => {
      val d = documents(s, dir)
      graft.operators.Search.bm25MultiTopK(
        d.where(col("doc_id") % 101 =!= 0),
        d.where(col("doc_id") % 101 === 0), "doc_id", "text")
        .orderBy("query_id", "doc_id")
    }),
    // corpus card (r9): the one-row dataset summary a curator exports —
    // size, token volume, language mix, exact-dup rate, quality level,
    // median length — every number riding an already-proven cross-engine
    // contract (integer counts, decSum quality mean, percentile
    // bit-parity, deterministic argmax tie-break), so the whole card is
    // hash-oracled. One wide agg + one lang rollup. SCALE LIMIT (ADVICE
    // r9): every term scales as a scan EXCEPT p50_tokens, whose exact
    // `percentile` buffer is the token-count value set — fine for a card
    // over any real corpus (token counts are a bounded-ish domain), but
    // at 100 TB the documented path swaps that one term for the E19 KLL
    // median and keeps the rest of the card unchanged.
    "corpus_card" -> ((s, dir) => {
      // exact-dup rate distinct-counts the 32-byte SHA-256 of the text,
      // NOT the text itself (the E1 doctrine): countDistinct(text) made
      // the grouping key the document body — at 100 TB the whole corpus
      // crossed the wire for one scalar (VERDICT r10 "What's wrong" #2).
      // Same answer (collision-free at any real corpus size), metadata-
      // sized shuffle; the oracle distinct-counts sha256(text) likewise.
      val base = documents(s, dir).select(
        col("lang"), sha2(col("text"), 256).as("text_h"),
        TextFunctions.wsTokenCount(col("text")).as("ws_tokens"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"))
      val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 6)
      val m = base.agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        countDistinct("lang").as("n_langs"),
        countDistinct("text_h").as("n_distinct_texts"),
        round(sum(col("q").cast(Dec)).cast("double") / count(col("q")), 6)
          .as("mean_quality"),
        round(percentile(col("ws_tokens").cast("double"), lit(0.5)), 6)
          .as("p50_tokens"))
      val top = base.groupBy("lang").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("lang").asc).limit(1)
        .select(col("lang").as("top_lang"), col("c").as("top_docs"))
      m.crossJoin(broadcast(top)).select(
        col("n_docs"), col("total_ws_tokens"), col("n_langs"),
        col("top_lang"),
        round(col("top_docs").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"),
        round((col("n_docs") - col("n_distinct_texts")).cast("double") /
          col("n_docs"), 6).as("exact_dup_rate"),
        col("mean_quality"), col("p50_tokens"))
    }),
    "vocab_topk" -> ((s, dir) =>
      TextFunctions.vocabTopK(documents(s, dir), "text", k = 100)),
    // in-engine logistic-regression quality/language classifier (E164):
    // 6 full-batch GD iterations, decimal-quantized gradient terms —
    // model TRAINING with a full hash oracle (6 chained CTE replay)
    "quality_logreg" -> ((s, dir) => {
      val f = graft.operators.QualityModel.docFeatures(
        documents(s, dir), "text", "lang")
      graft.operators.QualityModel.logregTrain(
        f, Seq("x1", "x2", "x3"), "y", iterations = 6)
        .orderBy("iter")
    }),
    // quality-filter EXECUTOR (E180): the E164 action — train the linear
    // filter in-engine against the reference-quality label (fastText
    // recipe), keep every doc the model accepts (z >= 0, the logit
    // threshold), sha256-pin the kept corpus; map-only scoring, no join
    "quality_filter_execute" -> ((s, dir) =>
      graft.operators.QualityModel.qualityFilterExecute(
        documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // n-gram-Jaccard dedup EXECUTOR (E181): the E2 action — drop every
    // doc with a smaller-id neighbor at J >= 0.5 (per-pair larger-id
    // rule; cluster minima always survive), kept corpus sha256-pinned
    "jaccard_dedup_execute" -> ((s, dir) =>
      Dedup.jaccardDedupExecute(
        documents(s, dir), "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("doc_id")),
    // MinHash-LSH dedup EXECUTOR (E185): E181's 100 TB sibling — the
    // same drop rule over the LSH-candidate VERIFIED pair relation
    // (sound: verified pairs are a subset of the exact relation); band
    // hashes are engine-specific -> rows-only, the audit pins soundness
    "minhash_dedup_execute" -> ((s, dir) =>
      Dedup.minhashDedupExecute(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // E185 audit: removals sound vs the exact relation, kept+removed
    // partitions the corpus, identical docs (J=1, identical signatures)
    // deterministically caught
    "minhash_dedup_execute_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val mh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .persist()
      val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .persist()
      try {
        val removedMh = mh.select(col("id_b")).distinct()
        val exactRemoved = exact.select(col("id_b")).distinct()
        val unsound = removedMh
          .join(exactRemoved, Seq("id_b"), "left_anti").count()
        val kept = Dedup.minhashDedupExecute(docs, "doc_id", "text")
        val total = docs.count()
        val nk = kept.count()
        val nr = removedMh.count()
        val overlap = kept.select(col("doc_id").as("id_b"))
          .join(removedMh, Seq("id_b")).count()
        val missedPerfect = exact.where(col("jaccard") === 1.0)
          .join(mh.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti")
          .count()
        Seq(
          ("identical_pairs_always_caught", missedPerfect == 0L),
          ("kept_plus_removed_partitions_corpus",
            nk + nr == total && overlap == 0L),
          ("removed_subset_of_exact", unsound == 0L))
          .toDF("property", "ok").orderBy("property")
      } finally { mh.unpersist(); exact.unpersist(); () }
    }),
    // Group-DRO robust training (E182, in-engine training #4): per-source
    // mean losses, multiplicative mixture-weight updates q <- q*e^(0.5*l)
    // (normalized), q-weighted gradient steps — the DoReMi domain-weight
    // learner; one per-domain agg + metadata collect per iteration
    "groupdro_train" -> ((s, dir) =>
      graft.operators.QualityModel.groupDroTrain(
        graft.operators.QualityModel.docFeaturesWith(
          documents(s, dir), "text", "lang", Seq("source")),
        Seq("x1", "x2", "x3"), "y", "source")
        .orderBy("iter", "domain")),
    // DoReMi selection (E184): the E182 action — Group-DRO over language
    // domains, then each domain keeps a deterministic hash slice
    // proportional to its learned mixture weight (max-q domain whole);
    // training is metadata collects, selection one map-only pass
    "doremi_select" -> ((s, dir) =>
      graft.operators.QualityModel.doremiSelect(
        documents(s, dir), "doc_id", "text", "lang", "lang")
        .orderBy("doc_id")),
    // end-to-end curation pipeline (E183): near-dup drop -> in-engine
    // trained quality filter (on the deduped corpus) -> deterministic
    // 90/5/5 split -> per-(split, shard) content-addressed manifest,
    // ONE declarative plan with one chained hash oracle
    "corpus_curate" -> ((s, dir) =>
      graft.operators.Curate.corpusCurate(documents(s, dir), "doc_id", "text")
        .orderBy("split", "shard")),
    // CCNet-style per-language quality tertiles (E171): head/middle/tail
    // by strictly-better mass over the per-lang DISTINCT-score histogram
    // (WindowGuard-enforced), integer comparison at the cut
    "ccnet_buckets" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documents(s, dir).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.ccnetBuckets(scored, "doc_id", "lang", "score")
        .orderBy("doc_id")
    }),
    // CCNet selection EXECUTOR (E187): drop the tail tertile of every
    // language (and unscored docs); (id, sha, length) projected BEFORE
    // the verdict join so document payloads never enter an exchange
    "ccnet_select" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documents(s, dir).select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.ccnetSelect(
        scored, "doc_id", "lang", "score", "text")
        .orderBy("doc_id")
    }),
    // top principal component by power iteration (E172): one Gram pass,
    // driver-side iteration on the 64x64 matrix, decimal-quantized steps
    // (in-engine training #2 — full hash oracle replays all 8 steps)
    "pca_power" -> ((s, dir) =>
      graft.operators.QualityModel.pcaPower(embeddings(s, dir), "embedding")
        .orderBy("dim_idx")),
    // product quantization encode (E177): 8 subspaces, broadcast
    // sub-codebooks, argmin struct-min - 64 floats -> 8 ids + distortion
    // codebook FIXED at the vec_id < 2000 sub-centroids (a no-op at gate
    // scale, where all ids are < 2000): PQ's whole point is a
    // corpus-size-independent codebook, so the sf1 lane must measure a
    // linear broadcast-encode, not a codebook growing with the data
    // (VERDICT r11 task 6)
    "embedding_pq" -> ((s, dir) =>
      graft.operators.Quantize.productQuantize(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0 && col("vec_id") < 2000)
        .orderBy("vec_id")),
    // per-domain top-k with ties (E178): strictly-better mass under k
    // over the per-domain distinct-score histogram - no corpus sort
    "domain_topk" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val scored = documents(s, dir).select(col("doc_id"), col("source"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Ranking.domainTopk(
        scored, "doc_id", "source", "score", 20L)
        .orderBy("doc_id")
    }),
    // per-doc character entropy (E179): the repetitive-garbage gate;
    // 12-dp decimal term sums, one (doc, char) keyed shuffle
    "char_entropy" -> ((s, dir) =>
      graft.operators.CorpusStats.charEntropy(
        documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // deterministic JL random projection 64->16 (E165): sha256 sign
    // matrix, per-row codegen folds, no shuffle
    "embedding_project" -> ((s, dir) =>
      graft.operators.Quantize.randomProject(
        embeddings(s, dir), "vec_id", "embedding", outDims = 16)
        .orderBy("vec_id", "dim")),
    // UniMax budget waterfilling across languages (E166): metadata-sized
    // domain rollup, driver recursion, integer-exact
    "unimax_mix" -> ((s, dir) =>
      Sampling.unimaxAllocation(documents(s, dir), "lang", budget = 400L)
        .orderBy("domain")),
    // URL path templating census (E167) over a synthetic per-doc URL
    // (the url_normalize convention): literal above support 20, else '*'
    "path_templates" -> ((s, dir) => {
      val d = documents(s, dir).withColumn("u", concat(
        lit("/"), col("source"), lit("/"), col("lang"), lit("/b"),
        (col("doc_id") % 50).cast("string"),
        lit("/page-"), col("doc_id").cast("string")))
      graft.operators.CorpusStats.pathTemplates(d, "doc_id", "u",
        minSupport = 20L)
        .orderBy(col("n_urls").desc, col("template"))
    }),
    // label-disjoint hard-negative mining (E168): DPR-style contrastive
    // negatives, broadcast queries, corpus never shuffles
    "hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 97 === 0, k = 10)
        .orderBy("query_id", "neighbor_id")),
    // E204: the ANN-backed scale path of hard-negative mining — IVF
    // coarse quantizer (the ivf_topk cell structure), 2-probe candidate
    // generation, label cut BEFORE the per-query heap. Deterministic
    // approximation → FULL hash oracle.
    "hard_negatives_ann" -> ((s, dir) =>
      Similarity.hardNegativesAnn(
        embeddings(s, dir), "vec_id", "embedding", "label",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0, nprobe = 2, k = 10)
        .orderBy("query_id", "neighbor_id")),
    // E204 audit: plant an identical-vector twin with a DIFFERENT label
    // for every query — the twin lands in the query's own rank-1 probe
    // cell by construction, so the ANN form must catch it at cos = 1.0
    // (the deterministic guarantee behind "recall < 1 by design");
    // returned labels must be disjoint and cosines exact on recompute.
    "hard_negatives_ann_audit" -> ((s, dir) => {
      import s.implicits._
      val e = embeddings(s, dir).where(col("label").isNotNull)
      val off = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val qPred = col("vec_id") % 97 === 0
      val twins = e.where(qPred)
        .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"),
          (col("label") + lit(1)).as("label"))
      val planted = e.unionByName(twins)
      val ann = Similarity.hardNegativesAnn(
        planted, "vec_id", "embedding", "label",
        centroidPred = col("vec_id") % 83 === 0, queryPred = qPred)
        .localCheckpoint(true)
      val nQueries = e.where(qPred).count()
      val twinCaught = ann
        .where(col("neighbor_id") === col("query_id") + lit(off) &&
          col("cos") === 1.0)
        .count() == nQueries
      val labelsDisjoint =
        ann.where(col("query_label") === col("neighbor_label")).count() == 0L
      val qv = planted.select(col("vec_id").as("query_id"), col("embedding").as("q"))
      val nv = planted.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
      val cosExact = ann.join(qv, "query_id").join(nv, "neighbor_id")
        .where(col("cos") =!= round(Similarity.cosine(col("q"), col("v")), 6))
        .count() == 0L
      Seq(
        ("cos_exact_recompute", cosExact),
        ("labels_disjoint", labelsDisjoint),
        ("planted_twin_caught", twinCaught))
        .toDF("property", "ok").orderBy("property")
    }),
    // Zipf rank-frequency OLS fit over the top-1000 vocabulary (E76)
    "zipf_fit" -> ((s, dir) =>
      graft.operators.CorpusStats.zipfFit(documents(s, dir), "text", 1000)),
    // Heaps-law curve: cumulative docs/tokens/distinct-vocab per id-decile
    "vocab_growth" -> ((s, dir) =>
      graft.operators.CorpusStats.vocabGrowth(
        documents(s, dir), "doc_id", "text", buckets = 10)
        .orderBy("bucket")),
    "lang_id" -> ((s, dir) =>
      documents(s, dir)
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
        .orderBy("doc_id")),
    // per-source curation report card: volume, language spread, mean
    // quality, exact-dup exposure (E74)
    "domain_stats" -> ((s, dir) =>
      graft.operators.CorpusStats.domainReport(
        documents(s, dir), "source", "lang", "text")
        .orderBy("domain")),
    // token-distribution JSD between the E21 hash splits (E75)
    "split_divergence" -> ((s, dir) =>
      graft.operators.CorpusStats.splitDivergence(
        documents(s, dir), "doc_id", "text",
        Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
        .orderBy("split_a", "split_b")),
    "doc_fingerprint" -> ((s, dir) => {
      RollingHash.register(s)
      documents(s, dir)
        .select(col("doc_id"), expr("rolling_hash(text)").as("fingerprint"))
        .orderBy("doc_id")
    }),
    // streaming (events table, driven through real streaming queries).
    // Event-time ingestion goes through Events.tsMicros, which dispatches
    // on the ACTUAL parquet-read type (raw int64 nanos vs TIMESTAMP micros
    // NTZ vs millis) — matching DuckDB's epoch_us under the pinned UTC zone.
    "streaming_profile" -> ((s, dir) => {
      StreamingProfile.replayParquet(
        s, s"$dir/events.parquet",
        df => StreamingProfile.windowedProfileExact(
          df.withColumn("ts",
            timestamp_micros(graft.operators.Events.tsMicros(df, "ts")))),
        "complete")
        .orderBy("window_start", "event_type")
    }),
    "streaming_sessions" -> ((s, dir) => {
      StreamingProfile.replayParquet(
        s, s"$dir/events.parquet",
        df => {
          val sp = df.sparkSession
          import sp.implicits._
          StreamingProfile.sessionize(
            df.select(
              col("user_id"),
              graft.operators.Events.tsMicros(df, "ts").as("ts_us"))
              .as[SessionEvent],
            gapMinutes = 30).toDF()
        },
        "append")
        .orderBy("user_id", "session_start_us")
    }),
    "streaming_dedup" -> ((s, dir) =>
      StreamingProfile.replayParquet(
        s, s"$dir/documents.parquet",
        df => StreamingProfile.streamingDedup(df, "doc_id", "text"),
        "complete")
        .select("doc_id", "content_hash", "dup_count")
        .orderBy("doc_id")),
    // E211: streaming ingest deduped against the PERSISTED E205 store —
    // stream-static joins only, map-only per-row signatures, bounded
    // pair-dedup state. Event time synthesized from doc_id (both
    // engines would agree, but band hashes make this rows-only; the
    // audit twin pins bit-parity with the batch operator).
    "streaming_state_dedup" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val cut = 400L
      val state = Dedup.dedupState(
        docs.where(col("doc_id") < cut), "doc_id", "text")
        .localCheckpoint(true)
      StreamingProfile.replayParquet(
        s, s"$dir/documents.parquet",
        df => StreamingProfile.streamingStateDedup(
          df.where(col("doc_id") >= cut)
            .withColumn("_evt", timestamp_seconds(col("doc_id"))),
          state, "doc_id", "text", "_evt"),
        "append")
        .orderBy("id", "kind", "match_id")
    }),
    // E211 audit: the streaming verdicts must equal the batch operator's
    // bit-for-bit — exact rows ≡ incrementalExact's dup ids, near pairs
    // ≡ the batch banded-estimate pair relation (both uncapped; the
    // map-only per-row signature must reproduce the groupBy signature).
    "streaming_state_dedup_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir).select("doc_id", "text")
      val cut = 400L
      val known = docs.where(col("doc_id") < cut)
      val batchDocs = docs.where(col("doc_id") >= cut)
      val state = Dedup.dedupState(known, "doc_id", "text")
        .localCheckpoint(true)
      val out = StreamingProfile.replayParquet(
        s, s"$dir/documents.parquet",
        df => StreamingProfile.streamingStateDedup(
          df.where(col("doc_id") >= cut)
            .withColumn("_evt", timestamp_seconds(col("doc_id"))),
          state, "doc_id", "text", "_evt"),
        "append").localCheckpoint(true)
      val exactStream = out.where(col("kind") === "exact").select("id")
      val exactBatch = Dedup.incrementalExact(
        batchDocs, known, "doc_id", Seq("text"))
        .where(col("dup")).select(col("doc_id").as("id"))
      val exactParity =
        exactStream.exceptAll(exactBatch).count() +
          exactBatch.exceptAll(exactStream).count() == 0L
      val nearStream = out.where(col("kind") === "near")
        .select("id", "match_id", "est_jaccard")
      val nearBatch = Dedup.incrementalEstPairs(
        Dedup.dedupState(batchDocs, "doc_id", "text"), state,
        threshold = 0.5, numHashes = 32, bands = 8, maxBandFreq = None)
        .select("id", "match_id", "est_jaccard")
      val nearParity =
        nearStream.exceptAll(nearBatch).count() +
          nearBatch.exceptAll(nearStream).count() == 0L
      Seq(
        ("exact_rows_equal_batch", exactParity),
        ("near_pairs_equal_batch", nearParity))
        .toDF("property", "ok").orderBy("property")
    }),
    // E212: curriculum epoch assignment — best-quality-first consumption
    // order, each doc lands in floor(tokens_before / 20000); the global
    // running sum is a WindowGuarded per-score rollup + per-score
    // partitioned windows, never a corpus-sized single task.
    "curriculum_epochs" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val d = documents(s, dir).select(
        col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"),
        TextFunctions.wsTokenCount(col("text")).as("toks"))
      graft.operators.Ranking.curriculumEpochs(
        d, "doc_id", "q", "toks", epochTokens = 20000L)
        .orderBy("id")
    }),
    // multimodal binary-column plumbing (documents text as opaque payload)
    "multimodal_features" -> ((s, dir) =>
      Multimodal.byteFeatures(Multimodal.asBinary(documents(s, dir)))
        .orderBy("doc_id")),
    // real container decode: every third doc is a constructed BMP / WAV
    // header (built from column expressions), parsed back by the JVM
    // decoders; the rest take the raw byte-feature path. Expected output is
    // a pure function of doc_id/text, recomputed by the DuckDB oracle.
    "multimodal_decode" -> ((s, dir) =>
      Multimodal.decodeFeatures(Multimodal.syntheticMedia(documents(s, dir)))
        .toDF().orderBy("doc_id")),
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.asBinary(documents(s, dir)))
        .orderBy("doc_id", "frame_idx")),
    // E206: image perceptual near-dup — dHash over REAL 24bpp pixel
    // arrays, Hamming-banded (SimHash pigeonhole). Images derive
    // deterministically from doc_id: class = doc_id/30 (bounded ~30-doc
    // near-dup clusters at ANY corpus size, so the lane grows linearly),
    // odd ids get a one-pixel perturbation — near-identical variants
    // byte-exact dedup misses. dHash bits are JVM-side → rows-only; the
    // audit twin pins brute-force pair equality.
    "image_near_dup" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      Multimodal.imageNearDup(bin, maxHamming = 5)
        .orderBy("id_a", "id_b")
    }),
    // E207: audio perceptual near-dup — energy-delta hash over real
    // 16-bit PCM WAV bodies, same pigeonhole banding and the same
    // bounded-class construction as E206 (clips from doc_id div 30,
    // odd ids get a one-block zero-out).
    "audio_near_dup" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      Multimodal.audioNearDup(bin, maxHamming = 5)
        .orderBy("id_a", "id_b")
    }),
    // E207 audit: same properties as the image twin — uncapped banded
    // pairs equal brute force, byte-identical clips at hamming 0,
    // canonical pairs.
    "audio_near_dup_audit" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir)
        .select(col("doc_id").cast("long")).where(col("doc_id") < 1200)
        .as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val sigs = Multimodal.audioDHashes(bin).localCheckpoint(true)
      val out = graft.operators.Dedup.simhashPairsFromSignatures(
        sigs, maxHamming = 5, maxBlockFreq = None).localCheckpoint(true)
      val brute = sigs.alias("a")
        .crossJoin(broadcast(sigs.alias("b")))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .as("hamming"))
        .where(col("hamming") <= 5)
      val equalsBrute =
        out.exceptAll(brute).count() + brute.exceptAll(out).count() == 0L
      val twins = bin.where(col("doc_id") % 2 === 0)
        .select(expr("doc_id div 30").as("cls"), col("doc_id").as("id"))
      val twinPairs = twins.alias("a").join(twins.alias("b"), Seq("cls"))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val nTwin = twinPairs.count()
      val twinsCaught = twinPairs
        .join(out.where(col("hamming") === 0), Seq("id_a", "id_b"))
        .count() == nTwin
      val canonical = out.where(col("id_a") >= col("id_b")).count() == 0L
      Seq(
        ("canonical_pairs", canonical),
        ("equals_bruteforce", equalsBrute),
        ("identical_twins_hamming_zero", twinsCaught))
        .toDF("property", "ok").orderBy("property")
    }),
    // E219: the ACTION half of E207 — the audio executor, same
    // larger-id rule and output convention as E208.
    "audio_dedup_execute" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      Multimodal.audioDedupExecute(bin, maxHamming = 5)
        .orderBy("doc_id")
    }),
    // E219 audit (VERDICT r12 task 4): the image executor's audit
    // verbatim — removals are exactly the distinct pair targets, every
    // duplicate component keeps its minimum id, and re-running on the
    // kept corpus finds zero pairs.
    "audio_dedup_execute_audit" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val bin = mkBin(documents(s, dir).where(col("doc_id") < 1200))
        .localCheckpoint(true)
      val pairs = Multimodal.audioNearDup(bin, maxHamming = 5)
        .localCheckpoint(true)
      val kept = Multimodal.audioDedupExecute(bin, maxHamming = 5)
        .localCheckpoint(true)
      val targets = pairs.select(col("id_b").as("doc_id")).distinct()
      val nAll = bin.count()
      val removalsExact =
        kept.count() == nAll - targets.count() &&
          kept.join(targets, Seq("doc_id")).count() == 0L
      val minKept = graft.operators.Clustering.dedupClusters(pairs)
        .groupBy("cluster_id").agg(min(col("doc_id")).as("doc_id"))
        .join(kept, Seq("doc_id"), "left_anti").count() == 0L
      val rerunPairs = Multimodal.audioNearDup(
        bin.join(kept.select("doc_id"), Seq("doc_id")), maxHamming = 5)
      val idempotent = rerunPairs.count() == 0L
      Seq(
        ("every_cluster_keeps_min_id", minKept),
        ("idempotent_on_kept_corpus", idempotent),
        ("removals_are_exactly_pair_targets", removalsExact))
        .toDF("property", "ok").orderBy("property")
    }),
    // E208: the ACTION half of E206 — drop every image with a
    // smaller-id neighbor within 5 bits, return the kept corpus
    // sha256-pinned (the E169 executor convention).
    "image_dedup_execute" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir).select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      Multimodal.imageDedupExecute(bin, maxHamming = 5)
        .orderBy("doc_id")
    }),
    // E208 audit: executor soundness — removals are exactly the pair
    // targets (distinct larger ids), every duplicate component keeps
    // its minimum id, and the executor is idempotent (re-running on the
    // kept corpus finds zero pairs: any surviving pair would have had
    // its larger member removed).
    "image_dedup_execute_audit" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val bin = mkBin(documents(s, dir).where(col("doc_id") < 1200))
        .localCheckpoint(true)
      val pairs = Multimodal.imageNearDup(bin, maxHamming = 5)
        .localCheckpoint(true)
      val kept = Multimodal.imageDedupExecute(bin, maxHamming = 5)
        .localCheckpoint(true)
      val targets = pairs.select(col("id_b").as("doc_id")).distinct()
      val nAll = bin.count()
      val removalsExact =
        kept.count() == nAll - targets.count() &&
          kept.join(targets, Seq("doc_id")).count() == 0L
      val minKept = graft.operators.Clustering.dedupClusters(pairs)
        .groupBy("cluster_id").agg(min(col("doc_id")).as("doc_id"))
        .join(kept, Seq("doc_id"), "left_anti").count() == 0L
      val rerunPairs = Multimodal.imageNearDup(
        bin.join(kept.select("doc_id"), Seq("doc_id")), maxHamming = 5)
      val idempotent = rerunPairs.count() == 0L
      Seq(
        ("every_cluster_keeps_min_id", minKept),
        ("idempotent_on_kept_corpus", idempotent),
        ("removals_are_exactly_pair_targets", removalsExact))
        .toDF("property", "ok").orderBy("property")
    }),
    // E209: in-engine Lloyd's k-means (training loop #6) — 3 assign/
    // E222: cross-batch incremental IMAGE dedup against the PERSISTED
    // signature store (VERDICT r12 task 6) — the E205 pattern for the
    // media lane: the store is (id, content_hash, simhash) rows written
    // once via StateStore (row-count sidecar included), batch doc_id >=
    // 400 dedups against it with the bloom-prefiltered exact stage and
    // the pigeonhole-banded near stage — no stored payload is ever
    // rescanned, and bloom sizing reads the store cardinality from the
    // artifact metadata (expectedItems), not a count job. dHash bits
    // are JVM-side → rows-only; the audit twin pins incremental ≡
    // whole-corpus, artifact ≡ in-memory, split-append ≡ one write,
    // and planted byte-identical re-ingests caught by both stages.
    "image_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val docs = documents(s, dir)
      val cut = 400L
      val path = s"/tmp/graft_img_state/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      if (graft.operators.Dedup.StateStore.rows(s, path).isEmpty)
        graft.operators.Dedup.StateStore.write(
          Multimodal.imageDedupState(mkBin(docs.where(col("doc_id") < cut))),
          path)
      graft.operators.Dedup.incrementalSimhash(
        Multimodal.imageDedupState(mkBin(docs.where(col("doc_id") >= cut))),
        graft.operators.Dedup.StateStore.read(s, path),
        maxHamming = 5,
        expectedItems = graft.operators.Dedup.StateStore.rows(s, path))
        .orderBy("id")
    }),
    // E222 audit — four pins: (a) incremental near pairs (uncapped) ≡
    // the whole-corpus detector's cross-cut pairs; (b) detection via
    // the parquet artifact ≡ via the in-memory state relation;
    // (c) store written as two appends ≡ one write (detection AND the
    // maintained row count); (d) planted byte-identical re-ingests of
    // stored images are caught by BOTH stages at hamming 0.
    "image_incremental_dedup_audit" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val docs = documents(s, dir).where(col("doc_id") < 1200)
        .select("doc_id")
      val cut = 400L
      val knownBin = mkBin(docs.where(col("doc_id") < cut))
        .localCheckpoint(true)
      val off = 1000000L
      val planted = knownBin
        .where(col("doc_id") % 20 === 0)
        .orderBy("doc_id").limit(10)
        .select((col("doc_id") + lit(off)).as("doc_id"), col("payload"))
      val batchBin = mkBin(docs.where(col("doc_id") >= cut))
        .unionByName(planted).localCheckpoint(true)
      val knownState = Multimodal.imageDedupState(knownBin)
        .localCheckpoint(true)
      val batchState = Multimodal.imageDedupState(batchBin)
        .localCheckpoint(true)
      def eq(a: DataFrame, b: DataFrame): Boolean =
        a.exceptAll(b).count() + b.exceptAll(a).count() == 0L
      val base = s"/tmp/graft_img_audit/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      val n1 = graft.operators.Dedup.StateStore.write(knownState, s"$base/whole")
      val viaArtifact = graft.operators.Dedup.incrementalSimhash(
        batchState, graft.operators.Dedup.StateStore.read(s, s"$base/whole"),
        maxHamming = 5, expectedItems = Some(n1)).localCheckpoint(true)
      val viaMemory = graft.operators.Dedup.incrementalSimhash(
        batchState, knownState, maxHamming = 5)
      val artifactEq = eq(viaArtifact, viaMemory)
      graft.operators.Dedup.StateStore.write(
        Multimodal.imageDedupState(knownBin.where(col("doc_id") % 2 === 0)),
        s"$base/split")
      val n2 = graft.operators.Dedup.StateStore.append(
        Multimodal.imageDedupState(knownBin.where(col("doc_id") % 2 =!= 0)),
        s"$base/split")
      val viaSplit = graft.operators.Dedup.incrementalSimhash(
        batchState, graft.operators.Dedup.StateStore.read(s, s"$base/split"),
        maxHamming = 5, expectedItems = Some(n2))
      val splitEq = eq(viaSplit, viaArtifact) && n2 == knownState.count()
      // cross-cut pair parity, uncapped both sides
      val incPairs = graft.operators.Dedup.incrementalSimhashPairs(
        batchState.where(col("simhash").isNotNull).select("id", "simhash"),
        knownState.where(col("simhash").isNotNull).select("id", "simhash"),
        maxHamming = 5, maxBlockFreq = None)
        .select(col("match_id").as("id_a"), col("id").as("id_b"),
          col("hamming"))
      val wholePairs = Multimodal.imageNearDup(
        knownBin.unionByName(batchBin), maxHamming = 5, maxBlockFreq = None)
        .where(col("id_a") < cut && col("id_b") >= cut)
      val pairsEq = eq(incPairs, wholePairs)
      val plantedRows = viaArtifact.where(col("id") >= off)
      val plantedCaught = plantedRows
        .where(col("dup_exact") && col("near_dup") && col("hamming") === 0)
        .count() == planted.count()
      Seq(
        ("artifact_equals_inmemory", artifactEq),
        ("cross_pairs_equal_whole_corpus", pairsEq),
        ("planted_reingests_caught", plantedCaught),
        ("split_append_equals_whole", splitEq))
        .toDF("property", "ok").orderBy("property")
    }),
    // E222 audio face: the SAME store schema and the SAME detector —
    // wavDHash signatures instead of dHashes; this key exists to pin
    // that the signature-typed store is modality-generic in the GATE,
    // not just in a spec.
    "audio_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val docs = documents(s, dir)
      val cut = 400L
      val path = s"/tmp/graft_wav_state/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      if (graft.operators.Dedup.StateStore.rows(s, path).isEmpty)
        graft.operators.Dedup.StateStore.write(
          Multimodal.audioDedupState(mkBin(docs.where(col("doc_id") < cut))),
          path)
      graft.operators.Dedup.incrementalSimhash(
        Multimodal.audioDedupState(mkBin(docs.where(col("doc_id") >= cut))),
        graft.operators.Dedup.StateStore.read(s, path),
        maxHamming = 5,
        expectedItems = graft.operators.Dedup.StateStore.rows(s, path))
        .orderBy("id")
    }),
    // E222 audio audit: the image audit's properties verbatim over the
    // envelope-hash store.
    "audio_incremental_dedup_audit" -> ((s, dir) => {
      import s.implicits._
      def mkBin(ids: DataFrame) = ids.select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticWav(
            id / 30L, 2080, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val docs = documents(s, dir).where(col("doc_id") < 1200)
        .select("doc_id")
      val cut = 400L
      val knownBin = mkBin(docs.where(col("doc_id") < cut))
        .localCheckpoint(true)
      val off = 1000000L
      val planted = knownBin
        .where(col("doc_id") % 20 === 0)
        .orderBy("doc_id").limit(10)
        .select((col("doc_id") + lit(off)).as("doc_id"), col("payload"))
      val batchBin = mkBin(docs.where(col("doc_id") >= cut))
        .unionByName(planted).localCheckpoint(true)
      val knownState = Multimodal.audioDedupState(knownBin)
        .localCheckpoint(true)
      val batchState = Multimodal.audioDedupState(batchBin)
        .localCheckpoint(true)
      def eq(a: DataFrame, b: DataFrame): Boolean =
        a.exceptAll(b).count() + b.exceptAll(a).count() == 0L
      val base = s"/tmp/graft_wav_audit/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      val n1 = graft.operators.Dedup.StateStore.write(knownState, s"$base/whole")
      val viaArtifact = graft.operators.Dedup.incrementalSimhash(
        batchState, graft.operators.Dedup.StateStore.read(s, s"$base/whole"),
        maxHamming = 5, expectedItems = Some(n1)).localCheckpoint(true)
      val viaMemory = graft.operators.Dedup.incrementalSimhash(
        batchState, knownState, maxHamming = 5)
      val artifactEq = eq(viaArtifact, viaMemory)
      graft.operators.Dedup.StateStore.write(
        Multimodal.audioDedupState(knownBin.where(col("doc_id") % 2 === 0)),
        s"$base/split")
      val n2 = graft.operators.Dedup.StateStore.append(
        Multimodal.audioDedupState(knownBin.where(col("doc_id") % 2 =!= 0)),
        s"$base/split")
      val viaSplit = graft.operators.Dedup.incrementalSimhash(
        batchState, graft.operators.Dedup.StateStore.read(s, s"$base/split"),
        maxHamming = 5, expectedItems = Some(n2))
      val splitEq = eq(viaSplit, viaArtifact) && n2 == knownState.count()
      val incPairs = graft.operators.Dedup.incrementalSimhashPairs(
        batchState.where(col("simhash").isNotNull).select("id", "simhash"),
        knownState.where(col("simhash").isNotNull).select("id", "simhash"),
        maxHamming = 5, maxBlockFreq = None)
        .select(col("match_id").as("id_a"), col("id").as("id_b"),
          col("hamming"))
      val wholePairs = Multimodal.audioNearDup(
        knownBin.unionByName(batchBin), maxHamming = 5, maxBlockFreq = None)
        .where(col("id_a") < cut && col("id_b") >= cut)
      val pairsEq = eq(incPairs, wholePairs)
      val plantedCaught = viaArtifact.where(col("id") >= off)
        .where(col("dup_exact") && col("near_dup") && col("hamming") === 0)
        .count() == planted.count()
      Seq(
        ("artifact_equals_inmemory", artifactEq),
        ("cross_pairs_equal_whole_corpus", pairsEq),
        ("planted_reingests_caught", plantedCaught),
        ("split_append_equals_whole", splitEq))
        .toDF("property", "ok").orderBy("property")
    }),
    // re-estimate alternations from the deterministic %83 init, the
    // whole trajectory hash-oracled (per-iteration chained CTEs).
    "kmeans_train" -> ((s, dir) =>
      Similarity.kmeansTrain(
        embeddings(s, dir), "vec_id", "embedding",
        initPred = col("vec_id") % 83 === 0, iters = 3)
        .orderBy("iter", "centroid_id")),
    // E210: temperature-scaled sampling mix (the mT5 alpha=0.3 recipe)
    // over languages — the baseline mixture E166's UniMax replaces.
    "temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(
        documents(s, dir), "lang", alpha = 0.3, targetTotal = 10000L)
        .orderBy("domain")),
    // E213: per-cluster z-scored embedding outliers — the noise screen
    // relative to local density, exact decimal mean/variance.
    "embedding_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(
        embeddings(s, dir), "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0)
        .orderBy("vec_id")),
    // E220: signature-store compaction — re-ingested identical content
    // collapses to its minimum-id row (batch 2 re-ingests every 5th
    // batch-1 doc under a new id, so the store really holds copies).
    // FULL hash oracle over (id, content_hash, n_copies).
    "dedup_state_compact" -> ((s, dir) => {
      val docs = documents(s, dir).select("doc_id", "text")
      val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val b1 = docs.where(col("doc_id") < 400)
      val b2 = docs.where(col("doc_id") >= 400)
        .unionByName(b1.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(off)).as("doc_id"), col("text")))
      val store = Dedup.dedupState(b1, "doc_id", "text")
        .unionByName(Dedup.dedupState(b2, "doc_id", "text"))
      Dedup.compactState(store)
        .select("id", "content_hash", "n_copies")
        .orderBy("id")
    }),
    // E220 audit: compaction is lossless for detection — the batch's
    // dup_exact/near_dup verdicts against the compacted store equal the
    // verdicts against the full store (match ids may legitimately move
    // to the surviving representative); one row per distinct content;
    // absorbed-copy mass preserved.
    "dedup_state_compact_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir).select("doc_id", "text")
      val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val known = docs.where(col("doc_id") < 300)
        .unionByName(docs.where(col("doc_id") < 300 && col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(off)).as("doc_id"), col("text")))
      val batch = docs.where(col("doc_id") >= 300 && col("doc_id") < 500)
      val store = Dedup.dedupState(known, "doc_id", "text")
        .localCheckpoint(true)
      val compacted = Dedup.compactState(store).drop("n_copies")
        .localCheckpoint(true)
      def flags(st: org.apache.spark.sql.DataFrame) =
        Dedup.incrementalLsh(batch, st, "doc_id", "text")
          .select("id", "dup_exact", "near_dup")
      val a = flags(store); val b = flags(compacted)
      val detectionInvariant =
        a.exceptAll(b).count() + b.exceptAll(a).count() == 0L
      val onePerContent = compacted.count() ==
        store.select("content_hash").distinct().count()
      val massPreserved = Dedup.compactState(store)
        .agg(sum(col("n_copies"))).head().getLong(0) == store.count()
      Seq(
        ("copy_mass_preserved", massPreserved),
        ("detection_flags_invariant", detectionInvariant),
        ("one_row_per_distinct_content", onePerContent))
        .toDF("property", "ok").orderBy("property")
    }),
    // E215: minhash-estimate calibration over the banded candidates —
    // per estimate decile, mean est vs mean EXACT Jaccard and the error
    // spread; the trust readout behind every store-only dedup verdict.
    // Band hashes engine-specific → rows-only; audit pins pair mass and
    // exact-value parity with the n-gram Jaccard relation.
    "minhash_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(
        documents(s, dir), "doc_id", "text")
        .orderBy("est_band")),
    "minhash_calibration_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val pairs = Dedup.calibrationPairs(
        docs, "doc_id", "text", 3, 32, 8, Some(10000))
        .localCheckpoint(true)
      val inRange = pairs.where(
        col("est") < 0.0 || col("est") > 1.0 ||
          col("exact") < 0.0 || col("exact") > 1.0).count() == 0L
      // pair-level exact values must equal the shared-shingle Jaccard
      // relation wherever the pair shares a shingle — and be 0 where it
      // does not (a band collision without overlap)
      val jacc = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
        threshold = 0.000001)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j"))
      val joined = pairs.join(jacc, Seq("id_a", "id_b"), "left")
      val exactParity = joined.where(
        (col("j").isNotNull && col("exact") =!= col("j")) ||
          (col("j").isNull && col("exact") =!= 0.0)).count() == 0L
      val rollupMass = Dedup.minhashCalibration(docs, "doc_id", "text")
        .agg(sum(col("n_pairs"))).head().getLong(0) == pairs.count()
      Seq(
        ("est_exact_in_unit_range", inRange),
        ("exact_matches_ngram_jaccard", exactParity),
        ("rollup_preserves_pair_mass", rollupMass))
        .toDF("property", "ok").orderBy("property")
    }),
    // E216: freshness decay weights per event day (tau = 30 days) — the
    // recency-weighted sampling plan; EXP parity, integer ages.
    "freshness_weights" -> ((s, dir) =>
      graft.operators.Events.freshnessWeights(
        s.read.parquet(s"$dir/events.parquet"), "ts")
        .orderBy("day")),
    // E217: near-dup pair EXPLAIN — top-20 pairs by Jaccard with the 5
    // lexicographically-smallest shared shingles as evidence.
    "dup_pair_explain" -> ((s, dir) =>
      Dedup.dupPairExplain(documents(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    // E218: duplicate-arrival rate per ingest batch (batch = doc_id div
    // 50; the E214 planted-boilerplate corpus so the rate is non-zero).
    "dedup_rate_by_batch" -> ((s, dir) =>
      Dedup.dedupRateByBatch(
        documents(s, dir)
          .withColumn("text",
            when(col("doc_id") % 7 === 0,
              concat(lit("shared boilerplate "),
                (col("doc_id") % 3).cast("string")))
              .otherwise(col("text")))
          .withColumn("ingest_batch", expr("doc_id div 50")),
        "doc_id", "text", batchCol = "ingest_batch")
        .orderBy("batch")),
    // E214: cross-source duplication matrix — distinct shared contents,
    // per-source totals and content-set Jaccard per source pair. Every
    // 7th doc is remapped to one of 3 canonical boilerplates (the
    // pii_scan input-construction precedent: the synthetic corpus has
    // no natural cross-source byte-dups, so the overlap the matrix
    // measures is planted identically in both engines).
    "cross_dedup_matrix" -> ((s, dir) =>
      Dedup.crossDedupMatrix(
        documents(s, dir).withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(lit("shared boilerplate "),
              (col("doc_id") % 3).cast("string")))
            .otherwise(col("text"))),
        "text", "source")
        .orderBy("source_a", "source_b")),
    // E206 audit: the banded path must equal the brute-force pairwise
    // scan EXACTLY (pigeonhole completeness: any pair within maxHamming
    // bits shares one of maxHamming+1 signature blocks — run uncapped
    // so the equality is unconditional); byte-identical images (even
    // ids sharing a class) must pair at hamming 0; pairs canonical.
    "image_near_dup_audit" -> ((s, dir) => {
      import s.implicits._
      val bin = documents(s, dir)
        .select(col("doc_id").cast("long")).where(col("doc_id") < 1200)
        .as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.syntheticBmp(
            id / 30L, 16, 16, if (id % 2 == 0) 0L else id))
        })
        .toDF("doc_id", "payload")
      val sigs = Multimodal.imageDHashes(bin).localCheckpoint(true)
      val out = graft.operators.Dedup.simhashPairsFromSignatures(
        sigs, maxHamming = 5, maxBlockFreq = None).localCheckpoint(true)
      val brute = sigs.alias("a")
        .crossJoin(broadcast(sigs.alias("b")))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .as("hamming"))
        .where(col("hamming") <= 5)
      val equalsBrute =
        out.exceptAll(brute).count() + brute.exceptAll(out).count() == 0L
      // even ids in one class are the byte-identical image; every such
      // pair must surface at hamming 0
      val twins = bin.where(col("doc_id") % 2 === 0)
        .select(expr("doc_id div 30").as("cls"), col("doc_id").as("id"))
      val twinPairs = twins.alias("a").join(twins.alias("b"), Seq("cls"))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val nTwin = twinPairs.count()
      val twinsCaught = twinPairs
        .join(out.where(col("hamming") === 0), Seq("id_a", "id_b"))
        .count() == nTwin
      val canonical = out.where(col("id_a") >= col("id_b")).count() == 0L
      Seq(
        ("canonical_pairs", canonical),
        ("equals_bruteforce", equalsBrute),
        ("identical_twins_hamming_zero", twinsCaught))
        .toDF("property", "ok").orderBy("property")
    }),
    // unicode canonicalization (custom codegen Expression): a combining-
    // sequence prefix is prepended so NFC composition is actually exercised
    // on the (ASCII) corpus; both engines build the identical input
    "text_normalize" -> ((s, dir) => {
      graft.functions.NfcNormalize.register(s)
      val input = concat(lit(NormPrefix), col("text"))
      val norm = graft.functions.NfcNormalize.normalizeText(input)
      documents(s, dir).select(
        col("doc_id"),
        length(input).cast("long").as("n_chars_raw"),
        length(norm).cast("long").as("n_chars_norm"),
        substring(sha2(norm, 256), 1, 16).as("norm_fingerprint"))
        .orderBy("doc_id")
    }),
    // IVF ANN: deterministic coarse quantizer (centroids = vec_id % 83 == 0,
    // the knn_assign cell structure), 2-probe search, exact rescoring within
    // probed cells only — the scale path of similarity search
    "ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(
        embeddings(s, dir), "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
        .orderBy("query_id", "neighbor_id")),
    // E221: IVF search served from the PERSISTED index artifact —
    // build-once/query-many (VERDICT r12 task 5): centroids +
    // per-vector cell assignment live in parquet (StateStore row-count
    // sidecars included); the query pays probe + rescore joins only.
    // Built at most once per JVM+sf (pure function of the data), so
    // bench iteration 2's min reflects the artifact-served query path.
    // Results are bit-identical to ivf_topk — same FULL hash oracle.
    "ivf_from_index" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val path = s"/tmp/graft_ivf/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      if (graft.operators.Dedup.StateStore.rows(s, s"$path/assign").isEmpty)
        Similarity.writeIvfIndex(
          emb, "vec_id", "embedding", col("vec_id") % 83 === 0, path)
      Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0,
        index = Some(Similarity.readIvfIndex(s, path)))
        .orderBy("query_id", "neighbor_id")
    }),
    // E221 audit: (a) artifact-served ≡ in-plan recompute (ivf_topk
    // and hard_negatives_ann both); (b) split-build + batch append ≡
    // whole build (assignment is a pure per-vector function — the E205
    // merge property for the ANN lane); (c) the StateStore row-count
    // sidecars match the true relation counts.
    "ivf_from_index_audit" -> ((s, dir) => {
      import s.implicits._
      val emb = embeddings(s, dir).localCheckpoint(true)
      val base = s"/tmp/graft_ivf_audit/p${ProcessHandle.current().pid()}_" +
        new java.io.File(dir).getName
      val cPred = col("vec_id") % 83 === 0
      val qPred = col("vec_id") % 97 === 0
      val (ncents, nassign) = Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", cPred, s"$base/whole")
      val idx = Similarity.readIvfIndex(s, s"$base/whole")
      def eq(a: DataFrame, b: DataFrame): Boolean =
        a.exceptAll(b).count() + b.exceptAll(a).count() == 0L
      val fromIdx = Similarity.ivfTopK(
        emb, "vec_id", "embedding", cPred, qPred, index = Some(idx))
      val inPlan = Similarity.ivfTopK(emb, "vec_id", "embedding", cPred, qPred)
      val artifactEq = eq(fromIdx, inPlan)
      // hard-negatives parity: index over the label-filtered relation
      // (unlabeled vectors never enter that operator's index)
      val labeled = emb.where(col("label").isNotNull)
      Similarity.writeIvfIndex(
        labeled, "vec_id", "embedding", cPred, s"$base/labeled")
      val hnFromIdx = Similarity.hardNegativesAnn(
        emb, "vec_id", "embedding", "label", cPred, qPred,
        index = Some(Similarity.readIvfIndex(s, s"$base/labeled")))
      val hnInPlan = Similarity.hardNegativesAnn(
        emb, "vec_id", "embedding", "label", cPred, qPred)
      val hnEq = eq(hnFromIdx, hnInPlan)
      // split-build + append ≡ whole build: the quantizer is FIXED at
      // initial build (append assigns against persisted centroids, it
      // never extends them), so the reference is a whole-corpus build
      // over the SAME centroid set — the initial batch's
      val splitPred = cPred && col("vec_id") % 2 === 0
      Similarity.writeIvfIndex(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
        splitPred, s"$base/split")
      val nAfter = Similarity.appendIvfIndex(
        emb.where(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
        s"$base/split")
      Similarity.writeIvfIndex(
        emb, "vec_id", "embedding", splitPred, s"$base/ref")
      val refIdx = Similarity.readIvfIndex(s, s"$base/ref")
      val splitIdx = Similarity.readIvfIndex(s, s"$base/split")
      val appendEq = eq(splitIdx._2, refIdx._2) && nAfter == refIdx._2.count()
      val metaOk =
        graft.operators.Dedup.StateStore.rows(s, s"$base/whole/centroids")
          .contains(idx._1.count()) &&
          graft.operators.Dedup.StateStore.rows(s, s"$base/whole/assign")
            .contains(idx._2.count()) &&
          ncents == idx._1.count() && nassign == idx._2.count()
      Seq(
        ("append_equals_whole", appendEq),
        ("artifact_equals_inplan", artifactEq),
        ("hard_negatives_from_index_parity", hnEq),
        ("meta_counts_match", metaOk))
        .toDF("property", "ok").orderBy("property")
    }),
    // simplified silhouette (E201): per cluster, mean + worst member
    // (b-a)/max(a,b) against own vs nearest-other centroid — the
    // internal clustering-quality measure beside E200's external purity
    "silhouette" -> ((s, dir) =>
      Similarity.silhouette(
        embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 83 === 0)
        .orderBy("centroid_id")),
    // kNN label probe (E199): leave-one-out majority vote over the
    // brute-force top-10 — the no-training embedding-quality eval
    "knn_label_eval" -> ((s, dir) =>
      Similarity.knnLabelEval(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 97 === 0)
        .orderBy("query_id")),
    // cluster label purity (E200): per nearest-centroid cluster, the
    // majority label + purity fraction — do the IVF cells respect
    // semantics
    "cluster_purity" -> ((s, dir) =>
      Similarity.clusterPurity(
        embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 83 === 0)
        .orderBy("centroid_id")),
    // MMR diversified re-rank (E193): greedy maximal marginal relevance
    // over the brute-force pool — selection keys 6-dp, chained stages,
    // query-parallel (no driver loop over queries)
    "mmr_diversify" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val pool = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      Similarity.mmrDiversify(
        pool, emb, "query_id", "neighbor_id", "cos", "vec_id", "embedding")
        .orderBy("query_id", "rank")
    }),
    // ANN recall curve (E194): recall@k for k=1..10 of the IVF run vs
    // the exact top-k — mean and worst-query recall per k
    "recall_curve" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val sys = Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
      val ex = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      graft.operators.Search.recallCurve(
        sys, ex, "query_id", "neighbor_id", "cos")
        .orderBy("k")
    }),
    // NDCG@10 eval (E189): the IVF run graded against the brute-force
    // top-10 pool (pooled-judgment semantics, unjudged gain 0); rank
    // discounts are precomputed literals, terms decimal-summed
    "ndcg_eval" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val sys = Similarity.ivfTopK(
        emb, "vec_id", "embedding",
        centroidPred = col("vec_id") % 83 === 0,
        queryPred = col("vec_id") % 97 === 0)
      val pool = Similarity.cosineTopK(
        emb, "vec_id", "embedding", col("vec_id") % 97 === 0)
      graft.operators.Search.ndcgAtK(
        sys, pool, "query_id", "neighbor_id", "cos", "cos")
        .orderBy("query_id")
    }),
    // int8 scalar quantization report per embedding vector
    "embedding_quantize" -> ((s, dir) =>
      graft.operators.Quantize.int8Scalar(embeddings(s, dir), "vec_id", "embedding")
        .orderBy("vec_id")),
    // greedy token-budget curation: best-quality prefix within 20k tokens
    "budget_select" -> ((s, dir) =>
      graft.operators.Packing.selectUnderBudget(
        documents(s, dir).select(
          col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).as("n_tokens"),
          round(TextFunctions.qualityScore(col("text")), 6).as("score")),
        "doc_id", "n_tokens", "score", budget = 20000L)
        .orderBy("doc_id")),
    // corpus bigram frequencies (one BPE merge round's pair table)
    "bigram_topk" -> ((s, dir) =>
      TextFunctions.bigramTopK(documents(s, dir), "text", k = 50)),
    // PMI-ranked collocations (E112): association, not raw frequency
    "collocations_pmi" -> ((s, dir) =>
      TextFunctions.collocationsPmi(documents(s, dir), "text",
        minFreq = 5, k = 50)),
    // reciprocal-rank fusion (E113) of three independent rankings
    "rrf_fuse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = documents(s, dir)
      def ranked(key: org.apache.spark.sql.Column) = docs
        .select(col("doc_id"), key.as("k"))
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("k").desc_nulls_last, col("doc_id").asc)).as("rank"))
      graft.operators.Search.rrfFuse(
        Seq(
          ranked(round(TextFunctions.qualityScore(col("text")), 6)),
          ranked(col("n_chars")),
          ranked(TextFunctions.wsTokenCount(col("text")))),
        "doc_id", "rank", k0 = 60, k = 30)
    }),
    // curation funnel: survivors per cumulative filter stage, one scan
    "filter_funnel" -> ((s, dir) =>
      graft.operators.Funnel.filterFunnel(
        documents(s, dir), Seq(
          "has_text" -> (length(col("text")) > 0),
          "min_tokens_10" -> (TextFunctions.wsTokenCount(col("text")) >= 10),
          "lang_known" -> (TextFunctions.langId(col("text")) =!= "und"),
          "quality_045" -> (round(TextFunctions.qualityScore(col("text")), 6) >= 0.45)))),
    // deterministic training-order shuffle into 16 hash shards
    "corpus_shuffle" -> ((s, dir) =>
      Sampling.shuffleShards(documents(s, dir), "doc_id", nShards = 16)
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")),
    // one deterministic Lloyd half-step: per-cell per-dim DECIMAL-exact
    // means of the nearest-centroid assignment (closes E35's re-estimation
    // exclusion — decimal quantization makes the mean order-independent)
    "centroid_update" -> ((s, dir) =>
      Similarity.centroidUpdate(
        embeddings(s, dir), "vec_id", "embedding", col("vec_id") % 83 === 0)
        .orderBy("centroid_id", "dim")),
    // winnowing (k=8, w=4): selected (pos, hash) fingerprints per document
    "winnow_fingerprint" -> ((s, dir) =>
      Dedup.winnowFingerprints(documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "pos")),
    // MOSS-style near-dup pairs over shared winnowing fingerprints (E73):
    // local-match detector complementing MinHash's global resemblance
    "winnow_near_dup" -> ((s, dir) =>
      Dedup.winnowNearDup(documents(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    // exact-substring duplicate spans (E156): pairs sharing a verbatim
    // run >= 30 chars, with the maximal span's offsets — winnowing
    // anchors + codegen'd maximal extension; fully hash-oracled (DuckDB
    // mirrors the extension as a zip-based longest-common-prefix)
    "substring_dup" -> ((s, dir) =>
      Dedup.substringDup(documents(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    // E156's per-document readout: fraction of each touched document's
    // chars inside >= 30-char cross-document verbatim runs (interval
    // union via doc-partitioned gap-and-islands — never double-counted)
    "substring_dup_coverage" -> ((s, dir) =>
      Dedup.substringDupCoverage(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // intra-document longest repeated substring (E162): exact char-level
    // self-repetition — the within-document half of substring dedup
    "self_repeat" -> ((s, dir) =>
      Dedup.selfRepeat(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // intra-doc repetition-removal EXECUTOR (E188): every >=20-char
    // repeated run keeps its earliest occurrence, the later span cut by
    // the shared broadcast interval kernel; cleaned text sha256-pinned
    "self_repeat_execute" -> ((s, dir) =>
      Dedup.selfRepeatExecute(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // chunking front-end (r11): the substring family accepting ANY
    // document length — over-cap docs split into k−1-overlap char
    // chunks, anchors deduped across overlaps, offsets remapped to
    // GLOBAL coordinates. With every sf0.01 doc under one chunk the
    // results are EXACTLY the unchunked forms', so both keys share the
    // unchunked hash oracles; the >2^20-char path is spec-driven
    // (Round11Spec).
    "substring_dup_chunked" -> ((s, dir) =>
      Dedup.substringDupChunked(documents(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")),
    "self_repeat_chunked" -> ((s, dir) =>
      Dedup.selfRepeatChunked(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // span-level train/eval decontamination (E161): verbatim runs leaking
    // from the corpus into a pseudo held-out slice (doc_id % 101 == 0)
    "substring_contamination" -> ((s, dir) => {
      val d = documents(s, dir)
      Dedup.substringContamination(
        d.where(col("doc_id") % 101 =!= 0),
        d.where(col("doc_id") % 101 === 0),
        "doc_id", "text")
        .orderBy("corpus_id", "eval_id")
    }),
    // decontamination EXECUTOR (E169): the cut action for E161 — leaked
    // spans removed from the corpus side, cleaned text pinned by sha256
    // (full hash oracle over the rebuilt strings; payloads never shuffle)
    "decontam_execute" -> ((s, dir) => {
      val d = documents(s, dir)
      Dedup.decontamExecute(
        d.where(col("doc_id") % 101 =!= 0),
        d.where(col("doc_id") % 101 === 0),
        "doc_id", "text")
        .orderBy("doc_id")
    }),
    // exact-substring self-dedup EXECUTOR (E170): Lee et al.'s ExactSubstr
    // action — every cross-doc verbatim run >=30 chars keeps its lowest-id
    // occurrence, all others cut; full corpus returned, sha256-pinned
    "substring_dup_execute" -> ((s, dir) =>
      Dedup.substringDupExecute(documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),
    // approximate cross-table key overlap (E163): three HLLs in ONE
    // aggregation over a tagged union + inclusion-exclusion — the
    // no-join, sketch-mergeable scale path to referential containment.
    // HLL values are engine-specific -> rows-only; the audit pins them.
    "approx_overlap" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      graft.profiler.Integrity.approxOverlap(
        ord, "o_custkey", cust, "c_custkey",
        "orders.o_custkey~customer.c_custkey")
    }),
    // E163 audit: every HLL estimate within the standard-error bound
    // (0.15 = 3x the default 5% rsd) of its exact twin; the derived
    // overlap within the summed bound; containments consistent
    "approx_overlap_audit" -> ((s, dir) => {
      import s.implicits._
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val est = graft.profiler.Integrity.approxOverlap(
        ord, "o_custkey", cust, "c_custkey", "r").head()
      val ka = ord.select(col("o_custkey").cast("string").as("k"))
        .where(col("k").isNotNull)
      val kb = cust.select(col("c_custkey").cast("string").as("k"))
        .where(col("k").isNotNull)
      val exact = ka.withColumn("s", lit("a"))
        .unionByName(kb.withColumn("s", lit("b")))
        .agg(
          countDistinct(col("k")).as("u"),
          countDistinct(when(col("s") === "a", col("k"))).as("na"),
          countDistinct(when(col("s") === "b", col("k"))).as("nb"))
        .head()
      val (u, na, nb) = (exact.getLong(0), exact.getLong(1), exact.getLong(2))
      val overlap = na + nb - u
      def within(e: Long, x: Long) = math.abs(e - x) <= 0.15 * x
      Seq(
        ("n_a_within_bound", within(est.getLong(1), na)),
        ("n_b_within_bound", within(est.getLong(2), nb)),
        ("n_union_within_bound", within(est.getLong(3), u)),
        ("overlap_within_summed_bound",
          math.abs(est.getLong(4) - overlap) <= 0.15 * (na + nb + u).toDouble),
        ("containments_consistent", {
          val ca = est.getAs[java.lang.Double]("containment_a")
          val cb = est.getAs[java.lang.Double]("containment_b")
          ca != null && cb != null && ca >= 0 && ca <= 1.5 && cb >= 0 && cb <= 1.5 &&
            math.abs(ca * est.getLong(1) - est.getLong(4)) <= 1 + 1e-6 * est.getLong(4) &&
            math.abs(cb * est.getLong(2) - est.getLong(4)) <= 1 + 1e-6 * est.getLong(4)
        }))
        .toDF("property", "ok").orderBy("property")
    }),
    // E163 persisted-state path (r11): per-table HLL key-sketch states
    // written to parquet, read back, and the overlap answered from the
    // two sketch ROWS — zero table rescans. Rows-only (HLL values are
    // engine-specific); the audit pins bit-equality with the direct
    // computation and split-merge losslessness.
    "approx_overlap_states" -> ((s, dir) => {
      val root = java.nio.file.Files
        .createTempDirectory("graft_overlap_states_").toString
      graft.profiler.Integrity.keySketchState(
        s.read.parquet(s"$dir/orders.parquet"), "o_custkey", "orders")
        .write.mode("overwrite").parquet(s"$root/orders_state")
      graft.profiler.Integrity.keySketchState(
        s.read.parquet(s"$dir/customer.parquet"), "c_custkey", "customer")
        .write.mode("overwrite").parquet(s"$root/customer_state")
      graft.profiler.Integrity.approxOverlapFromStates(
        s.read.parquet(s"$root/orders_state"),
        s.read.parquet(s"$root/customer_state"),
        "orders.o_custkey~customer.c_custkey")
    }),
    "approx_overlap_states_audit" -> ((s, dir) => {
      import s.implicits._
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val root = java.nio.file.Files
        .createTempDirectory("graft_overlap_states_audit_").toString
      graft.profiler.Integrity.keySketchState(ord, "o_custkey", "orders")
        .write.mode("overwrite").parquet(s"$root/a")
      graft.profiler.Integrity.keySketchState(cust, "c_custkey", "customer")
        .write.mode("overwrite").parquet(s"$root/b")
      val persisted = graft.profiler.Integrity.approxOverlapFromStates(
        s.read.parquet(s"$root/a"), s.read.parquet(s"$root/b"), "r")
        .head()
      // direct path: same sketch computation, no persistence round-trip
      val direct = graft.profiler.Integrity.approxOverlapFromStates(
        graft.profiler.Integrity.keySketchState(ord, "o_custkey", "orders"),
        graft.profiler.Integrity.keySketchState(cust, "c_custkey", "customer"),
        "r").head()
      // split-merge losslessness: sketch each half of orders separately,
      // union the persisted halves, and the estimate must equal the
      // whole-table sketch's (HLL registers are max-merged — exact)
      graft.profiler.Integrity.keySketchState(
        ord.where(col("o_orderkey") % 2 === 0), "o_custkey", "orders_even")
        .write.mode("overwrite").parquet(s"$root/h0")
      graft.profiler.Integrity.keySketchState(
        ord.where(col("o_orderkey") % 2 =!= 0), "o_custkey", "orders_odd")
        .write.mode("overwrite").parquet(s"$root/h1")
      val merged = s.read.parquet(s"$root/h0")
        .unionByName(s.read.parquet(s"$root/h1"))
        .agg(hll_union_agg(col("hll")).as("hll"))
        .select(hll_sketch_estimate(col("hll")).as("est"))
        .head().getLong(0)
      val whole = s.read.parquet(s"$root/a")
        .select(hll_sketch_estimate(col("hll")).as("est"))
        .head().getLong(0)
      Seq(
        ("estimates_match_rescan",
          (1 to 4).forall(i => persisted.getLong(i) == direct.getLong(i)) &&
            persisted.getAs[java.lang.Double]("containment_a") ==
              direct.getAs[java.lang.Double]("containment_a") &&
            persisted.getAs[java.lang.Double]("containment_b") ==
              direct.getAs[java.lang.Double]("containment_b")),
        ("split_merge_lossless", merged == whole),
        ("overlap_nonnegative", persisted.getLong(4) >= 0L))
        .toDF("property", "ok").orderBy("property")
    }),
    // cross-table referential-integrity profile over the star schema's
    // two fact edges (key relations only — payloads never shuffle)
    "referential_integrity" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      graft.profiler.Integrity
        .referential(li, "l_orderkey", ord, "o_orderkey",
          "lineitem.l_orderkey->orders.o_orderkey")
        .unionByName(graft.profiler.Integrity
          .referential(ord, "o_custkey", cust, "c_custkey",
            "orders.o_custkey->customer.c_custkey"))
        .orderBy("relation")
    }),
    // exact candidate-key screen over orders column combos (one Expand pass)
    "candidate_keys" -> ((s, dir) =>
      graft.profiler.Integrity.candidateKeys(
        s.read.parquet(s"$dir/orders.parquet"),
        Seq(Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderstatus"),
          Seq("o_custkey", "o_orderdate")))
        .orderBy("key_cols")),
    // per-domain doc-length percentile table (E82)
    "grouped_quantiles" -> ((s, dir) =>
      graft.profiler.RobustStats.groupedQuantiles(
        documents(s, dir), "source", "n_chars",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("source")),
    // E82's 100 TB mode (r8): per-group KLL sketch battery — fixed-size
    // state per group, estimates extracted distributed. Approximate →
    // no hash oracle; grouped_quantiles_audit pins the rank bound.
    "grouped_quantiles_approx" -> ((s, dir) =>
      graft.profiler.RobustStats.groupedQuantilesApprox(
        documents(s, dir), "source", "n_chars",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
        .orderBy("source")),
    "grouped_quantiles_audit" -> ((s, dir) => {
      import s.implicits._
      val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
      val docs = documents(s, dir)
      val est = graft.profiler.RobustStats.groupedQuantilesApprox(
        docs, "source", "n_chars", ps)
      val exact = graft.profiler.RobustStats.groupedQuantiles(
        docs, "source", "n_chars", ps)
      // group-relation parity with the exact twin (same groups, same n)
      val pcols = ps.map(p => s"p${(p * 100).round}")
      val keyMismatch = est.select("source", "n")
        .join(exact.select("source", "n"), Seq("source", "n"), "full_outer")
        .where(col("n").isNull).count()
      // per-(group, p) rank bound, checked against the DATA (E109/KLL
      // convention): rank window of the estimate within its group must
      // cover p ± 3ε. One broadcast join of the metadata-sized estimate
      // relation + one grouped conditional-count pass.
      val eps = 3 * 0.0165
      val joined = docs.select(col("source"), col("n_chars"))
        .join(broadcast(est.select(
          col("source") +: pcols.map(c => col(c).as(s"e_$c")): _*)),
          Seq("source"))
      val aggs = pcols.flatMap(c => Seq(
        count(when(col("n_chars") < col(s"e_$c"), 1)).as(s"lt_$c"),
        count(when(col("n_chars") <= col(s"e_$c"), 1)).as(s"le_$c"))) :+
        count(col("n_chars")).as("nn")
      val ranks = joined.groupBy("source").agg(aggs.head, aggs.tail: _*)
        .collect()
      val allInBound = ranks.forall { r =>
        val nn = r.getAs[Long]("nn").toDouble
        ps.zip(pcols).forall { case (p, c) =>
          r.getAs[Long](s"le_$c") >= (p - eps) * nn &&
            r.getAs[Long](s"lt_$c") + 1 <= (p + eps) * nn
        }
      }
      // quantile estimates are monotone in p within every group
      val mono = est.collect().forall { r =>
        val vs = pcols.map(c => r.getAs[Double](c))
        vs.zip(vs.tail).forall { case (a, b) => a <= b }
      }
      Seq(
        ("all_quantiles_within_rank_bound", allInBound),
        ("groups_and_counts_match_exact", keyMismatch == 0L),
        ("monotone_within_group", mono))
        .toDF("property", "ok").orderBy("property")
    }),
    // inferred-type histogram over string-typed landing-zone columns (E81)
    "inferred_types" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet").select(
        col("c_custkey").cast("string").as("id_str"),
        col("c_acctbal").cast("string").as("bal_str"),
        (col("c_acctbal") > lit(0)).cast("string").as("pos_str"),
        when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment")).as("seg_null"),
        when(col("c_custkey") % 3 === 0, col("c_custkey").cast("string"))
          .otherwise(col("c_mktsegment")).as("mixed"))
      graft.profiler.TypeInference.inferredTypes(
        c, Seq("id_str", "bal_str", "pos_str", "seg_null", "mixed"))
        .orderBy("instance")
    }),
    // chi-square independence test over the same pairs (E99)
    "chi_square" -> ((s, dir) =>
      graft.profiler.MutualInfo.chiSquare(
        s.read.parquet(s"$dir/orders.parquet"),
        Seq(("o_orderstatus", "o_orderpriority"),
          ("o_orderstatus", "o_custkey")))
        .orderBy("col_a", "col_b")),
    // directional uncertainty coefficients over the same pairs (E105)
    "theils_u" -> ((s, dir) =>
      graft.profiler.MutualInfo.theilsU(
        s.read.parquet(s"$dir/orders.parquet"),
        Seq(("o_orderstatus", "o_orderpriority"),
          ("o_orderstatus", "o_custkey")))
        .orderBy("col_a", "col_b")),
    // pairwise mutual information over the categorical columns (E80)
    "mutual_info" -> ((s, dir) =>
      graft.profiler.MutualInfo.pairs(
        s.read.parquet(s"$dir/orders.parquet"),
        Seq(("o_orderstatus", "o_orderpriority"),
          ("o_orderpriority", "o_custkey"), ("o_orderstatus", "o_custkey")))
        .orderBy("col_a", "col_b")),
    // per-partition file profiling over a Hive-partitioned layout (E92):
    // the partition column comes from directory names; a filter on it
    // prunes whole directories (PartitionFilters — plan-audited)
    "partitioned_profile" -> ((s, dir) => {
      val staged = graft.sources.FormatRoundtrip.stagePartitioned(
        s, s"$dir/documents.parquet", "bucket", col("doc_id") % 4)
      s.read.parquet(staged)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(col("text")).as("n_with_text"),
          sum(coalesce(
            graft.functions.TextFunctions.wsTokenCount(col("text")), lit(0L)))
            .cast("long").as("n_tokens"))
        .orderBy("bucket")
    }),
    // blocked fuzzy entity matching (E101): last-char-dropped "dirty"
    // variants of every 20th customer name matched back to the clean
    // reference by Levenshtein inside prefix blocks
    "fuzzy_match" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val dirty = cust.where(col("c_custkey") % 20 === 0)
        .select(col("c_custkey").as("dirty_id"),
          expr("substring(c_name, 1, length(c_name) - 1)").as("dirty_name"))
      graft.operators.FuzzyJoin.fuzzyMatch(
        dirty, cust, "dirty_id", "c_custkey", "dirty_name", "c_name",
        blockLen = 12, maxDist = 1)
        .orderBy("left_id", "right_id")
    }),
    // exact-decile curriculum bucketing (E88)
    "quantile_buckets" -> ((s, dir) =>
      graft.operators.Sampling.quantileBuckets(
        documents(s, dir), "doc_id", "n_chars", nBuckets = 10)
        .orderBy("doc_id")),
    // quality-ranked top-10 documents per language (E107)
    "topk_by_quality" -> ((s, dir) => {
      val scored = documents(s, dir).select(
        col("doc_id"), col("lang"),
        round(TextFunctions.qualityScore(col("text")), 6).as("score"))
      graft.operators.Sampling.topKByScore(
        scored, "lang", "doc_id", col("score"), k = 10)
        .orderBy("lang", "doc_id")
    }),
    // source-concentration Gini over per-domain token volume (E106)
    "gini_concentration" -> ((s, dir) =>
      graft.operators.CorpusStats.giniConcentration(
        documents(s, dir), "source", "text")),
    // dedup-weighted effective corpus size (E89)
    "effective_tokens" -> ((s, dir) =>
      graft.operators.CorpusStats.effectiveTokens(
        documents(s, dir), "doc_id", "text")),
    // one-pass CUBE rollup with grouping flags (E90)
    "corpus_cube" -> ((s, dir) =>
      graft.operators.CorpusStats.corpusCube(
        documents(s, dir), "lang", "source", "text")
        .orderBy("g_lang", "g_source", "lang", "source")),
    // CDC-style snapshot reconciliation (E87): deterministic before/after
    // variants of orders — keys ending 3 appear, 7 vanish, 5 change price
    "snapshot_diff" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val before = o.where(col("o_orderkey") % 10 =!= 3)
      val after = o.where(col("o_orderkey") % 10 =!= 7)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 5, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.profiler.SnapshotDiff.diff(before, after,
        Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
        .orderBy("o_orderkey")
    }),
    // source-format roundtrips (R1/R12 breadth): stage out through the
    // format's writer, read back with the parquet schema, must equal the
    // original cell-for-cell
    "csv_roundtrip" -> ((s, dir) =>
      graft.sources.FormatRoundtrip
        .roundtrip(s, s"$dir/documents.parquet", "csv")
        .orderBy("doc_id")),
    "json_roundtrip" -> ((s, dir) =>
      graft.sources.FormatRoundtrip
        .roundtrip(s, s"$dir/part.parquet", "json")
        .orderBy("p_partkey")),
    "orc_roundtrip" -> ((s, dir) =>
      graft.sources.FormatRoundtrip
        .roundtrip(s, s"$dir/customer.parquet", "orc")
        .orderBy("c_custkey")),
    // format-validation compliance (E85): expected-regex match ratios
    "pattern_match" -> ((s, dir) =>
      graft.profiler.Checks.patternMatch(
        s.read.parquet(s"$dir/customer.parquet"), patternSpecs)
        .orderBy("check_name", "instance")),
    // per-segment completeness: the null profile whole-table averages hide
    "segmented_completeness" -> ((s, dir) => {
      graft.profiler.Checks.segmentedCompleteness(
        s.read.parquet(s"$dir/events.parquet"), "event_type",
        Seq("event_id", "ts", "user_id", "value", "props"))
        .orderBy("segment", "instance")
    }),
    // join-key skew diagnostic on the orders→customer key
    "key_skew" -> ((s, dir) =>
      graft.profiler.Checks.keySkew(
        s.read.parquet(s"$dir/orders.parquet"), "o_custkey")),
    // URL canonicalization + per-domain cap over rendered messy URLs (the
    // pii_scan precedent: input constructed identically in both engines)
    "url_normalize" -> ((s, dir) => {
      val u = concat(
        lit("HTTPS://WWW."), upper(col("source")), lit(".CoM"),
        when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/"), col("doc_id").cast("string"),
        when(col("doc_id") % 4 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#Frag")).otherwise(lit("")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("domain").orderBy("doc_id")
      documents(s, dir).select(
        col("doc_id"),
        graft.functions.UrlFunctions.normalizeUrl(u).as("url_norm"),
        graft.functions.UrlFunctions.domain(u).as("domain"))
        .withColumn("domain_rank", row_number().over(w).cast("long"))
        .withColumn("kept", col("domain_rank") <= 20)
        .orderBy("doc_id")
    }),
    // strict-order conversion funnel over the event stream table
    "event_funnel" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("user_id"),
        graft.operators.Events.tsMicros(ev, "ts").as("ts_us"), col("event_type"))
      graft.operators.Events.funnel(
        e, "user_id", "ts_us", "event_type", Seq("signup", "view", "purchase"))
        .orderBy("stage")
    }),
    // funnel time-to-convert latency distribution (E102)
    "time_to_convert" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("user_id"),
        graft.operators.Events.tsMicros(ev, "ts").as("ts_us"), col("event_type"))
      graft.operators.Events.timeToConvert(
        e, "user_id", "ts_us", "event_type", Seq("signup", "view", "purchase"))
        .orderBy("transition")
    }),
    // E102 scale lane: grouped KLL sketches replace the per-transition
    // collect_list delta buffer; rows-only (randomized compaction),
    // pinned by time_to_convert_audit's 3ε rank intervals
    "time_to_convert_approx" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("user_id"),
        graft.operators.Events.tsMicros(ev, "ts").as("ts_us"),
        col("event_type"))
      graft.operators.Events.timeToConvertApprox(
        e, "user_id", "ts_us", "event_type", Seq("signup", "view", "purchase"))
        .orderBy("transition")
    }),
    "time_to_convert_audit" -> ((s, dir) => {
      import s.implicits._
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("user_id"),
        graft.operators.Events.tsMicros(ev, "ts").as("ts_us"),
        col("event_type"))
      val stages = Seq("signup", "view", "purchase")
      val approx = graft.operators.Events.timeToConvertApprox(
        e, "user_id", "ts_us", "event_type", stages).collect()
        .map(r => r.getString(0) -> r).toMap
      val deltas = graft.operators.Events.convertDeltas(
        e, "user_id", "ts_us", "event_type", stages)
      val names = stages.sliding(2).zipWithIndex
        .map { case (Seq(x, y), i) => (i, s"$x->$y") }.toSeq
      // display values are 6-dp-rounded (≤5e-7 s shift); atoms are ≥1 µs
      // apart, so a 6e-7 back-off keeps both counts conservative
      val tol = 6e-7
      val aggs = names.flatMap { case (i, nm) =>
        val r = approx(nm)
        if (r.isNullAt(2)) Seq(count(when(col("i") === i, 1)).as(s"n_$i"))
        else {
          val (v50, v90) = (r.getDouble(2), r.getDouble(3))
          Seq(
            count(when(col("i") === i, 1)).as(s"n_$i"),
            count(when(col("i") === i && col("delta_s") < v50 - tol, 1))
              .as(s"lt50_$i"),
            count(when(col("i") === i && col("delta_s") <= v50 + tol, 1))
              .as(s"le50_$i"),
            count(when(col("i") === i && col("delta_s") < v90 - tol, 1))
              .as(s"lt90_$i"),
            count(when(col("i") === i && col("delta_s") <= v90 + tol, 1))
              .as(s"le90_$i"))
        }
      }
      val ex = deltas.agg(aggs.head, aggs.tail: _*).head()
      val rows = names.map { case (i, nm) =>
        val r = approx(nm)
        val nOk = r.getLong(1) == ex.getAs[Long](s"n_$i")
        if (r.isNullAt(2)) (nm, nOk, ex.getAs[Long](s"n_$i") == 0L,
          ex.getAs[Long](s"n_$i") == 0L)
        else {
          val n = ex.getAs[Long](s"n_$i").toDouble
          val slack = 3.0 * r.getDouble(4)
          def ok(p: Double, lt: String, le: String): Boolean =
            ex.getAs[Long](lt) / n <= p + slack &&
              ex.getAs[Long](le) / n >= p - slack
          (nm, nOk, ok(0.5, s"lt50_$i", s"le50_$i"),
            ok(0.9, s"lt90_$i", s"le90_$i"))
        }
      }
      rows.toDF("transition", "n_ok", "p50_ok", "p90_ok")
        .orderBy("transition")
    }),
    // daily cohort retention matrix (first-active-day cohorts, 7-day window)
    "cohort_retention" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet")
      val e = ev.select(
        col("user_id"), graft.operators.Events.tsMicros(ev, "ts").as("ts_us"))
      graft.operators.Events.cohortRetention(e, "user_id", "ts_us", maxOffset = 7)
        .orderBy("cohort_day", "day_offset")
    }),
    // continuous profiling: a real streaming query delivers lineitem in
    // micro-batches; foreachBatch reduces each to mergeable state; the
    // merged EXACT metrics must equal the whole-table profile
    // SPARK_GRAFT_STREAM_BATCHES (default 4): scale-lane experiment knob —
    // at K× data, constant nBatches means K×-bigger batches (per-batch
    // planning/commit overhead amortizes), while nBatches=4K holds bytes
    // per batch constant (overhead scales with batch count); the merged
    // metrics are EXACT either way, so the oracle is unaffected
    "streaming_incremental_profile" -> ((s, dir) =>
      StreamingProfile.continuousIncrementalProfile(
        s, s"$dir/lineitem.parquet", "l_orderkey",
        nBatches = sys.env.get("SPARK_GRAFT_STREAM_BATCHES")
          .flatMap(b => scala.util.Try(b.toInt).toOption).getOrElse(4))
        .where(col("name") =!= lit("ApproxCountDistinct") &&
          !col("name").startsWith("ApproxQuantiles"))
        .select(col("instance"), col("name"), round(col("value"), 6).as("value"))
        .orderBy("instance", "name")),
    // histogram drift (PSI) between the even/odd-orderkey snapshots of
    // every numeric column — the binned complement of metric_anomaly
    "histogram_drift" -> ((s, dir) => {
      val li = lineitem(s, dir)
      graft.profiler.Checks.histogramDrift(
        li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1),
        OracleSql.Lineitem.numeric)
        .orderBy("instance")
    }),
    // embedding-corpus QA: dims consistency, zero-norm count, norm stats
    "embedding_stats" -> ((s, dir) =>
      Similarity.corpusStats(embeddings(s, dir), "embedding")),
    // context-length planning: equi-width histogram over per-doc token counts
    "seq_length_histogram" -> ((s, dir) =>
      graft.profiler.NumericHistogram.equiWidth(
        documents(s, dir).select(TextFunctions.wsTokenCount(col("text")).as("n_tokens")),
        "n_tokens", 10)
        .orderBy("bucket")),
    // Deequ-style constraint SUGGESTION: the profile proposes the checks
    // (metadata-sized rule pass over the metrics relation, no second scan)
    "constraint_suggest" -> ((s, dir) => {
      val rows = Profiler.metrics(
        lineitem(s, dir), cfg, Set("completeness", "distinctness", "minimum"))
      graft.profiler.Checks.suggestConstraints(Profiler.metricsDF(s, rows))
        .orderBy("instance", "rule")
    }),
    // tokenizer application: dense vocab-rank ids (0 = OOV) per token,
    // sequence re-assembled in position order and fingerprinted
    "tokenize_ids" -> ((s, dir) =>
      TextFunctions.tokenizeIds(documents(s, dir), "doc_id", "text", vocabSize = 1000)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),
    // Deequ-family metric anomaly detection: z-score of the current
    // snapshot's metrics against the 3 prior snapshots (one grouped scan)
    "metric_anomaly" -> ((s, dir) => {
      val Dec = org.apache.spark.sql.types.DecimalType(38, 6)
      graft.profiler.Checks.metricAnomaly(
        lineitem(s, dir),
        col("l_orderkey") % 4,
        Seq(
          "Size" -> count(lit(1)),
          "Mean_l_extendedprice" ->
            (sum(col("l_extendedprice").cast(Dec)).cast("double") /
              count(col("l_extendedprice"))),
          "Sum_l_quantity" -> sum(col("l_quantity").cast(Dec)).cast("double")))
        .orderBy("name")
    }),
    // near-dup cluster representative by QUALITY (not min-id): keep the
    // best copy, discard the worse ones
    "dedup_cluster_best" -> ((s, dir) => {
      val docs = documents(s, dir)
      graft.operators.Clustering.bestRepresentative(
        graft.operators.Clustering.dedupClusters(
          Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)),
        docs.select(
          col("doc_id"),
          round(TextFunctions.qualityScore(col("text")), 6).as("quality")))
        .orderBy("doc_id")
    }),
    // driver-visible accuracy audit of the approximate sketches: HLL
    // count-distinct within 3x its published rsd (0.05) of the exact count,
    // and each percentile_approx value's RANK interval within
    // 2*(1/accuracy) of the target rank — the sketch's actual published
    // guarantee, verified with codegen'd conditional counts (rank of v =
    // count(< v)+1 .. count(<= v)) instead of exact-percentile value-map
    // buffers, which cost 16 ObjectHashAggregate sketches for the same
    // answer (measured 9.9 s vs ~4 s at sf0.1). The output is
    // deterministic all-true booleans, so the oracle is a golden VALUES
    // list (the schema_df precedent): a sketch accuracy regression flips a
    // row to false and hash-fails the round.
    "approx_error_audit" -> ((s, dir) => {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val li = lineitem(s, dir)
      val cols = OracleSql.Lineitem.numeric
      val ps = graft.profiler.ScanMetrics.quantilePs(10)
      val eps = 2.0 / 100 // 2 * (1/accuracy) rank slack
      // pass 1 (sketches) and pass 2 (exact distinct) are independent —
      // submit concurrently like ScanMetrics.compute's pass families
      val f1 = Future(scala.concurrent.blocking {
        val src = graft.profiler.ScanMetrics.spread(li)
        val aggs = cols.flatMap { c =>
          Seq(
            approx_count_distinct(col(c)).as(s"acd_$c"),
            percentile_approx(col(c), array(ps.map(lit): _*), lit(100))
              .cast("array<double>").as(s"aq_$c"))
        }
        src.agg(aggs.head, aggs.tail: _*).head()
      })
      val f2 = Future(scala.concurrent.blocking {
        val src = graft.profiler.ScanMetrics.spread(li)
        val aggs = cols.map(c => count_distinct(col(c)).as(s"cd_$c"))
        src.agg(aggs.head, aggs.tail: _*).head()
      })
      val r1 = Await.result(f1, Duration.Inf)
      val r2 = Await.result(f2, Duration.Inf)
      // pass 3: rank intervals of the returned values — plain counts,
      // whole-stage codegen, no spread needed
      // all-null column: percentile_approx returns null — no ranks to
      // check, its quantile rows are vacuously within bound
      val aqs = cols.indices.map(ci =>
        Option(r1.getSeq[Double](ci * 2 + 1)).getOrElse(Seq.empty))
      val rankAggs = cols.zipWithIndex.flatMap { case (c, ci) =>
        count(col(c)).as(s"nn_$c") +: aqs(ci).indices.flatMap(i => Seq(
          count(when(col(c) < lit(aqs(ci)(i)), lit(1))).as(s"lt_${c}_$i"),
          count(when(col(c) <= lit(aqs(ci)(i)), lit(1))).as(s"le_${c}_$i")))
      }
      val r3 = li.agg(rankAggs.head, rankAggs.tail: _*).head()
      // per-column field offsets in r3 (widths vary if a column had no data)
      val offsets = aqs.map(1 + 2 * _.size).scanLeft(0)(_ + _)
      val rows = cols.zipWithIndex.flatMap { case (c, ci) =>
        val acd = r1.getLong(ci * 2).toDouble
        val cd = r2.getLong(ci).toDouble
        val nn = r3.getLong(offsets(ci)).toDouble
        (c, "ApproxCountDistinct", math.abs(acd - cd) <= 0.15 * cd) +:
          ps.indices.map { i =>
            if (aqs(ci).isEmpty) (c, s"ApproxQuantiles-${ps(i)}", true)
            else {
              val loRank = r3.getLong(offsets(ci) + 1 + 2 * i) + 1 // count(<v) + 1
              val hiRank = r3.getLong(offsets(ci) + 2 + 2 * i) // count(<=v)
              val lb = (ps(i) - eps) * nn
              val ub = (ps(i) + eps) * nn
              (c, s"ApproxQuantiles-${ps(i)}", hiRank >= lb && loRank <= ub)
            }
          }
      }
      import s.implicits._
      rows.toDF("instance", "name", "within_bound")
        .orderBy("instance", "name")
    }),
    // flagship multi-table run: the reference's main loop as one relation —
    // enumerate the catalog (R2), profile every table (R1+R15), union with
    // table identity. Size+Completeness over every Text/Numeric column;
    // events' TIMESTAMP_NTZ ts is class-Skipped (reference parity), so it
    // appears in neither side of the compare.
    "profile_all_tables" -> ((s, dir) => {
      graft.profiler.Runner.profileAllTables(
        s, new graft.profiler.ParquetDirCatalog(s, dir), cfg,
        Set("size", "completeness"))
        .select(
          col("table_name"), col("entity"), col("instance"), col("name"),
          round(col("value"), 6).as("value"))
        .orderBy("table_name", "entity", "instance", "name")
    }),
    // ===== driver-visible invariant audits =====
    // Each audit emits deterministic booleans pinning a GUARANTEED
    // invariant of an operator whose raw output the SQL oracle cannot
    // reproduce (LSH banding, randomized sketch compaction, physical plan
    // shapes, sink side effects); the oracle pins them as an all-true
    // VALUES list (the approx_error_audit precedent), so a regression
    // flips a row to false and hash-fails the round. Audits re-run other
    // operators plus brute-force twins, so Bench excludes `*_audit` keys
    // from the throughput line (they'd double-count engine work).
    //
    // E3: LSH candidates are exact-rescored, so every emitted pair must
    // appear in the exact n-gram Jaccard relation with the identical
    // 6-dp jaccard, above threshold, id_a < id_b.
    // E91: MG estimates are partitioning-dependent near the threshold, but
    // the three Misra-Gries guarantees are exact — pinned here vs the
    // exact frequency table, with integer algebra (c·(k+1) vs n) so the
    // bound check itself has no FP edge.
    "heavy_hitters_audit" -> ((s, dir) => {
      import s.implicits._
      graft.functions.HeavyHitters.register(s)
      val k = 100
      val tok = documents(s, dir).select(
        explode(graft.functions.TextFunctions.wsTokens(lower(col("text")))).as("t"))
      val est = graft.functions.HeavyHitters.topK(tok, col("t"), k)
        .withColumnRenamed("token", "t").localCheckpoint()
      val exact = tok.groupBy("t").agg(count(lit(1)).as("c"))
      val n = tok.count()
      val j = est.join(exact, Seq("t"))
      val subset = est.join(exact, Seq("t"), "left_anti").count() == 0L
      val never_over = j.where(col("est") > col("c")).count() == 0L
      val bounded = j.where((col("c") - col("est")) * (k + 1) > n).count() == 0L
      val noMissed = exact.where(col("c") * (k + 1) > n)
        .join(est, Seq("t"), "left_anti").count() == 0L
      val mass = est.agg(coalesce(sum("est"), lit(0L)).as("s"))
        .head().getLong(0) <= n
      Seq(
        ("est_subset_of_vocab", subset),
        ("est_never_over", never_over),
        ("no_missed_heavy_hitter", noMissed),
        ("undercount_bounded", bounded),
        ("total_mass_bounded", mass))
        .toDF("property", "ok").orderBy("property")
    }),
    "minhash_audit" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val mh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, threshold = 0.5)
        .persist()
      try {
        val ex = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
        val extra = mh.join(ex, Seq("id_a", "id_b", "jaccard"), "left_anti").count()
        val bad = mh.where(col("jaccard") < 0.5 || col("id_a") >= col("id_b")).count()
        Seq(
          ("pairs_subset_of_exact", extra == 0L),
          ("threshold_and_ordering", bad == 0L))
          .toDF("property", "ok").orderBy("property")
      } finally { mh.unpersist(); () }
    }),
    // E4: the pigeonhole banding is exact over signatures — blocks =
    // maxHamming+1 guarantees recall 1 AND the exact hamming filter
    // guarantees precision 1, so banded pairs must EQUAL the brute-force
    // all-pairs relation over the same signatures.
    "simhash_audit" -> ((s, dir) => {
      import s.implicits._
      val sig = Dedup.simhash(documents(s, dir), "doc_id", "text").persist()
      try {
        sig.count() // materialize once; both derivations below reuse the cache
        val pairs = Dedup.simhashPairsFromSignatures(sig, maxHamming = 3)
          .select("id_a", "id_b", "hamming")
        val brute = sig.alias("x").crossJoin(sig.alias("y"))
          .where(col("x.id") < col("y.id"))
          .select(
            col("x.id").as("id_a"), col("y.id").as("id_b"),
            bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
          .where(col("hamming") <= 3)
        val diff = pairs.exceptAll(brute).count() + brute.exceptAll(pairs).count()
        Seq(("pairs_equal_bruteforce", diff == 0L)).toDF("property", "ok")
      } finally { sig.unpersist(); () }
    }),
    // E72: zlib output lengths are implementation-defined (hence no value
    // oracle), but three invariants are guaranteed: lengths stay within
    // the deflate worst-case bound, re-evaluating is bit-identical, and
    // doubling a text adds at most a back-reference's worth of bytes
    // (the LZ77 window property the quality signal rests on).
    "deflate_audit" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Compress.register(s)
      val docs = documents(s, dir).where(col("text").isNotNull)
      val d1 = docs.select(
        col("doc_id"), expr("deflate_len(text)").as("a"),
        octet_length(col("text")).cast("long").as("n"))
      val d2 = docs.select(col("doc_id"), expr("deflate_len(text)").as("b"))
      val boundsBad = d1.where(
        col("a") < 1 || col("a") > col("n") + col("n") / 100 + 64).count()
      val detBad = d1.join(d2, Seq("doc_id"))
        .where(col("a") =!= col("b")).count()
      val lzBad = docs.where(octet_length(col("text")).between(1, 32768))
        .select(expr("deflate_len(text)").as("single"),
          expr("deflate_len(concat(text, text))").as("doubled"))
        .where(col("doubled") > col("single") + 64).count()
      Seq(
        ("bounds_hold", boundsBad == 0L),
        ("deterministic", detBad == 0L),
        ("doubling_compresses", lzBad == 0L))
        .toDF("property", "ok").orderBy("property")
    }),
    // E7: recall < 1 by design, but three invariants are exact: the i-th
    // best LSH cosine can never exceed the i-th best brute-force cosine
    // (a sorted subset is pointwise dominated), every LSH rank must exist
    // in the brute-force ranking, and every emitted cosine must equal the
    // exact 6-dp cosine recomputed from the raw vectors.
    "ann_lsh_audit" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val emb = embeddings(s, dir)
      val pred = col("vec_id") % 97 === 0
      val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", pred).persist()
      try {
        val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", pred)
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)
        val lr = lsh.withColumn("rn", row_number().over(w))
        val br = brute.withColumn("rn", row_number().over(w))
        val dominated = lr.alias("l")
          .join(br.alias("b"), Seq("query_id", "rn"))
          .where(col("l.cos") > col("b.cos")).count() == 0L
        val allRanked = lr.join(br, Seq("query_id", "rn"), "left_anti").count() == 0L
        val qv = emb.where(pred)
          .select(col("vec_id").as("query_id"), col("embedding").as("q"))
        val nv = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("v"))
        val cosExact = lsh.join(qv, "query_id").join(nv, "neighbor_id")
          .where(col("cos") =!= round(Similarity.cosine(col("q"), col("v")), 6))
          .count() == 0L
        Seq(
          ("cos_exact_recompute", cosExact),
          ("rank_dominance", dominated),
          ("ranks_in_bruteforce", allRanked))
          .toDF("property", "ok").orderBy("property")
      } finally { lsh.unpersist(); () }
    }),
    // E19: the merged KLL sketch's published guarantee — each estimate's
    // exact-rank interval [count(<v)+1, count(<=v)] intersects
    // p ± 3·eps(k=200) of the column's non-null count. Same rank-count
    // verification as approx_error_audit (value-space comparison would
    // need exact percentiles, 16 ObjectHashAggregate sketches).
    "kll_rank_audit" -> ((s, dir) => {
      import s.implicits._
      val li = lineitem(s, dir)
      val halves = Seq(
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 0)),
        IncrementalProfiler.snapshot(li.where(col("l_orderkey") % 2 === 1)))
      val est = IncrementalProfiler.metrics(IncrementalProfiler.merge(halves))
        .where(col("name").startsWith("ApproxQuantiles"))
        .select("instance", "name", "value").collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      val eps = 3 * 0.0165 // 3x the k=200 KLL normalized rank error
      val aggs = est.zipWithIndex.flatMap { case ((c, _, v), i) =>
        Seq(
          count(when(col(c) < lit(v), lit(1))).as(s"lt_$i"),
          count(when(col(c) <= lit(v), lit(1))).as(s"le_$i"))
      } ++ est.map(_._1).distinct.map(c => count(col(c)).as(s"nn_$c"))
      val r = li.agg(aggs.head, aggs.tail: _*).head()
      val rows = est.zipWithIndex.map { case ((c, name, _), i) =>
        val p = name.stripPrefix("ApproxQuantiles-").toDouble
        val nn = r.getLong(r.fieldIndex(s"nn_$c")).toDouble
        val loRank = r.getLong(2 * i) + 1
        val hiRank = r.getLong(2 * i + 1)
        (c, name, hiRank >= (p - eps) * nn && loRank <= (p + eps) * nn)
      }
      rows.toSeq.toDF("instance", "name", "within_bound")
        .orderBy("instance", "name")
    }),
    // R12: the partitioned parquet sink round-trips — partition values
    // come back from the path, row count and payload survive exactly.
    "sink_roundtrip_audit" -> ((s, dir) => {
      import s.implicits._
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val enriched = graft.profiler.Sinks.enrich(
        Profiler.profile(s, nation, cfg), "graftdb", "nation",
        java.time.OffsetDateTime.parse("2026-01-02T03:04:05Z")).persist()
      try {
        val n = enriched.count()
        val root = java.nio.file.Files.createTempDirectory("graft_sink_audit_")
        try {
          new graft.profiler.Sinks.MetricsParquetSink(root.toString)
            .write(enriched, "graftdb", "nation")
          val back = s.read.parquet(root.toString)
          val parts = back.select("db_name", "table_name").distinct().collect()
            .map(r => (r.getString(0), r.getString(1))).toSeq
          val payload = enriched.columns.filterNot(Set("db_name", "table_name"))
          val diff = back.selectExpr(payload: _*)
            .exceptAll(enriched.selectExpr(payload: _*)).count()
          Seq(
            ("partition_values", parts == Seq(("graftdb", "nation"))),
            ("row_count", back.count() == n),
            ("rows_roundtrip", diff == 0L))
            .toDF("property", "ok").orderBy("property")
        } finally { deleteRecursively(root) }
      } finally { enriched.unpersist(); () }
    }),
    // E56: two relations bucketed on the join key through the catalog join
    // with NO exchange in the physical plan and the result equals the
    // plain shuffled join.
    "bucket_join_audit" -> ((s, dir) => {
      import s.implicits._
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
      val nat = s.read.parquet(s"$dir/nation.parquet")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name"))
      val root = java.nio.file.Files.createTempDirectory("graft_bkt_audit_")
      val (ta, tb) = ("graft_audit_bkt_a", "graft_audit_bkt_b")
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        graft.profiler.Sinks.BucketedSink.write(sup, ta, "s_nationkey", 8, Some(s"$root/a"))
        graft.profiler.Sinks.BucketedSink.write(nat, tb, "s_nationkey", 8, Some(s"$root/b"))
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val joined = s.table(ta).join(s.table(tb), "s_nationkey")
        val noExchange = !joined.queryExecution.executedPlan.toString.contains("Exchange")
        val plain = sup.join(nat, "s_nationkey")
        val diff = joined.exceptAll(plain).count() + plain.exceptAll(joined).count()
        Seq(
          ("equals_plain_join", diff == 0L),
          ("no_exchange_in_plan", noExchange))
          .toDF("property", "ok").orderBy("property")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        s.sql(s"DROP TABLE IF EXISTS $ta")
        s.sql(s"DROP TABLE IF EXISTS $tb")
        deleteRecursively(root)
      }
    }),
    // E57: the salt-split join is result-identical to the plain join
    // (each skewed row matches exactly the replicated copy carrying its
    // salt).
    "salted_join_audit" -> ((s, dir) => {
      import s.implicits._
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      val plain = orders.join(cust, "o_custkey")
      val salted = graft.operators.Skew.saltedJoin(
        orders, cust, "o_custkey", "o_orderkey", salts = 8)
      val diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
      Seq(("equals_plain_join", diff == 0L)).toDF("property", "ok")
    })
  )

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    finally walk.close()
  }

  /** Combining-sequence prefix for text_normalize: "Cafe" + U+0301 and
    * "NAI" + U+0308 compose under NFC ("Café NAÏVE") — shared with the
    * oracle, which constructs the identical prefix via chr(). */
  private val NormPrefix = "Café  NAÏVE\t"

  private def documents(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** The declared no-oracle → audit-twin pairing (VERDICT r12 task 7):
    * every key [[oracleSql]] omits (approximate / hash-seeded /
    * engine-specific values, so DuckDB cannot replay the numbers) is
    * pinned instead by a hash-green all-true audit relation named here.
    * This map is THE source of truth a gate iterates — two audits keep
    * historical non-`<key>_audit` names (`lsh_recall_audit`, the
    * `zorder*_audit` family), and an implicit naming convention is how
    * a future sweep silently skips a check. AuditTwinSpec asserts
    * totality (every no-oracle key has a twin; every twin exists and
    * is itself fully oracled) so adding a no-oracle key without its
    * audit fails the suite, not the next judge. */
  val auditTwins: Map[String, String] = Map(
    "ann_lsh_topk" -> "ann_lsh_audit",
    "approx_count_distinct" -> "approx_error_audit",
    "approx_overlap" -> "approx_overlap_audit",
    "approx_overlap_states" -> "approx_overlap_states_audit",
    "approx_quantiles" -> "approx_error_audit",
    "audio_dedup_execute" -> "audio_dedup_execute_audit",
    "audio_near_dup" -> "audio_near_dup_audit",
    "compaction_execute" -> "compaction_execute_audit",
    "compaction_plan" -> "compaction_audit",
    "compression_ratio" -> "deflate_audit",
    "dedup_incremental_lsh" -> "dedup_incremental_lsh_audit",
    "dedup_minhash_lsh" -> "minhash_audit",
    "dedup_simhash" -> "simhash_audit",
    "grouped_quantiles_approx" -> "grouped_quantiles_audit",
    "image_dedup_execute" -> "image_dedup_execute_audit",
    "audio_incremental_dedup" -> "audio_incremental_dedup_audit",
    "image_incremental_dedup" -> "image_incremental_dedup_audit",
    "image_near_dup" -> "image_near_dup_audit",
    "incremental_quantiles" -> "kll_rank_audit",
    "interarrival_stats_approx" -> "interarrival_stats_audit",
    "iqr_outliers_approx" -> "iqr_outliers_audit",
    "ks_drift_approx" -> "ks_drift_audit",
    "lsh_recall_curve" -> "lsh_recall_audit",
    "mad_outliers_approx" -> "mad_outliers_audit",
    "minhash_calibration" -> "minhash_calibration_audit",
    "minhash_clusters" -> "minhash_clusters_audit",
    "minhash_dedup_execute" -> "minhash_dedup_execute_audit",
    "parquet_layout" -> "parquet_layout_audit",
    "profile_lineitem_full" -> "approx_error_audit",
    "session_stats_approx" -> "session_stats_audit",
    "spearman_approx" -> "spearman_audit",
    "streaming_state_dedup" -> "streaming_state_dedup_audit",
    "time_to_convert_approx" -> "time_to_convert_audit",
    "winsorized_stats_approx" -> "winsorized_stats_audit",
    "zorder3_clustering" -> "zorder3_audit",
    "zorder_clustering" -> "zorder_audit")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approx sketches, metadata-derived
    * relations) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "size" -> OracleSql.size,
    "completeness" -> OracleSql.completeness,
    "minimum" -> OracleSql.minimum,
    "maximum" -> OracleSql.maximum,
    "mean" -> OracleSql.mean,
    "sum" -> OracleSql.sum,
    "stddev_pop" -> OracleSql.stddevPop,
    "distinctness" -> OracleSql.distinctness,
    "max_length" -> OracleSql.maxLength,
    "min_length" -> OracleSql.minLength,
    "quantiles_exact" -> OracleSql.quantilesExact,
    "winsorized_stats" -> OracleSql.winsorizedStats,
    "iqr_outliers" -> OracleSql.iqrOutliers,
    "mad_outliers" -> OracleSql.madOutliers,
    "mad_outliers_audit" -> OracleSql.madOutliersAudit,
    "iqr_outliers_audit" -> OracleSql.iqrOutliersAudit,
    "winsorized_stats_audit" -> OracleSql.winsorizedStatsAudit,
    "parquet_layout_audit" -> OracleSql.parquetLayoutAudit,
    "zorder_audit" -> OracleSql.zorderAudit,
    "zorder_prune_audit" -> OracleSql.zorderPruneAudit,
    "zorder3_audit" -> OracleSql.zorder3Audit,
    "compaction_audit" -> OracleSql.compactionAudit,
    "compaction_execute_audit" -> OracleSql.compactionExecuteAudit,
    "range_join_bands" ->
      """WITH bands AS (
  SELECT i AS band_id, i * CAST(1350.0 AS DOUBLE) AS lo, i * CAST(1650.0 AS DOUBLE) AS hi
  FROM generate_series(1, 10) s(i))
SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_price
FROM lineitem JOIN bands ON l_extendedprice >= lo AND l_extendedprice < hi
GROUP BY 1 ORDER BY band_id""",
    "benford_digits" -> OracleSql.benfordDigits,
    "ks_drift" -> OracleSql.ksDrift,
    "ks_drift_audit" -> OracleSql.ksDriftAudit,
    "transition_entropy" -> OracleSql.transitionEntropy,
    "rolling_daily_volume" -> OracleSql.rollingDailyVolume,
    // the aligned-lag relation inlined; corr algebra is the shared twin
    "volume_autocorr" -> OracleSql.corrSql(
      Seq("v", "v_lag1", "v_lag7"),
      from = """(SELECT b.day_num, CAST(b.n_events AS DOUBLE) AS v,
  CAST(l1.n_events AS DOUBLE) AS v_lag1, CAST(l7.n_events AS DOUBLE) AS v_lag7
FROM (SELECT epoch_us(ts) // 86400000000 AS day_num, COUNT(*) AS n_events FROM events GROUP BY 1) b
LEFT JOIN (SELECT epoch_us(ts) // 86400000000 AS day_num, COUNT(*) AS n_events FROM events GROUP BY 1) l1 ON b.day_num = l1.day_num + 1
LEFT JOIN (SELECT epoch_us(ts) // 86400000000 AS day_num, COUNT(*) AS n_events FROM events GROUP BY 1) l7 ON b.day_num = l7.day_num + 7)"""),
    "fd_discovery" -> OracleSql.functionalDeps("lineitem", Seq(
      ("l_orderkey", "l_returnflag"),
      ("l_partkey", "l_suppkey"),
      ("l_returnflag", "l_linestatus"),
      ("l_suppkey", "l_partkey"))),
    "spearman_corr" -> OracleSql.spearman(
      Seq(("l_quantity", "l_extendedprice"), ("l_discount", "l_tax"))),
    "spearman_audit" -> OracleSql.spearmanAudit,
    // the oracle's relation carries the null INDICATORS directly (the
    // engine derives them via isNull — same 0/1 doubles)
    "null_corr" -> OracleSql.corrSql(
      Seq("price", "cust", "odate"),
      from = """(SELECT
  CASE WHEN o_orderkey % 7 < 2 THEN 1.0 ELSE 0.0 END AS price,
  CASE WHEN o_orderkey % 7 < 2 THEN 1.0 ELSE 0.0 END AS cust,
  CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END AS odate
FROM orders) ind"""),
    "count_distinct" -> OracleSql.countDistinct,
    "entropy" -> OracleSql.entropy,
    "unique_value_ratio" -> OracleSql.uniqueValueRatio,
    "uniqueness" -> OracleSql.uniqueness,
    "histogram" -> OracleSql.histogram,
    "dedup_column_names" -> OracleSql.dedupColumnNames,
    "metrics_split" -> OracleSql.metricsSplit,
    "schema_df" -> OracleSql.schemaDf,
    "schema_drift" -> OracleSql.schemaDrift,
    "metadata_upsert" -> OracleSql.metadataUpsert,
    "metrics_type_join" -> OracleSql.metricsTypeJoin,
    "cast_unsupported" -> OracleSql.castUnsupported,
    "sorted_metrics_head" -> OracleSql.sortedMetricsHead,
    "profile_lineitem" -> OracleSql.profileLineitem,
    "constraint_check" -> OracleSql.constraintCheck,
    "column_corr" -> OracleSql.columnCorr,
    "numeric_histogram" -> OracleSql.numericHistogram,
    "profile_drift" -> OracleSql.profileDrift,
    "incremental_profile" -> OracleSql.incrementalProfile,
    "dedup_exact" -> OracleSql.dedupExact,
    "dedup_ngram_jaccard" -> OracleSql.dedupNgramJaccard,
    "dedup_family_rollup" -> OracleSql.dedupFamilyRollup(
      OracleSql.ngramContainment, OracleSql.dupGraphDegrees,
      OracleSql.jaccardHistogram, OracleSql.dedupNgramJaccard,
      OracleSql.ngramNovelty),
    "paragraph_dedup" -> OracleSql.paragraphDedup,
    "blocklist_filter" -> OracleSql.blocklistFilter,
    "dedup_clusters" -> OracleSql.dedupClusters,
    "dedup_incremental" -> OracleSql.dedupIncremental,
    "dedup_incremental_lsh_audit" -> OracleSql.dedupIncrementalLshAudit,
    "contamination" -> OracleSql.contamination,
    "contamination_ratio" -> OracleSql.contaminationRatio,
    "streaming_dedup_watermark" ->
      "SELECT event_id, user_id, value FROM events WHERE event_id % 5 = 0 ORDER BY event_id",
    "sessionize" -> OracleSql.sessionize,
    "daily_profile" ->
      """SELECT STRFTIME(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(COUNT(value) AS BIGINT) AS n_value,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value), 6) AS mean_value
FROM events GROUP BY 1 ORDER BY day""",
    "ts_profile" -> OracleSql.tsProfile,
    "type_burst" -> OracleSql.typeBurst,
    "user_activity_histogram" -> OracleSql.userActivityHistogram,
    "ngram_containment" -> OracleSql.ngramContainment,
    "ngram_novelty" -> OracleSql.ngramNovelty,
    "embedding_dim_stats" -> OracleSql.embeddingDimStats,
    "score_percentile" -> OracleSql.scorePercentile,
    "join_cardinality" -> OracleSql.joinCardinality,
    "lang_agreement" -> OracleSql.langAgreement,
    "jaccard_histogram" -> OracleSql.jaccardHistogram,
    "table_digest" -> OracleSql.tableDigest,
    "props_key_profile" -> OracleSql.propsKeyProfile,
    "dedup_normalized" -> OracleSql.dedupNormalized,
    "quality_deciles" -> OracleSql.qualityDeciles,
    "streaming_enrich" -> OracleSql.streamingEnrich,
    "partition_pruning_audit" -> OracleSql.partitionPruningAudit,
    "quality_weighted_sample" -> OracleSql.qualityWeightedSample,
    "cluster_balance" -> OracleSql.clusterBalance,
    "html_strip" -> OracleSql.htmlStrip,
    "sentence_stats" -> OracleSql.sentenceStats,
    "char_class_stats" -> OracleSql.charClassStats,
    "dup_graph_degrees" -> OracleSql.dupGraphDegrees,
    "effective_dims" -> OracleSql.effectiveDims,
    "bloom_membership_audit" -> OracleSql.bloomMembershipAudit,
    "minhash_merge_audit" -> OracleSql.minhashMergeAudit,
    "schema_evolution_audit" -> OracleSql.schemaEvolutionAudit,
    "interarrival_stats" -> OracleSql.interarrivalStats,
    "interarrival_stats_audit" -> OracleSql.interarrivalStatsAudit,
    "session_stats_audit" -> OracleSql.sessionStatsAudit,
    "time_to_convert_audit" -> OracleSql.timeToConvertAudit,
    "hourly_activity" -> OracleSql.hourlyActivity,
    "volume_cusum" -> OracleSql.volumeCusum,
    "session_stats" -> OracleSql.sessionStats,
    "assoc_rules" -> OracleSql.assocRules,
    "doc_freq" -> OracleSql.docFrequency,
    "tokenizer_fertility" -> OracleSql.tokenizerFertility,
    "dedup_yield" -> OracleSql.dedupYield,
    "ann_cosine_topk" -> OracleSql.annCosineTopK,
    "quality_logreg" -> OracleSql.qualityLogreg,
    "quality_filter_execute" -> OracleSql.qualityFilterExecute,
    "jaccard_dedup_execute" -> OracleSql.jaccardDedupExecute,
    "groupdro_train" -> OracleSql.groupDroTrain,
    "corpus_curate" -> OracleSql.corpusCurate,
    "doremi_select" -> OracleSql.doremiSelect,
    "ccnet_buckets" -> OracleSql.ccnetBuckets,
    "ccnet_select" -> OracleSql.ccnetSelect,
    "pca_power" -> OracleSql.pcaPower(),
    "dup_pagerank" -> OracleSql.dupPagerank,
    "trigram_lm" -> OracleSql.trigramLm,
    "kneser_ney_lm" -> OracleSql.kneserNeyLm,
    "kn_cross_ppl" -> OracleSql.knCrossPpl,
    "gopher_rules" -> OracleSql.gopherRules,
    "naive_bayes_filter" -> OracleSql.naiveBayesFilter,
    "quality_gate" -> OracleSql.qualityGate,
    "calibration_table" -> OracleSql.calibrationTable,
    "embedding_pq" -> OracleSql.embeddingPq,
    "domain_topk" -> OracleSql.domainTopk,
    "char_entropy" -> OracleSql.charEntropy,
    "shard_manifest" -> OracleSql.shardManifest,
    "embedding_project" -> OracleSql.embeddingProject,
    "unimax_mix" -> OracleSql.unimaxMix,
    "path_templates" -> OracleSql.pathTemplates,
    "hard_negatives" -> OracleSql.hardNegatives,
    "hard_negatives_ann" -> OracleSql.hardNegativesAnn,
    "hard_negatives_ann_audit" -> OracleSql.hardNegativesAnnAudit,
    "dedup_embedding_cosine" -> OracleSql.dedupEmbeddingCosine,
    "knn_assign" -> OracleSql.knnAssign,
    "events_json" -> OracleSql.eventsJson,
    "asof_enrich" -> OracleSql.asofEnrich,
    "sample_deterministic" -> OracleSql.sampleDeterministic,
    "mixture_resample" -> OracleSql.mixtureResample,
    "dsir_weights" -> OracleSql.dsirWeights,
    "dsir_select" -> OracleSql.dsirSelect,
    "semdedup" -> OracleSql.semDedup,
    "semdedup_execute" -> OracleSql.semDedupExecute,
    "bpe_merges" -> OracleSql.bpeMerges,
    "bpe_encode" -> OracleSql.bpeEncode,
    "leakage_safe_split" -> OracleSql.leakageSafeSplit,
    "dataset_split" -> OracleSql.datasetSplit,
    "stratified_sample" -> OracleSql.stratifiedSample,
    "sequence_packing" -> OracleSql.sequencePacking,
    "token_count" -> OracleSql.tokenCount,
    "doc_chunks" -> OracleSql.docChunks,
    "text_quality" -> OracleSql.textQuality,
    "lm_quality" -> OracleSql.lmQuality,
    "bigram_lm" -> OracleSql.bigramLm,
    "vocab_coverage" -> OracleSql.vocabCoverage(100),
    "repetition_metrics" -> OracleSql.repetitionMetrics,
    "pii_scan" -> OracleSql.piiScan,
    "bm25_topk" -> OracleSql.bm25TopK,
    "bm25_multi" -> OracleSql.bm25Multi,
    "tfidf_keywords" -> OracleSql.tfidfKeywords,
    "vocab_topk" -> OracleSql.vocabTopK,
    "corpus_card" -> OracleSql.corpusCard,
    "vocab_growth" -> OracleSql.vocabGrowth,
    "zipf_fit" -> OracleSql.zipfFit,
    "lang_id" -> OracleSql.langId,
    "mixture_stats" -> OracleSql.mixtureStats,
    "doc_fingerprint" -> OracleSql.docFingerprint,
    "streaming_profile" -> OracleSql.streamingProfile,
    "streaming_dedup" -> OracleSql.streamingDedup,
    "streaming_sessions" -> OracleSql.streamingSessions,
    "multimodal_features" -> OracleSql.multimodalFeatures,
    "multimodal_decode" -> OracleSql.multimodalDecode,
    "multimodal_frames" -> OracleSql.multimodalFrames,
    "image_near_dup_audit" -> OracleSql.imageNearDupAudit,
    "audio_near_dup_audit" -> OracleSql.audioNearDupAudit,
    "image_dedup_execute_audit" -> OracleSql.imageDedupExecuteAudit,
    "audio_dedup_execute_audit" -> OracleSql.audioDedupExecuteAudit,
    "ivf_from_index" -> OracleSql.ivfTopK,
    "ivf_from_index_audit" -> OracleSql.ivfFromIndexAudit,
    "image_incremental_dedup_audit" -> OracleSql.imageIncrementalDedupAudit,
    "audio_incremental_dedup_audit" -> OracleSql.audioIncrementalDedupAudit,
    "kmeans_train" -> OracleSql.kmeansTrain,
    "temperature_mix" -> OracleSql.temperatureMix,
    "streaming_state_dedup_audit" -> OracleSql.streamingStateDedupAudit,
    "curriculum_epochs" -> OracleSql.curriculumEpochs,
    "embedding_outliers" -> OracleSql.embeddingOutliers,
    "cross_dedup_matrix" -> OracleSql.crossDedupMatrix,
    "minhash_calibration_audit" -> OracleSql.minhashCalibrationAudit,
    "dedup_state_compact" -> OracleSql.dedupStateCompact,
    "dedup_state_compact_audit" -> OracleSql.dedupStateCompactAudit,
    "freshness_weights" -> OracleSql.freshnessWeights,
    "dup_pair_explain" -> OracleSql.dupPairExplain,
    "dedup_rate_by_batch" -> OracleSql.dedupRateByBatch,
    "text_normalize" -> OracleSql.textNormalize,
    "ivf_topk" -> OracleSql.ivfTopK,
    "ndcg_eval" -> OracleSql.ndcgEval,
    "mmr_diversify" -> OracleSql.mmrDiversify,
    "knn_label_eval" -> OracleSql.knnLabelEval,
    "cluster_purity" -> OracleSql.clusterPurity,
    "silhouette" -> OracleSql.silhouette,
    "dedup_survival" -> OracleSql.dedupSurvival,
    "recall_curve" -> OracleSql.recallCurve,
    "embedding_quantize" -> OracleSql.embeddingQuantize,
    "budget_select" -> OracleSql.budgetSelect,
    "bigram_topk" -> OracleSql.bigramTopK,
    "collocations_pmi" -> OracleSql.collocationsPmi,
    "rrf_fuse" -> OracleSql.rrfFuse,
    "filter_funnel" -> OracleSql.filterFunnel,
    "corpus_shuffle" -> OracleSql.corpusShuffle,
    "centroid_update" -> OracleSql.centroidUpdate,
    "winnow_fingerprint" -> OracleSql.winnowFingerprint,
    "winnow_near_dup" -> OracleSql.winnowNearDup,
    "substring_dup" -> OracleSql.substringDup,
    "substring_dup_coverage" -> OracleSql.substringDupCoverage,
    "substring_contamination" -> OracleSql.substringContamination,
    "decontam_execute" -> OracleSql.decontamExecute,
    "substring_dup_execute" -> OracleSql.substringDupExecute,
    "self_repeat" -> OracleSql.selfRepeat,
    "self_repeat_execute" -> OracleSql.selfRepeatExecute,
    // the chunked forms are pinned by the SAME oracles: at sf0.01 every
    // document fits one chunk, where chunked == unchunked by design
    "substring_dup_chunked" -> OracleSql.substringDup,
    "self_repeat_chunked" -> OracleSql.selfRepeat,
    "domain_stats" -> OracleSql.domainStats,
    "referential_integrity" -> OracleSql.referentialIntegrity,
    "segmented_completeness" -> OracleSql.segmentedCompleteness,
    "pattern_match" -> OracleSql.patternMatch(patternSpecs, from = "customer"),
    "snapshot_diff" -> OracleSql.snapshotDiff,
    "quantile_buckets" -> OracleSql.quantileBuckets("n_chars", 10, "documents"),
    "fuzzy_match" -> OracleSql.fuzzyMatch,
    "partitioned_profile" -> OracleSql.partitionedProfile,
    "effective_tokens" -> OracleSql.effectiveTokens,
    "gini_concentration" -> OracleSql.giniConcentration,
    "topk_by_quality" -> OracleSql.topkByQuality,
    "corpus_cube" -> OracleSql.corpusCube,
    "csv_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
    "json_roundtrip" ->
      "SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part ORDER BY p_partkey",
    "orc_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey",
    "inferred_types" -> OracleSql.inferredTypes,
    "grouped_quantiles" -> OracleSql.groupedQuantiles(
      "source", "n_chars", Seq(0.25, 0.5, 0.75, 0.9, 0.99),
      from = "documents"),
    "grouped_quantiles_audit" -> OracleSql.groupedQuantilesAudit,
    "segmented_incremental_profile" -> OracleSql.segmentedIncrementalProfile,
    "theils_u" -> OracleSql.theilsU(
      Seq(("o_orderstatus", "o_orderpriority"),
        ("o_orderstatus", "o_custkey")),
      from = "orders"),
    "chi_square" -> OracleSql.chiSquare(
      Seq(("o_orderstatus", "o_orderpriority"),
        ("o_orderstatus", "o_custkey")),
      from = "orders"),
    "mutual_info" -> OracleSql.mutualInfo(
      Seq(("o_orderstatus", "o_orderpriority"),
        ("o_orderpriority", "o_custkey"), ("o_orderstatus", "o_custkey")),
      from = "orders"),
    "candidate_keys" -> OracleSql.candidateKeys,
    "split_divergence" -> OracleSql.splitDivergence,
    "key_skew" -> OracleSql.keySkew,
    "url_normalize" -> OracleSql.urlNormalize,
    "dedup_cluster_best" -> OracleSql.dedupClusterBest,
    "metric_anomaly" -> OracleSql.metricAnomaly,
    "tokenize_ids" -> OracleSql.tokenizeIds,
    "constraint_suggest" -> OracleSql.constraintSuggest,
    "embedding_stats" -> OracleSql.embeddingStats,
    "seq_length_histogram" -> OracleSql.seqLengthHistogram,
    "histogram_drift" -> OracleSql.histogramDrift,
    // same whole-table twin as incremental_profile: the streaming merge
    // must reproduce the exact whole-table metrics
    "streaming_incremental_profile" -> OracleSql.incrementalProfile,
    "event_funnel" -> OracleSql.eventFunnel,
    "time_to_convert" -> OracleSql.timeToConvert,
    "cohort_retention" -> OracleSql.cohortRetention,
    "profile_all_tables" -> OracleSql.profileAllTables,
    "approx_error_audit" -> OracleSql.approxErrorAudit,
    "minhash_audit" -> OracleSql.minhashAudit,
    "minhash_dedup_execute_audit" -> OracleSql.minhashDedupExecuteAudit,
    "minhash_clusters_audit" -> OracleSql.minhashClustersAudit,
    "lsh_recall_audit" -> OracleSql.lshRecallAudit,
    "approx_overlap_audit" -> OracleSql.approxOverlapAudit,
    "approx_overlap_states_audit" -> OracleSql.approxOverlapStatesAudit,
    "heavy_hitters_audit" -> OracleSql.heavyHittersAudit,
    "simhash_audit" -> OracleSql.simhashAudit,
    "deflate_audit" -> OracleSql.deflateAudit,
    "ann_lsh_audit" -> OracleSql.annLshAudit,
    "kll_rank_audit" -> OracleSql.kllRankAudit,
    "sink_roundtrip_audit" -> OracleSql.sinkRoundtripAudit,
    "bucket_join_audit" -> OracleSql.bucketJoinAudit,
    "salted_join_audit" -> OracleSql.saltedJoinAudit
  )
}
