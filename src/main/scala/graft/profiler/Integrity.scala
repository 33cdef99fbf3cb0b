package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-table integrity profiling — the Deequ-family capabilities the
  * reference's fixed 17-analyzer battery omits but the same Glue-catalog
  * profiling workflow needs (reference scope: awsdataprofiler
  * Profiler.scala:172-205 profiles each table in isolation; these two
  * operators relate tables / column sets).
  *
  * Scale shape: both reduce to KEY relations before anything joins or
  * distincts — the fact-table payload never shuffles. Referential
  * integrity shuffles `(key, count)` pairs (map-side combined) and
  * anti-joins two compact key relations; candidate-key discovery runs
  * all combos' exact distinct counts in ONE pass (Catalyst Expand:
  * one shuffle, rows × combos of only the combo columns).
  */
object Integrity {

  /** Referential-integrity profile of `child.childKey → parent.parentKey`:
    * one row `(relation, n_rows, n_null, n_keys, n_orphan_keys,
    * n_orphan_rows, containment)` where containment = fraction of
    * non-null child rows whose key exists in the parent (6-dp, null when
    * the child has no non-null keys).
    *
    * Plan: child collapses to per-key counts (map-side combine — the
    * shuffle carries one row per distinct key), parent to a distinct key
    * relation; orphans = left-anti join of the two. Neither table's
    * payload columns ever leave the scan.
    */
  def referential(
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      relation: String): DataFrame = {
    val keyCounts = ScanMetrics.spread(child)
      .select(col(childKey).as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
    val parentKeys = ScanMetrics.spread(parent)
      .select(col(parentKey).as("k"))
      .where(col("k").isNotNull)
      .distinct()
    val orphans = keyCounts.where(col("k").isNotNull)
      .join(parentKeys, Seq("k"), "left_anti")
      .agg(
        count(lit(1)).as("n_orphan_keys"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_orphan_rows"))
    val totals = keyCounts.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
      coalesce(sum(when(col("k").isNull, col("cnt"))), lit(0L)).as("n_null"),
      count(when(col("k").isNotNull, lit(1))).as("n_keys"))
    // both sides are single-row aggregates — the cross join is trivial
    totals.crossJoin(orphans).select(
      lit(relation).as("relation"),
      col("n_rows").cast(LongType).as("n_rows"),
      col("n_null").cast(LongType).as("n_null"),
      col("n_keys").cast(LongType).as("n_keys"),
      col("n_orphan_keys").cast(LongType).as("n_orphan_keys"),
      col("n_orphan_rows").cast(LongType).as("n_orphan_rows"),
      // double-division + ROUND(…, 6): the same quantization contract the
      // hash-green Distinctness metric already pins against DuckDB
      when(col("n_rows") > col("n_null"),
        round((col("n_rows") - col("n_null") - col("n_orphan_rows"))
          .cast(DoubleType) / (col("n_rows") - col("n_null")).cast(DoubleType), 6))
        .as("containment"))
  }

  /** Candidate-key discovery: for each column combo, exact distinctness
    * of the fully-non-null tuples. Returns `(key_cols, n_rows,
    * n_distinct, n_with_null, distinctness, is_key)` — `is_key` iff the
    * combo is total (no nulls) and unique.
    *
    * All combos evaluate in ONE aggregation: Spark's multi-distinct
    * rewrite expands rows × combos carrying only the combo columns, a
    * single shuffle. At 100 TB you would screen combos with
    * `approx_count_distinct` first (one scan, no expansion) and verify
    * only near-unique survivors exactly — the exact pass here IS that
    * verification step.
    *
    * Multi-arg `count_distinct` skips rows where ANY combo column is
    * null (SQL semantics) — `n_distinct` counts fully-non-null tuples,
    * `n_with_null` reports how many rows were excluded.
    */
  def candidateKeys(df: DataFrame, combos: Seq[Seq[String]]): DataFrame = {
    require(combos.nonEmpty && combos.forall(_.nonEmpty), "need non-empty combos")
    val src = ScanMetrics.spread(df)
    val aggs = combos.zipWithIndex.flatMap { case (cols, i) =>
      val anyNull = cols.map(col(_).isNull).reduce(_ || _)
      Seq(
        count_distinct(col(cols.head), cols.tail.map(col): _*).as(s"d_$i"),
        count(when(anyNull, lit(1))).as(s"w_$i"))
    }
    val one = src.agg(count(lit(1)).as("n_rows"), aggs: _*).collect()(0)
    val n = one.getAs[Long]("n_rows")
    val rows = combos.zipWithIndex.map { case (cols, i) =>
      val d = one.getAs[Long](s"d_$i")
      val w = one.getAs[Long](s"w_$i")
      // same double-division + HALF_UP-6dp contract as the Distinctness
      // metric (Spark round() semantics, hash-green vs DuckDB ROUND)
      val distinctness =
        if (n == 0L) null
        else java.lang.Double.valueOf(BigDecimal(d.toDouble / n.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (cols.mkString(","), n, d, w, distinctness, w == 0L && d == n && n > 0L)
    }
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6)), 1),
      StructType(Seq(
        StructField("key_cols", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("n_with_null", LongType, nullable = false),
        StructField("distinctness", DoubleType, nullable = true),
        StructField("is_key", BooleanType, nullable = false))))
  }

  /** Approximate-functional-dependency discovery (E110) — the
    * profiling classic next to [[candidateKeys]]: for each declared
    * LHS→RHS pair, how close does LHS *determine* RHS? `violations` is
    * the minimum number of rows to delete for the FD to hold exactly
    * (the g3 error of Kivinen & Mannila): n − Σ_lhs max_rhs count, and
    * `fd_ratio` its complement share. `n_nationkey→n_name` scores 1.0;
    * a near-FD with a few dirty rows scores 0.99x — the signal schema
    * inference and key-repair tooling thresholds on.
    *
    * ONE scan for ALL pairs: each row explodes map-side into
    * (pair, lhs, rhs) triples (the E90 Expand shape), then three
    * cascaded aggregations over strictly shrinking relations — distinct
    * cells (map-side combined: the shuffle carries Σ distinct(l,r) per
    * pair, never rows), per-LHS best, per-pair totals. No per-pair jobs,
    * no self-joins. Values compare as strings (pairs should be
    * integer/string columns; a double column's rendering is
    * engine-specific). Null LHS forms its own group (nulls-equal FD
    * semantics); null RHS is a value. */
  /** Join-cardinality profile (E133) — what a planned join would DO
    * before paying for it: per-side row/key counts, matched-key overlap,
    * per-side max fan-out, the EXACT join output size (Σ over matched
    * keys of cl·cr — the quantity a planner's independence assumption
    * estimates and skew breaks), and the relationship class
    * (1:1 / 1:N / N:1 / M:N on the matched keys). This is the profiling
    * answer to "can I join these two tables safely at 100 TB": an M:N
    * verdict with a huge est row count IS the warning.
    *
    * Scale shape: each side collapses map-side to `(key, count)` — the
    * only shuffles carry one row per distinct key; the overlap join is
    * key-relation × key-relation; null keys are excluded from matching
    * (SQL join semantics) but counted. Counts are exact BIGINT; the
    * join-size estimate accumulates in DECIMAL(38,0) (overflow-proof
    * for any two ≤10¹⁴-row sides — a 64-bit Σ cl·cr wraps on skewed
    * M:N joins exactly when the warning matters most). */
  def joinCardinality(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    def sideCounts(df: DataFrame, k: String): DataFrame = df
      .select(col(k).as("k"))
      .where(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
    val l = sideCounts(left, leftKey)
    val r = sideCounts(right, rightKey)
    val matched = l.select(col("k"), col("c").as("cl"))
      .join(r.select(col("k"), col("c").as("cr")), Seq("k"))
      .agg(
        count(lit(1)).as("matched_keys"),
        // DECIMAL(38,0), not BIGINT: Σ cl·cr on a heavily skewed M:N join
        // at the 100 TB scale this profiles (two hot keys of ~2³² rows
        // each) silently wraps a 64-bit accumulator — the overflow would
        // corrupt exactly the "is this join safe" verdict the operator
        // exists to give; 38 digits bounds the true product of any two
        // ≤10¹⁴-row sides
        sum((col("cl") * col("cr")).cast("decimal(38,0)"))
          .as("est_join_rows"),
        max(col("cl")).as("max_fanout_left"),
        max(col("cr")).as("max_fanout_right"))
    val lt = left.agg(
      count(lit(1)).as("n_left"), count(col(leftKey)).as("n_left_nonnull"))
    val rt = right.agg(
      count(lit(1)).as("n_right"), count(col(rightKey)).as("n_right_nonnull"))
    val dl = l.agg(count(lit(1)).as("d_left"))
    val dr = r.agg(count(lit(1)).as("d_right"))
    matched
      .crossJoin(broadcast(lt)).crossJoin(broadcast(rt))
      .crossJoin(broadcast(dl)).crossJoin(broadcast(dr))
      .select(
        col("n_left"), col("n_right"), col("d_left"), col("d_right"),
        col("matched_keys"),
        // final rendering is DOUBLE on purpose: the DECIMAL(38,0)
        // accumulator above is what guards the sum against 64-bit wrap,
        // but engines disagree on how an over-wide decimal PRINTS
        // (DuckDB widens the 38×19-digit product to DOUBLE → "60000.0",
        // Spark keeps decimal → "60000"), and a cardinality ESTIMATE
        // needs ~15 significant digits, not 38 — so both this select
        // and the oracle emit the same IEEE double
        coalesce(col("est_join_rows"), lit(0L).cast("decimal(38,0)"))
          .cast("double").as("est_join_rows"),
        coalesce(col("max_fanout_left"), lit(0L)).as("max_fanout_left"),
        coalesce(col("max_fanout_right"), lit(0L)).as("max_fanout_right"),
        // relationship ON MATCHED KEYS: a side is "1" iff no matched key
        // repeats on it
        when(col("matched_keys") === 0L, lit("disjoint"))
          .when(col("max_fanout_left") === 1L && col("max_fanout_right") === 1L,
            lit("1:1"))
          .when(col("max_fanout_left") === 1L, lit("1:N"))
          .when(col("max_fanout_right") === 1L, lit("N:1"))
          .otherwise(lit("M:N")).as("relationship"))
  }

  /** Order-independent table content digest (E136) — the table-equality
    * primitive behind CDC reconciliation at scale (are two 100 TB
    * replicas identical WITHOUT moving either): row count + XOR of a
    * 60-bit per-row digest. XOR is commutative/associative, so the
    * digest is independent of partitioning and row order, and any single
    * changed row flips it. Per-column hashing with a null sentinel (the
    * E1 encoding) keeps `("a", null)` ≠ `(null, "a")` ≠ `("a", "")`.
    *
    * The row digest is the first 15 hex chars of sha256 (60 bits,
    * non-negative in a BIGINT on both engines); collisions XOR-cancel
    * only if two DIFFERING row multisets collide per-bit — negligible at
    * 2⁻⁶⁰ per pair. One map-side pass, one single-row reduce; nothing
    * but (count, xor) ever shuffles. */
  def tableDigest(
      df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val enc = cols.map(c =>
      coalesce(sha2(col(c).cast("string"), 256), lit("null")))
    val rowHash = conv(
      substring(sha2(concat_ws("|", enc: _*), 256), 1, 15), 16, 10)
      .cast("long")
    df.agg(
      count(lit(1)).as("n_rows"),
      coalesce(bit_xor(rowHash), lit(0L)).as("digest"))
      .select(lit(table).as("tbl"), col("n_rows"), col("digest"))
  }

  /** Bloom-filter membership audit (E149) — driver-visible evidence for
    * the 100 TB semi-join accelerator: a Bloom filter built over the
    * reference side's join keys pre-filters the probe side BEFORE any
    * shuffle (the pattern behind Spark's own runtime row-group bloom
    * pruning, and the standard "did this ingest batch's content hash
    * appear in the corpus" fast path for E39's incremental dedup).
    * Asserts the two properties that make the pattern safe:
    *
    *   - `no_false_negatives` — every true member is flagged (a Bloom
    *     filter may over-approximate, never under — the property that
    *     makes pre-filter + exact-verify sound);
    *   - `fpr_bounded` — the observed false-positive rate on true
    *     non-members stays within `fprSlack`× the requested rate;
    *   - `prefilter_shrinks` — the flagged subset is smaller than the
    *     probe side (the pre-filter actually saves shuffle volume).
    *
    * The filter's bit array is an OR of per-item hash sets — insertion
    * and partition order never change it, so the booleans are
    * deterministic. Build side aggregates to ONE filter value; the probe
    * side evaluates `might_contain` map-side against the broadcast
    * filter — no shuffle touches the probe table. */
  /** In-plan Bloom filter over a key column, built from Spark built-ins
    * only: k seeded xxhash64 positions per key, OR-folded into 64-bit
    * words (bit_or aggregate), packed into ONE map row — commutative/
    * associative all the way, so partition and insertion order never
    * change a single bit. Classic sizing: m = −n·ln p / ln²2 bits
    * (rounded up to a power of two so position extraction is a mask),
    * k = m/n·ln 2. Returns the one-row bitset relation (crossJoin its
    * broadcast into the probe side) and the probe-predicate factory.
    * Shared by [[bloomMembershipAudit]] and the new-vs-known pre-filter
    * of [[graft.operators.Dedup.incrementalLsh]]. */
  private[graft] def bloomFilter(
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double): (DataFrame, Column => Column) = {
    val mBits = {
      val raw = (-expectedItems * math.log(fpp) /
        (math.log(2) * math.log(2))).ceil.toLong
      java.lang.Long.highestOneBit(math.max(64L, raw - 1) * 2)
    }
    val kHashes = math.min(16,
      math.max(1, (mBits.toDouble / expectedItems * math.log(2)).round.toInt))
    def positions(c: Column): Seq[Column] =
      (0 until kHashes).map(j => pmod(xxhash64(c, lit(j)), lit(mBits)))
    val bf = build
      .select(col(buildKey).cast("string").as("k"))
      .where(col("k").isNotNull)
      .select(explode(array(positions(col("k")): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).as("wi"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))
          .as("b"))
      .groupBy(col("wi")).agg(expr("bit_or(b)").as("w"))
      .agg(map_from_arrays(
        collect_list(col("wi")), collect_list(col("w"))).as("bf"))
    def hit(c: Column): Column = positions(c)
      .map(pos =>
        coalesce(element_at(col("bf"), shiftright(pos, 6)), lit(0L))
          .bitwiseAND(call_function("shiftleft", lit(1L),
            (pos % 64).cast("int"))) =!= 0L)
      .reduce(_ && _)
    (bf, hit)
  }

  def bloomMembershipAudit(
      build: DataFrame, buildKey: String,
      probe: DataFrame, probeKey: String,
      expectedItems: Long, fpp: Double,
      fprSlack: Double = 3.0): DataFrame = {
    val spark = build.sparkSession
    import spark.implicits._
    val (bf, hit) = bloomFilter(build, buildKey, expectedItems, fpp)
    val truth = build.select(col(buildKey).cast("string").as("k"))
      .where(col("k").isNotNull).distinct()
      .withColumn("member", lit(true))
    val flagged = probe
      .select(col(probeKey).cast("string").as("k"))
      .where(col("k").isNotNull)
      .crossJoin(broadcast(bf))
      .withColumn("hit", hit(col("k")))
      .join(truth, Seq("k"), "left")
    val stats = flagged.agg(
      count(lit(1)).as("n_probe"),
      count(when(col("member") && !col("hit"), 1)).as("false_neg"),
      count(when(col("member").isNull, 1)).as("n_nonmember"),
      count(when(col("member").isNull && col("hit"), 1)).as("false_pos"),
      count(when(col("hit"), 1)).as("n_flagged")).head()
    val fpr =
      if (stats.getAs[Long]("n_nonmember") == 0L) 0.0
      else stats.getAs[Long]("false_pos").toDouble /
        stats.getAs[Long]("n_nonmember").toDouble
    Seq(
      ("fpr_bounded", fpr <= fpp * fprSlack),
      ("no_false_negatives", stats.getAs[Long]("false_neg") == 0L),
      ("prefilter_shrinks",
        stats.getAs[Long]("n_flagged") < stats.getAs[Long]("n_probe")))
      .toDF("property", "ok").orderBy("property")
  }

  def functionalDependencies(
      df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one lhs->rhs pair")
    val triples = array(pairs.zipWithIndex.map { case ((l, r), i) =>
      struct(lit(i).as("pid"), col(l).cast("string").as("lhs"),
        col(r).cast("string").as("rhs"))
    }: _*)
    val labels = array(pairs.map { case (l, r) => lit(s"$l->$r") }: _*)
    df.select(explode(triples).as("p")).select(col("p.*"))
      .groupBy("pid", "lhs", "rhs").agg(count(lit(1)).as("c"))
      .groupBy("pid", "lhs").agg(sum("c").as("lc"), max("c").as("best"))
      .groupBy("pid").agg(
        sum("lc").as("n_rows"),
        count(lit(1)).as("n_lhs"),
        sum("best").as("n_conforming"))
      .select(
        element_at(labels, col("pid") + 1).as("fd"),
        col("n_rows").cast(LongType).as("n_rows"),
        col("n_lhs"),
        (col("n_rows") - col("n_conforming")).cast(LongType).as("violations"),
        round(col("n_conforming").cast(DoubleType) /
          col("n_rows").cast(DoubleType), 6).as("fd_ratio"))
  }

  /** Approximate cross-table key overlap (E163) — distinct-key overlap
    * and containment between two tables WITHOUT any join: three HLL
    * sketches (A keys, B keys, union) answered by ONE aggregation over a
    * tagged union, then inclusion–exclusion
    * `|A∩B| ≈ n_A + n_B − n_{A∪B}` (clamped at 0 — sketch noise can push
    * the difference negative). The scale path for the question
    * [[referential]] answers exactly: referential joins per-key relations
    * (a shuffle of every distinct key), this ships three fixed-size
    * sketches — and in production the per-table sketches are precomputed
    * artifacts that MERGE (HLL union is lossless), so cross-table overlap
    * across a 100 TB lake needs no table rescans at all.
    *
    * Returns one row: `(relation, n_a, n_b, n_union, n_overlap_est,
    * containment_a, containment_b)` — containments 6-dp, null when the
    * side estimate is 0. HLL values are engine-specific (no value
    * oracle); `approx_overlap_audit` pins every estimate within the
    * standard-error bound of its exact twin. */
  def approxOverlap(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String,
      relation: String): DataFrame = {
    val ka = ScanMetrics.spread(a)
      .select(col(aKey).cast("string").as("k")).where(col("k").isNotNull)
      .withColumn("s", lit("a"))
    val kb = ScanMetrics.spread(b)
      .select(col(bKey).cast("string").as("k")).where(col("k").isNotNull)
      .withColumn("s", lit("b"))
    ka.unionByName(kb)
      .agg(
        approx_count_distinct(col("k")).as("n_union"),
        approx_count_distinct(when(col("s") === "a", col("k"))).as("n_a"),
        approx_count_distinct(when(col("s") === "b", col("k"))).as("n_b"))
      .select(
        lit(relation).as("relation"),
        col("n_a"), col("n_b"), col("n_union"),
        greatest(lit(0L), col("n_a") + col("n_b") - col("n_union"))
          .as("n_overlap_est"))
      .withColumn("containment_a",
        when(col("n_a") > 0,
          round(col("n_overlap_est").cast(DoubleType) / col("n_a"), 6)))
      .withColumn("containment_b",
        when(col("n_b") > 0,
          round(col("n_overlap_est").cast(DoubleType) / col("n_b"), 6)))
  }

  /** Persisted per-table key-sketch STATE (r11, VERDICT r10 task 5 —
    * [[approxOverlap]]'s "precomputed mergeable artifacts" claim made
    * real, the E17 HLL-state precedent): one row per (table, key)
    * holding a DataSketches HLL of the key's distinct values plus the
    * non-null key-row count. Written per table (or per ingest batch —
    * HLL union is lossless and order-independent, so batch states merge
    * into table states exactly), it answers any future cross-table
    * overlap question from sketch ROWS alone: no rescans of either
    * table, ever. */
  def keySketchState(
      df: DataFrame, keyCol: String, table: String): DataFrame =
    ScanMetrics.spread(df)
      .select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .agg(
        hll_sketch_agg(col("k")).as("hll"),
        count(lit(1)).as("n_key_rows"))
      .select(lit(table).as("table"), lit(keyCol).as("key"),
        col("hll"), col("n_key_rows"))

  /** Cross-table overlap from two PERSISTED states — the no-rescan
    * answer path: per-side estimates read off the stored sketches, the
    * union estimate off their `hll_union` (lossless), then the same
    * inclusion–exclusion and containment algebra as [[approxOverlap]].
    * Output schema matches [[approxOverlap]]; the cross join is 1×1
    * metadata rows. `approx_overlap_states_audit` pins bit-equality
    * against the direct rescan computation plus split-merge
    * losslessness. */
  def approxOverlapFromStates(
      stateA: DataFrame, stateB: DataFrame, relation: String): DataFrame =
    stateA.select(col("hll").as("ha"))
      .crossJoin(broadcast(stateB.select(col("hll").as("hb"))))
      .select(
        lit(relation).as("relation"),
        hll_sketch_estimate(col("ha")).as("n_a"),
        hll_sketch_estimate(col("hb")).as("n_b"),
        hll_sketch_estimate(hll_union(col("ha"), col("hb"))).as("n_union"))
      .select(
        col("relation"), col("n_a"), col("n_b"), col("n_union"),
        greatest(lit(0L), col("n_a") + col("n_b") - col("n_union"))
          .as("n_overlap_est"))
      .withColumn("containment_a",
        when(col("n_a") > 0,
          round(col("n_overlap_est").cast(DoubleType) / col("n_a"), 6)))
      .withColumn("containment_b",
        when(col("n_b") > 0,
          round(col("n_overlap_est").cast(DoubleType) / col("n_b"), 6)))
}
