package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** SparkEntry — Sources lane of the driver-contract `queries` map (split
  * from the former 4.3k-line monolith, VERDICT r13 task 5). Self-typed
  * to the aggregator so entries use the shared helpers (lineitem,
  * documents, metricQuery, cfg, ...) unqualified. */
private[graft] trait SparkEntrySources { this: SparkEntry.type =>

  protected def sourcesQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      val staged = Scratch.dir("graft_compact")
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
        s, dir, Scratch.dir("graft_compact_exec"),
        tableFilter = Some(Seq("documents", "orders")))
        .drop("output_bytes")), // encoding-dependent; the audit bounds it,
    "compaction_execute_audit" -> ((s, dir) => {
      import s.implicits._
      // stage a layout with BOTH pathologies' counterparts: a 12-shard
      // fragmented table (all compact) and a single-file table sized
      // exactly at the target (keep — must never be read or rewritten)
      val staged = Scratch.dir("graft_compact_x")
      val outDir = Scratch.dir("graft_compact_x_out")
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
    // parquet schema-evolution audit (E151): old batches stay readable
    // as the producer schema grows
    "schema_evolution_audit" -> ((s, dir) =>
      graft.sources.FormatRoundtrip.schemaEvolutionAudit(
        s, s"$dir/documents.parquet")),
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
    // join-key skew diagnostic on the orders→customer key
    "key_skew" -> ((s, dir) =>
      graft.profiler.Checks.keySkew(
        s.read.parquet(s"$dir/orders.parquet"), "o_custkey")),
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
}
