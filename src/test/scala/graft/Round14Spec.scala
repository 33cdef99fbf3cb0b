package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.profiler.{Profiler, ProfilerConfig, Runner, TableCatalog}

/** Round-14 pins: tableParallelism under a wide catalog (VERDICT r13
  * task 8), StateStore.compact crash-safety (ADVICE r13), and the
  * Scratch nonce contract (ADVICE r13). */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 64 small in-memory tables — wide-catalog shape without file I/O, so
    * the spec measures orchestration (scheduler round-trips), which is
    * exactly what tableParallelism exists to overlap. */
  private def wideCatalog(s: SparkSession, nTables: Int): TableCatalog =
    new TableCatalog {
      override def name: String = s"synthetic_$nTables"
      override def listTables: Seq[String] =
        (0 until nTables).map(i => f"t$i%03d")
      override def load(table: String): DataFrame = {
        val i = table.stripPrefix("t").toInt
        import s.implicits._
        (1 to 50).map(r => (r.toLong * (i + 1), s"v${(r + i) % 7}"))
          .toDF("x", "s")
      }
    }

  test("profileAllTables: 64-table catalog, parallel ≡ sequential and faster") {
    val cat = wideCatalog(spark, 64)
    val fams = Set("size", "completeness", "mean")
    def run(par: Int): (Seq[String], Double) = {
      val t0 = System.nanoTime()
      val df = Runner.profileAllTables(
        spark, cat, ProfilerConfig(), fams, tableParallelism = par)
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(1) // warm the profile codepath once, outside both timings
    val (seqRows, seqSec) = run(1)
    val (parRows, parSec) = run(8)
    // identical metric output — parallel submission must not change one row
    assert(parRows == seqRows)
    assert(seqRows.size >= 64 * fams.size)
    info(f"64 tables: sequential $seqSec%.2f s, parallelism=8 $parSec%.2f s " +
      f"(${seqSec / parSec}%.1fx)")
    // wall-clock must actually scale: 8-way submission over 64 independent
    // ~50-row jobs overlaps scheduler+planning latency; anything under a
    // 1.15x win means the lever is broken (typical local[4] win is 3-5x)
    assert(parSec < seqSec / 1.15,
      f"tableParallelism gave no speedup: seq $seqSec%.2f s vs par $parSec%.2f s")
  }

  test("StateStore.compact survives a stale __old leftover and keeps semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec")
    val path = s"$dir/store"
    val docs = (1L to 40L).map(i =>
      (i, s"content ${i % 10} shared tail of words")).toDF("id", "text")
    val state = Dedup.dedupState(docs, "id", "text")
    Dedup.StateStore.write(state, path)
    // plant a stale __old (prior crash leftover) with DIFFERENT content —
    // compact must clear it, not resurrect it
    val stale = Dedup.dedupState(
      Seq((999L, "stale")).toDF("id", "text"), "id", "text")
    stale.write.parquet(s"${path}__old")
    val before = Dedup.StateStore.rows(spark, path)
    val n = Dedup.StateStore.compact(spark, path)
    assert(n > 0 && Dedup.StateStore.rows(spark, path).contains(n))
    // swap completed: no temp dirs remain, store readable, count sane
    assert(!new java.io.File(s"${path}__old").exists())
    assert(!new java.io.File(s"${path}__compacting").exists())
    val ids = Dedup.StateStore.read(spark, path)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(999L), "stale __old content resurrected")
    assert(before.exists(_ >= n), "compaction must not grow the store")
  }

  test("Scratch: per-run nonce paths, dataset-scoped, JVM-stable") {
    val a = Scratch.dir("graft_spec_fam", "/root/testdata/sf0.01")
    val b = Scratch.dir("graft_spec_fam", "/root/testdata/sf0.1")
    val c = Scratch.dir("graft_spec_fam", "/root/testdata/sf0.01")
    assert(a == c, "same family+dataset must reuse the same path in one JVM")
    assert(a != b, "different datasets must not share state")
    assert(a.startsWith("/tmp/graft_spec_fam/p"), a)
    // nonce carries the JVM start time → a recycled PID on a later run
    // cannot collide with this run's artifacts
    assert(a.contains("_t"), a)
  }
}
