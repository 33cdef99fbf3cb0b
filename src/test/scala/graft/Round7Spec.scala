package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, CorpusStats, Events}

/** Round-7 operator specs: E118 tsProfile, E119 interarrivalStats,
  * E120 hourlyActivity, E121 volumeCusum, E122 assocRules,
  * E123 docFrequency, E124 dedupYield, E125 tokenizerFertility,
  * E126 sessionStats. */
class Round7Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val usPerDay = 86400000000L
  private val usPerHour = 3600000000L

  test("tsProfile: completeness, span, cardinality on a long ts column") {
    import spark.implicits._
    // two days, one null, one duplicate instant
    val d0 = 19000L * usPerDay
    val df = Seq(
      Some(d0), Some(d0), Some(d0 + usPerDay + usPerHour),
      None: Option[Long]
    ).toDF("ts_us").select((col("ts_us") * 1000).as("ts")) // nanos long
    val r = Events.tsProfile(df, "ts").head()
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Long]("n_present") == 3L)
    assert(r.getAs[Double]("completeness") == 0.75)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Long]("span_days") == 2L)
    assert(r.getAs[String]("min_day") == "2022-01-08")
    assert(r.getAs[String]("max_day") == "2022-01-09")
  }

  test("interarrivalStats: per-user gaps, cross-user boundaries excluded") {
    import spark.implicits._
    // user 1: gaps 1s, 3s; user 2: single event (no gap)
    val df = Seq(
      (1L, 0L, 1L), (1L, 1000000L, 2L), (1L, 4000000L, 3L),
      (2L, 500000L, 4L)
    ).toDF("user_id", "ts_us", "event_id")
    val r = Events.interarrivalStats(df, "user_id", "ts_us", "event_id").head()
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Long]("min_gap_us") == 1000000L)
    assert(r.getAs[Long]("max_gap_us") == 3000000L)
    assert(r.getAs[Double]("mean_gap_s") == 2.0)
    assert(r.getAs[Double]("p50_s") == 2.0) // interpolated midpoint
  }

  test("hourlyActivity: dow/hour integer algebra (epoch day 0 = Thursday)") {
    import spark.implicits._
    val df = Seq(
      (0L * usPerHour, 1L),            // 1970-01-01 00h: dow 4 (Thu)
      (3L * usPerDay + 5 * usPerHour, 1L), // Sunday 05h: dow 0
      (3L * usPerDay + 5 * usPerHour, 2L)
    ).toDF("ts_us", "user_id")
    val out = Events.hourlyActivity(df, "ts_us", "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_users"))).toMap
    assert(out((4L, 0L)) == (1L, 1L))
    assert(out((0L, 5L)) == (2L, 2L))
  }

  test("volumeCusum: zero-sum deviations, extremum day flagged") {
    import spark.implicits._
    // volumes 10, 30, 20 over three days -> mean 20, devs -10, +10, 0,
    // cusum -10, 0, 0: peak |cusum| = 10 on day 1 only
    val rows = (Seq.fill(10)(0L) ++ Seq.fill(30)(1L) ++ Seq.fill(20)(2L))
      .map(d => d * usPerDay)
    val df = rows.toDF("ts_us")
    val out = Events.volumeCusum(df, "ts_us").collect()
      .map(r => r.getAs[String]("day") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("cusum"),
          r.getAs[Int]("is_changepoint"))).toMap
    assert(out("1970-01-01") == (10L, -10.0, 1))
    assert(out("1970-01-02") == (30L, 0.0, 0))
    assert(out("1970-01-03") == (20L, 0.0, 0))
  }

  test("assocRules: support/confidence/lift on a known basket set") {
    import spark.implicits._
    // 4 users: {a,b} {a,b} {a} {b,c} -> n=4, c_a=3, c_b=3, c_ab=2
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), // duplicate event collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c")
    ).toDF("user_id", "event_type")
    val out = Events.assocRules(df, "user_id", "event_type")
      .collect().map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_both") == 2L)
    assert(ab.getAs[Double]("support") == 0.5)
    assert(ab.getAs[Double]("confidence") == math.round(2.0 / 3.0 * 1e6) / 1e6)
    // lift = (2*4)/(3*3)
    assert(ab.getAs[Double]("lift") == math.round(8.0 / 9.0 * 1e6) / 1e6)
    // directed twin exists with its own confidence denominator
    val bc = out(("b", "c"))
    assert(bc.getAs[Double]("confidence") == math.round(1.0 / 3.0 * 1e6) / 1e6)
    assert(out.contains(("c", "b")) && !out.contains(("a", "c")))
  }

  test("docFrequency: df counts documents not instances; stopword flag") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the the cat"),
      (2L, "the dog"),
      (3L, "fish")
    ).toDF("doc_id", "text")
    val out = CorpusStats.docFrequency(df, "text", k = 10)
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("df"), r.getAs[Double]("df_ratio"),
          r.getAs[Int]("is_stopword"))).toMap
    assert(out("the") == (2L, math.round(2.0 / 3.0 * 1e6) / 1e6, 1))
    assert(out("cat") == (1L, math.round(1.0 / 3.0 * 1e6) / 1e6, 0))
  }

  test("dedupYield: size histogram with removal counts over given clusters") {
    import spark.implicits._
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // size-3 cluster
      (4L, 4L), (5L, 4L),           // size-2
      (6L, 6L), (7L, 6L)            // size-2
    ).toDF("doc_id", "cluster_id")
    val corpus = (1L to 20L).toDF("doc_id")
    val out = Clustering.dedupYield(clusters, corpus)
      .collect().map(r => r.getAs[Long]("cluster_size") -> r).toMap
    assert(out(2L).getAs[Long]("n_clusters") == 2L)
    assert(out(2L).getAs[Long]("n_docs") == 4L)
    assert(out(2L).getAs[Long]("n_removed") == 2L)
    assert(out(3L).getAs[Long]("n_removed") == 2L)
    assert(out(3L).getAs[Long]("n_docs_total") == 20L)
  }

  test("tokenizerFertility: exact counts per language") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "ab cd"),   // ws 2, bpeish 2, chars 5, bytes 5
      (2L, "en", "a1!"),     // ws 1, bpeish 3 (letter, digit, symbol)
      (3L, "de", "über")     // ws 1, bpeish: non-ascii ü is a symbol char
    ).toDF("doc_id", "lang", "text")
    val out = CorpusStats.tokenizerFertility(df, "lang", "text")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_docs") == 2L)
    assert(en.getAs[Long]("n_ws_tokens") == 3L)
    assert(en.getAs[Long]("n_bpeish_tokens") == 5L)
    assert(en.getAs[Long]("n_chars") == 8L)
    assert(en.getAs[Long]("n_bytes") == 8L)
    assert(en.getAs[Double]("chars_per_token") == 1.6)
    val de = out("de")
    // "über": ü matches [^A-Za-z0-9\s], then "ber" letter-run
    assert(de.getAs[Long]("n_bpeish_tokens") == 2L)
    assert(de.getAs[Long]("n_chars") == 4L)
    assert(de.getAs[Long]("n_bytes") == 5L) // ü is 2 UTF-8 bytes
  }

  test("sessionStats: rollup over sessionize output") {
    import spark.implicits._
    val gap = 30L * 60 * 1000 * 1000
    // user 1: events at 0s, 10s (one session, 2 events, 10s), then a
    // session at +2h (1 event); user 2: one event
    val df = Seq(
      (1L, 0L, 1L, "a"), (1L, 10000000L, 2L, "b"),
      (1L, 2L * usPerHour, 3L, "a"),
      (2L, 0L, 4L, "c")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val sessions = Events.sessionize(
      df, "user_id", "ts_us", "event_id", "event_type", gap)
    val r = Events.sessionStats(sessions, "user_id").head()
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("n_single_event") == 2L)
    assert(r.getAs[Double]("mean_events") == math.round(4.0 / 3.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("p50_duration_s") == 0.0)
  }
}
