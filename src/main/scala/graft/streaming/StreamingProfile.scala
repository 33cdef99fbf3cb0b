package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One event of the sessionization stream (timestamps in epoch micros —
  * integral, so they survive engine/precision round-trips untouched). */
final case class SessionEvent(user_id: Long, ts_us: Long)

/** One closed session: gap-delimited run of a user's events. */
final case class UserSession(user_id: Long, session_start_us: Long, n_events: Long)

/** Streaming profiling over an event stream (Structured Streaming):
  * tumbling-window aggregate metrics with a watermark, plus stateful
  * sessionization via `flatMapGroupsWithState`.
  *
  * The transformations are source-agnostic DataFrame→DataFrame functions:
  * the same code runs on a Kafka/file stream in production and on a batch
  * replay in tests ([[replayParquet]] drives the parquet file through a real
  * streaming query with a memory sink).
  */
object StreamingProfile {

  /** Tumbling 1-hour windowed profile per event type: exact count, exact
    * DECIMAL(38,6)-quantized sum (order-independent — matches the batch
    * oracle), and an HLL user sketch. Watermark bounds state at one window
    * behind the stream head. */
  def windowedProfile(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(38, 6))).cast(DoubleType).as("sum_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))

  /** The deterministic, oracle-matchable projection of [[windowedProfile]]:
    * window start as a string, exact metrics only. */
  def windowedProfileExact(events: DataFrame): DataFrame =
    windowedProfile(events).select(
      col("window.start").cast("string").as("window_start"),
      col("event_type"),
      col("n_events"),
      round(col("sum_value"), 6).as("sum_value"))

  /** Stream-stream interval join (E233) — the attribution primitive
    * ("which click followed this view within the window?") as a REAL
    * two-stream join, not a batch window: both sides carry an event-time
    * watermark and the join condition carries the time bound, so Spark
    * can retire join state once the watermark passes `windowMinutes` —
    * the state-bounding contract stream-stream joins require (without
    * the bound, both sides buffer forever). Inner joins emit matches as
    * they form (append mode), so a single-source replay produces exactly
    * the batch interval join — the DuckDB twin — while the same
    * transform runs unbounded on live streams.
    *
    * Takes ONE source relation and splits it by event type (the
    * self-join shape — view→click attribution over one firehose); two
    * genuinely distinct sources compose the same way.
    *
    * Scale shape: the join keys on (user_id, time-band) — a shuffle on
    * user_id with watermark-bounded per-key state, linear in stream
    * volume; timestamps surface as epoch micros (integral — the
    * engine-parity contract). */
  def intervalJoin(
      events: DataFrame,
      leftType: String,
      rightType: String,
      windowMinutes: Int = 120,
      watermarkMinutes: Int = 0): DataFrame = {
    require(windowMinutes > 0, s"intervalJoin: windowMinutes=$windowMinutes")
    // Lateness tolerance scales WITH the join window (ADVICE r15: a
    // fixed 1-hour watermark was invisible in single-batch replay but
    // would drop >1h-late events in genuine streaming even when the
    // caller widened the window): default = windowMinutes, floored at
    // 60 so a narrow window still tolerates ordinary lateness; an
    // explicit watermarkMinutes > 0 overrides.
    val wmMin =
      if (watermarkMinutes > 0) watermarkMinutes
      else math.max(windowMinutes, 60)
    val wm = s"$wmMin minutes"
    val l = events.where(col("event_type") === leftType)
      .select(col("event_id").as("l_event_id"), col("user_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", wm)
    val r = events.where(col("event_type") === rightType)
      .select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("r_ts"))
      .withWatermark("r_ts", wm)
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") +
          expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
      .select(
        col("user_id"), col("l_event_id"), col("r_event_id"),
        unix_micros(col("l_ts")).as("l_us"),
        unix_micros(col("r_ts")).as("r_us"))
  }

  /** Gap-based sessionization: a user's events belong to one session while
    * consecutive gaps stay within `gapMinutes`. Stateful operator shape
    * (`groupByKey.flatMapGroupsWithState`), and the state genuinely
    * carries across micro-batches: each batch merges its events into the
    * key's persisted interval set and emits the key's COMPLETE current
    * session list — a per-key changelog where the LATEST emission
    * supersedes earlier ones (a later batch can extend or merge earlier
    * sessions, so per-session deltas could not be keyed stably). In a
    * single-batch replay every key sees all its events at once, so the
    * single emission is exactly the batch gap-and-islands result (the
    * DuckDB oracle); on a live multi-batch stream, take each user's last
    * emission. Production hardening beyond this contract would add an
    * event-time watermark + state timeout to retire keys idle past the
    * gap (state here is per-key-lifetime, O(sessions)).
    *
    * Memory bound: events stream through an interval-merge structure (a
    * TreeMap of open sessions keyed by start time) instead of being
    * buffered and sorted, so per-key state is O(sessions), not O(events) —
    * the output size, which any gap sessionizer must hold. A bot key with
    * 10⁷ dense events occupies ONE map entry; the old
    * `toArray`-sort-and-scan would OOM the task. Gap clustering is
    * order-independent (same connected components whatever the arrival
    * order), so the result is identical to the sorted scan — asserted by
    * StreamingSpec's shuffled-arrival and multi-batch tests. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[Seq[(Long, Long, Long)]]) =>
          // start -> (end, count); intervals stay gap-separated by invariant
          val sessions = new java.util.TreeMap[Long, Array[Long]]()
          if (state.exists)
            state.get.foreach { case (s, e, c) => sessions.put(s, Array(e, c)) }
          it.foreach { e =>
            val t = e.ts_us
            var start = t
            var end = t
            var cnt = 1L
            val before = sessions.floorEntry(t)
            if (before != null && t - before.getValue()(0) <= gapUs) {
              start = before.getKey
              end = math.max(before.getValue()(0), t)
              cnt += before.getValue()(1)
              sessions.remove(before.getKey)
            }
            // chain-merge following sessions now within gap of the new end
            var after = sessions.ceilingEntry(t)
            while (after != null && after.getKey - end <= gapUs) {
              end = math.max(end, after.getValue()(0))
              cnt += after.getValue()(1)
              sessions.remove(after.getKey)
              after = sessions.ceilingEntry(t)
            }
            sessions.put(start, Array(end, cnt))
          }
          val persisted = Seq.newBuilder[(Long, Long, Long)]
          val out = Seq.newBuilder[UserSession]
          sessions.forEach { (start, v) =>
            persisted += ((start, v(0), v(1)))
            out += UserSession(uid, start, v(1))
          }
          state.update(persisted.result())
          out.result().iterator
      }
  }

  /** Streaming exact dedup: a stateful aggregation keyed on the SHA-256
    * content hash — the continuous-ingest counterpart of
    * [[graft.operators.Dedup.exact]] (same 32-byte shuffle-key property:
    * document payloads never travel, and state per distinct content is one
    * hash + two longs). In complete mode the sink holds the current
    * dedup table: smallest id seen per content + duplicate count. */
  def streamingDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("doc_id"), count(lit(1)).as("dup_count"))

  /** Streaming cross-batch dedup against a PERSISTED signature store
    * (E211) — the continuous-ingest counterpart of
    * [[graft.operators.Dedup.incrementalLsh]]: every arriving document
    * is checked against the frozen [[graft.operators.Dedup.dedupState]]
    * relation of all prior batches. Everything stream-side is MAP-ONLY:
    * the content hash is one sha2, the minhash signature is computed
    * per row from the per-doc distinct-shingle array (`array_min` over
    * seeded xxhash64 — the exact values the batch groupBy computes, so
    * stream and batch verdicts agree bit-for-bit, parity-audited), and
    * band keys are one struct-array explode. Candidates come from
    * stream-STATIC equi-joins (hash key for the exact stage, banded
    * signature keys for the near stage — both natively supported in
    * append mode with zero aggregation state); the estimate is a
    * component-equality fold on the joined signatures. The only
    * streaming state is the (id, match_id) pair-dedup inside the
    * watermark horizon ([[dedupWithinWatermark]]'s bounded mode),
    * collapsing multi-band collisions of the same pair.
    *
    * Emits append-mode verdict rows `(id, kind, match_id, est_jaccard)`
    * — `kind` = 'exact' (store already has these bytes; match_id/est
    * null) or 'near' (one row per caught (doc, known-doc) pair at
    * est ≥ `threshold`).
    *
    * Scale shape: the store side is static and compact (hashes +
    * signatures, never payloads); hot store buckets should be capped
    * when the state is PREPARED (capHotBuckets over the store's bucket
    * relation) — the stream side is one document at a time by nature.
    * State per pair is bounded by the watermark, not the corpus. */
  def streamingStateDedup(
      stream: DataFrame,
      state: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 32,
      bands: Int = 8,
      delay: String = "10 minutes"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val hs = (0 until numHashes).map(i => s"h$i")
    // tokens → shingles → all numHashes signature minima in ONE codegen'd
    // kernel (r16, guide §4: the r15 shape — an interpreted
    // transform/array_join shingle lambda feeding 32 interpreted
    // array_min(transform(xxhash64)) lambdas — was 7.3 s of this key's
    // 10.3 s at sf0.1). MinhashSigsTokens is bit-identical by
    // construction (same shingle bytes, same seeded XXH64, min over
    // duplicates ≡ min over distinct) and audited end-to-end against the
    // batch groupBy signatures by streaming_state_dedup_audit.
    graft.functions.MinhashSigs.register(stream.sparkSession)
    val sigCols = (0 until numHashes).map(i =>
      element_at(col("_sigs"), i + 1).as(s"h$i"))
    val sig = stream
      .select(
        col(idCol).as("id"), col(tsCol).as("_ts"),
        sha2(coalesce(col(textCol).cast("string"), lit("null")), 256)
          .as("content_hash"),
        graft.functions.TextFunctions.wsTokens(lower(col(textCol)))
          .as("_toks"))
      .select(col("id"), col("_ts"), col("content_hash"),
        call_function("minhash_sigs_tokens",
          col("_toks"), lit(n), lit(numHashes)).as("_sigs"))
      .select((Seq(col("id"), col("_ts"), col("content_hash")) ++ sigCols): _*)
      .withWatermark("_ts", delay)
    val seen = state.select(col("content_hash")).distinct()
    val exactRows = sig.join(seen, Seq("content_hash"))
      .select(col("id"), lit("exact").as("kind"),
        lit(null).cast("long").as("match_id"),
        lit(null).cast("double").as("est_jaccard"))
    val bandStructs = (0 until bands).map { bi =>
      val cs = (bi * rows until (bi + 1) * rows).map(i => col(s"h$i"))
      struct(lit(bi).as("band"), xxhash64(cs: _*).as("bh"))
    }
    val stBuckets = graft.operators.Dedup.bandBuckets(
      state.select((col("id") +: hs.map(col)): _*), numHashes, bands)
      .withColumnRenamed("id", "match_id")
    val stSigs = state.select(
      (col("id").as("match_id") +: hs.map(h => col(h).as(s"b_$h"))): _*)
    val estExpr = round(
      hs.map(h => when(col(h) === col(s"b_$h"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / lit(numHashes.toDouble), 6)
    val nearRows = sig.where(col("h0").isNotNull)
      .select((Seq(col("id"), col("_ts")) ++ hs.map(col) :+
        explode(array(bandStructs: _*)).as("b")): _*)
      .select((Seq(col("id"), col("_ts"), col("b.band").as("band"),
        col("b.bh").as("bh")) ++ hs.map(col)): _*)
      .join(stBuckets, Seq("band", "bh"))
      .join(stSigs, Seq("match_id"))
      .select(col("id"), col("_ts"), col("match_id"), estExpr.as("est_jaccard"))
      .where(col("est_jaccard") >= lit(threshold))
      .dropDuplicatesWithinWatermark(Seq("id", "match_id"))
      .select(col("id"), lit("near").as("kind"), col("match_id"),
        col("est_jaccard"))
    exactRows.unionByName(nearRows)
  }

  /** Bounded-state streaming dedup (E94):
    * `dropDuplicatesWithinWatermark` keyed on the id columns — the 100 TB
    * STREAMING dedup mode. [[streamingDedup]]'s stateful aggregation keeps
    * one state row per distinct content FOREVER (state grows with the
    * corpus); this variant keeps state only inside the event-time
    * watermark horizon, so state size follows the duplicate-arrival
    * window, not corpus size. The documented trade (sbt-tested, both
    * directions): a duplicate whose key is still in state is dropped; a
    * duplicate with a fresh event time arriving after the key's state was
    * evicted (expiry = first-seen event time + delay, cleanup at batch
    * end) is re-emitted, and one with a stale event time below the
    * watermark is discarded as late data — bounded memory buys exactly
    * that.
    *
    * The input must be a STREAMING DataFrame; `tsCol` is an event-time
    * timestamp column. Output is append-mode rows (first arrival of each
    * key inside the horizon). */
  def dedupWithinWatermark(
      stream: DataFrame, idCols: Seq[String], tsCol: String,
      delay: String): DataFrame = {
    require(idCols.nonEmpty, "need at least one id column")
    stream
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCols)
  }

  /** Scale-adaptive shuffle/state partition count for a streaming query
    * (optimization guide §2: derive partitioning from input size instead
    * of a constant tuned for either local mode or the cluster): stateful
    * streaming operators create one state store PER shuffle partition PER
    * stateful operator, and every micro-batch pays a per-store fixed cost
    * (provider init, delta file write + commit) that is independent of
    * the rows in it. One partition per `bytesPerPartition` of input keeps
    * the store count proportional to the data: a toy replay gets 1-2
    * stores instead of `spark.sql.shuffle.partitions` (= cores in the
    * bench session — r16 measured 32 stores/operator costing 3-9 s of
    * pure commit overhead per streaming key at sf0.1), while a 100 TB
    * stream derives millions of partitions and then naturally saturates
    * any cluster's cores — the production path is unchanged by
    * construction, no local-only constant anywhere. */
  private[graft] def adaptiveStatePartitions(
      bytes: Long, bytesPerPartition: Long = 32L << 20): Int =
    math.max(1L, (bytes + bytesPerPartition - 1) / bytesPerPartition)
      .min(Int.MaxValue).toInt

  /** Drive a transformation over a parquet file through a REAL streaming
    * query (file source → memory sink), synchronously. `outputMode` must
    * match the transformation (complete for windowed aggs, append for
    * flatMapGroupsWithState).
    *
    * The streaming query runs under [[adaptiveStatePartitions]] (derived
    * from the replayed files' byte size); the session's
    * `spark.sql.shuffle.partitions` is restored afterwards. */
  def replayParquet(
      spark: SparkSession,
      path: String,
      transform: DataFrame => DataFrame,
      outputMode: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(path).schema
    // The file stream source wants a directory; point it at the parent with
    // a glob filter so both a single-file path and an intentional glob
    // (dir/*.parquet) work. java.io.File handles relative paths without
    // '/' (parent = "."). A LITERAL file whose name contains glob
    // metacharacters would be misread as a pattern and match nothing —
    // reject that case loudly instead of silently streaming zero files.
    val f = new java.io.File(path)
    // a DIRECTORY dataset (part-files under the table path — the layout
    // every multi-task write produces, e.g. the sf1 scale corpus) must
    // stream its children: pathGlobFilter matches leaf FILE names, so
    // pointing the parent at the directory name would silently stream
    // ZERO files (r12: streaming_state_dedup read nothing at sf1)
    val (dir, file) =
      if (f.isDirectory) (path, "*.parquet")
      else (Option(f.getParent).getOrElse("."), f.getName)
    require(!(f.isFile && file.exists("*?[]{}".contains(_))),
      s"replayParquet: literal file name '$file' contains glob metacharacters")
    val reader = spark.readStream.schema(schema)
      .option("pathGlobFilter", file)
    maxFilesPerTrigger.foreach(m =>
      reader.option("maxFilesPerTrigger", m.toString))
    val stream = reader.parquet(dir)
    val name = "graft_replay_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // input bytes of exactly the files the stream will read (glob-aware —
    // the batch reader resolves the same leaf files)
    val inputBytes = spark.read.schema(schema)
      .option("pathGlobFilter", file).parquet(dir)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = adaptiveStatePartitions(
      inputBytes.min(BigInt(Long.MaxValue)).toLong)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val q = transform(stream).writeStream
        .outputMode(outputMode)
        .format("memory")
        .queryName(name)
        .start()
      try {
        q.processAllAvailable()
        // memory sink table is session-scoped; copy out before dropping
        spark.table(name).localCheckpoint(eager = true)
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
        ()
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Continuous profiling — the streaming face of the incremental
    * profiler and the engine's 100 TB operating mode end-to-end: a file
    * stream delivers the table one micro-batch at a time
    * (`maxFilesPerTrigger = 1`), `foreachBatch` reduces each batch to its
    * metadata-sized mergeable state (materialized before the batch
    * expires), and the associative merge yields EXACT metrics identical
    * to a whole-table profile — the data itself is never rescanned and
    * never held. The replay stages the source into `nBatches` files so
    * the multi-batch path is genuinely exercised. */
  /** One staged replay dir per (source, key, batches) per JVM: the staging
    * write only exists to SIMULATE a stream from a static table (a real
    * deployment reads an actual stream and never stages), so repeated
    * calls — e.g. the bench's two iterations — reuse the first layout. */
  private val stagedReplays =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), String]()

  def continuousIncrementalProfile(
      spark: SparkSession,
      sourcePath: String,
      splitKey: String,
      nBatches: Int): DataFrame = {
    require(nBatches > 1, "need multiple batches to exercise the merge")
    val src = spark.read.parquet(sourcePath)
    // the cache key carries a fingerprint of the SOURCE (xor of each
    // file's length/mtime + file count): a rewritten source at the same
    // path must not replay the stale staging. Stat through the Hadoop
    // FileSystem for the path's own scheme — java.io.File would stat
    // nothing on s3a://-style paths and silently pin the stale entry.
    // Also drop an entry whose dir vanished (OS tmp cleanup) before reuse.
    val (fp, srcBytes) = {
      val hPath = new org.apache.hadoop.fs.Path(sourcePath)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(hPath, true)
      var acc = 0L
      var nFiles = 0L
      var bytes = 0L
      while (it.hasNext) {
        val st = it.next()
        acc ^= st.getLen ^ st.getModificationTime
        bytes += st.getLen
        nFiles += 1
      }
      (acc ^ nFiles, bytes)
    }
    val key = (s"$sourcePath#$fp", splitKey, nBatches)
    Option(stagedReplays.get(key)).foreach { d =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(d, "_SUCCESS")))
        stagedReplays.remove(key, d)
    }
    val tmp = stagedReplays.computeIfAbsent(
      key,
      _ => {
        val dir = java.nio.file.Files.createTempDirectory("graft_cont_").toString
        src.repartition(nBatches, pmod(col(splitKey), lit(nBatches)))
          .write.mode("overwrite").parquet(dir)
        dir
      })
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(tmp)
    val states = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    var batches = 0
    // per-batch input is one staged file: size the per-batch snapshot
    // aggregation (and the checkpointed state partitions) to it
    val parts = adaptiveStatePartitions(srcBytes / math.max(1, nBatches))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batches += 1
          states += graft.profiler.IncrementalProfiler.snapshot(batch.toDF())
            .localCheckpoint(true)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally { q.stop(); () }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    require(batches > 1, s"expected multiple micro-batches, got $batches")
    // staging dir stays for reuse within the JVM (it's /tmp; the OS owns
    // cleanup) — states are checkpointed and metrics() is eager
    graft.profiler.IncrementalProfiler.metrics(
      graft.profiler.IncrementalProfiler.merge(states.toSeq))
  }
}
