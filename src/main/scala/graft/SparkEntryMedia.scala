package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.functions.{RollingHash, TextFunctions}
import graft.multimodal.Multimodal
import graft.operators.{Dedup, Sampling, Similarity}
import graft.profiler.{IncrementalProfiler, Profiler, ProfilerConfig}
import graft.streaming.{SessionEvent, StreamingProfile}

/** SparkEntry — Media lane of the driver-contract `queries` map (split
  * from the former 4.3k-line monolith, VERDICT r13 task 5). Self-typed
  * to the aggregator so entries use the shared helpers (lineitem,
  * documents, metricQuery, cfg, ...) unqualified. */
private[graft] trait SparkEntryMedia { this: SparkEntry.type =>

  protected def mediaQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      val staged = Scratch.dir("graft_wm_stage", dir)
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
    // E233: stream-STREAM interval join (view→click attribution within
    // 2 h) — both legs watermarked, the time bound in the join condition
    // retires state; inner matches emit in append mode, so the replay
    // equals the batch interval join (FULL hash oracle)
    "streaming_interval_join" -> ((s, dir) =>
      StreamingProfile.replayParquet(
        s, s"$dir/events.parquet",
        df => StreamingProfile.intervalJoin(
          df.withColumn("ts",
            timestamp_micros(graft.operators.Events.tsMicros(df, "ts"))),
          leftType = "view", rightType = "click", windowMinutes = 120),
        "append")
        .orderBy("l_event_id", "r_event_id")),
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
      val path = Scratch.dir("graft_img_state", dir)
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
      val base = Scratch.dir("graft_img_audit", dir)
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
      val path = Scratch.dir("graft_wav_state", dir)
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
      val base = Scratch.dir("graft_wav_audit", dir)
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
        .orderBy("instance", "name"))
  )
}
