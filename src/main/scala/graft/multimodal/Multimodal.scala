package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Features extracted from one media payload: container `kind`
  * (`bmp`/`wav`/`raw`), payload size, the container's primary dimensions
  * (image width×height; for audio, sample rate × channels), and a rolling
  * checksum of the post-header body bytes. */
final case class DecodedFeatures(
    doc_id: Long, kind: String, n_bytes: Long, width: Int, height: Int, checksum: Long)

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via batched partition-local
  * execution.
  *
  * The decode is REAL for codec-free containers — [[decode]] parses BMP
  * (BITMAPINFOHEADER) and canonical RIFF/WAVE headers with pure JVM byte
  * arithmetic; payloads that are neither fall back to deterministic
  * byte-level features (`raw`), the stand-in for codecs that don't ship in
  * this environment (JPEG/PNG/H.264 would slot into the same dispatch).
  * Batching mirrors Arrow-batch UDF execution (e.g. mapInPandas): the
  * decoder sees a chunk of payloads at a time, amortizing any per-batch
  * model/codec setup.
  */
object Multimodal {

  /** Model a text corpus as a binary media table `(doc_id, media_type,
    * payload)` — UTF-8 bytes as the opaque payload. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Byte-level features from pure expressions — no decode, stays in
    * whole-stage codegen: payload size and a SHA-256-prefix content
    * fingerprint. */
  def byteFeatures(bin: DataFrame): DataFrame =
    bin.select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      substring(sha2(col("payload"), 256), 1, 16).as("fingerprint"))

  // ---- container header parsing (pure JVM byte arithmetic) ----

  private def le16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)

  private def le32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
      ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)

  /** Rolling checksum of `payload(from..)`: the same
    * `(h·31 + byte) mod 2³¹−1` fold as [[graft.functions.RollingHash]]. */
  def bodyChecksum(payload: Array[Byte], from: Int): Long = {
    var checksum = 0L
    var i = math.max(from, 0)
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xFF)) % 2147483647L
      i += 1
    }
    checksum
  }

  /** Container dispatch + header parse → (kind, width, height, checksum of
    * the post-header body).
    *
    *   - BMP ("BM" magic, ≥ 54-byte BITMAPINFOHEADER): width/height are
    *     the signed int32-LE fields at offsets 18/22; the body starts at
    *     the pixel-array offset `bfOffBits` (int32-LE at offset 10).
    *   - WAV (canonical "RIFF…WAVEfmt " layout, ≥ 44 bytes): width :=
    *     sample rate (uint32-LE at 24), height := channels (uint16-LE at
    *     22); body = samples from offset 44.
    *   - anything else: `raw` byte features — width/height from the first/
    *     last byte (+1), checksum over the whole payload; empty payloads
    *     are all zero. Deterministic in the bytes, so tests/reruns agree.
    */
  def decode(payload: Array[Byte]): (String, Int, Int, Long) = {
    // Magic bytes alone are not enough: text CAN start with "BM"/"RIFF",
    // so also validate a fixed-value header field whose encoding contains
    // NUL bytes (biSize=40 / fmt-chunk-size=16) — impossible in text, so a
    // text payload can never be misclassified as a container.
    def isBmp =
      payload.length >= 54 && payload(0) == 'B'.toByte && payload(1) == 'M'.toByte &&
        le32(payload, 14) == 40 && le32(payload, 10) >= 54
    def isWav =
      payload.length >= 44 &&
        new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
        new String(payload, 8, 8, "US-ASCII") == "WAVEfmt " &&
        le32(payload, 16) == 16
    if (isBmp)
      ("bmp", le32(payload, 18), le32(payload, 22),
        bodyChecksum(payload, le32(payload, 10)))
    else if (isWav)
      ("wav", le32(payload, 24), le16(payload, 22), bodyChecksum(payload, 44))
    else if (payload.isEmpty) ("raw", 0, 0, 0L)
    else
      ("raw", (payload(0) & 0xFF) + 1, (payload(payload.length - 1) & 0xFF) + 1,
        bodyChecksum(payload, 0))
  }

  // ---- synthetic media construction (pure column expressions) ----

  /** Little-endian hex of `v` in `bytes` bytes (building block for binary
    * container construction with `unhex`). */
  private def leHex(v: Column, bytes: Int): Column =
    concat((0 until bytes).map(i =>
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(255)), 2, "0")): _*)

  /** Deterministic media corpus over a documents table: every third doc
    * becomes a real 54-byte BMP header (width = id%200+1, height =
    * id%100+1), every third a real 44-byte canonical WAV header
    * (rate = 8000 + id%8·1000, channels = id%2+1), the rest keep their
    * UTF-8 text bytes. Built entirely from column expressions
    * (`unhex`/`concat`), so the payloads are constructed distributed and
    * the expected decode output is a pure function of `doc_id` — which is
    * what the DuckDB oracle recomputes. */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val w = id % 200 + 1
    val h = id % 100 + 1
    val channels = id % 2 + 1
    val rate = id % 8 * 1000 + 8000
    val bmp = unhex(concat(
      lit("424D"), // "BM"
      leHex(lit(54), 4), // file size (header only, no pixel array)
      lit("00000000"), // reserved
      leHex(lit(54), 4), // bfOffBits: pixel data starts after the header
      leHex(lit(40), 4), // BITMAPINFOHEADER size
      leHex(w, 4), leHex(h, 4),
      leHex(lit(1), 2), // planes
      leHex(lit(24), 2), // bits per pixel
      lit("00" * 24))) // compression..clrImportant, all zero
    val wav = unhex(concat(
      lit("52494646"), // "RIFF"
      leHex(lit(36), 4), // chunk size (44 − 8, no samples)
      lit("57415645666D7420"), // "WAVEfmt "
      leHex(lit(16), 4), // fmt chunk size
      leHex(lit(1), 2), // PCM
      leHex(channels, 2),
      leHex(rate, 4),
      leHex(rate * channels * 2, 4), // byte rate
      leHex(channels * 2, 2), // block align
      leHex(lit(16), 2), // bits per sample
      lit("64617461"), // "data"
      leHex(lit(0), 4))) // no samples
    docs.select(
      id,
      when(id % 3 === 0, lit("image/bmp"))
        .when(id % 3 === 1, lit("audio/wav"))
        .otherwise(lit("text/plain")).as("media_type"),
      when(id % 3 === 0, bmp)
        .when(id % 3 === 1, wav)
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Frame sampling — the explode-shaped media operation (one payload row
    * in → up to `maxFrames` frame rows out): fixed-size byte windows at
    * stride `frameSize`, each fingerprinted. A real video/audio pipeline
    * replaces the byte window with container-aware frame extraction; the
    * distributed shape (generator expression inside codegen, no shuffle,
    * prunes to the payload column) is exactly this. */
  def sampleFrames(
      bin: DataFrame,
      frameSize: Int = 256,
      maxFrames: Int = 4): DataFrame = {
    val nFrames = least(
      lit(maxFrames),
      ((length(col("payload")) + (frameSize - 1)) / frameSize).cast("int"))
    // Empty payloads: sequence(0, -1) would yield the DESCENDING [0, -1]
    // (two spurious rows), so guard like Dedup.shingles does.
    val frames = when(
      nFrames > 0,
      transform(
        sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * frameSize + 1, lit(frameSize))))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.BinaryType)))
    bin.select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .select(
        col("doc_id"),
        col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        substring(sha2(col("frame"), 256), 1, 16).as("frame_hash"))
  }

  // ---- perceptual image hashing (E206) ----

  /** splitmix64 finalizer — the public-domain mixing function; used as
    * the deterministic pixel source for [[syntheticBmp]] so both a test
    * and a re-run regenerate identical images with no RNG state. */
  private[multimodal] def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit dHash (difference hash) of a 24bpp BITMAPINFOHEADER BMP —
    * the standard perceptual image signature: grayscale the pixel
    * array, reduce to a 9×8 block-mean grid, emit one bit per
    * horizontally-adjacent cell pair (`left > right`). Near-identical
    * images (re-encodes, small overlays, brightness-local edits) land
    * within a few bits; unrelated images are ~32 bits apart — exactly
    * the SimHash geometry, so [[graft.operators.Dedup
    * .simhashPairsFromSignatures]]'s pigeonhole banding applies
    * verbatim downstream. All-integer arithmetic (byte sums, floor
    * division), so the hash is bit-reproducible everywhere. Handles
    * bottom-up (height > 0) and top-down (height < 0) pixel order and
    * 4-byte row padding; `None` for anything that is not a complete
    * 24bpp BMP (the caller's non-image rows simply drop out). */
  def bmpDHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 54 ||
      payload(0) != 'B'.toByte || payload(1) != 'M'.toByte ||
      le32(payload, 14) != 40) return None
    val off = le32(payload, 10)
    val w = le32(payload, 18)
    val hRaw = le32(payload, 22)
    val h = math.abs(hRaw)
    val bpp = le16(payload, 28)
    // h <= 0 (not == 0): abs(Int.MinValue) is still negative, and a
    // negative h would defeat the size bound below. rowSize in Long: a
    // declared width near 2^30 overflows `w * 3` in Int, making rowSize
    // negative and the bound check pass on a payload the pixel loop then
    // reads out of bounds (found by MultimodalFuzzSpec) — a decoder must
    // return None on adversarial headers, never throw.
    if (bpp != 24 || w <= 0 || h <= 0 || off < 54) return None
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    if (off.toLong + rowSizeL * h > payload.length) return None
    val rowSize = rowSizeL.toInt
    val topDown = hRaw < 0
    def gray(x: Int, y: Int): Int = { // y = logical row from the top
      val row = if (topDown) y else h - 1 - y
      val p = off + row * rowSize + x * 3
      ((payload(p) & 0xFF) + (payload(p + 1) & 0xFF) +
        (payload(p + 2) & 0xFF)) / 3
    }
    val g = Array.ofDim[Int](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8
      val y1 = math.min(h, math.max((gy + 1) * h / 8, y0 + 1))
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9
        val x1 = math.min(w, math.max((gx + 1) * w / 9, x0 + 1))
        var s = 0L; var cnt = 0; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(x, y); cnt += 1; x += 1 }
          y += 1
        }
        g(gy)(gx) = (s / cnt).toInt
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (g(gy)(gx) > g(gy)(gx + 1)) bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Some(bits)
  }

  /** Deterministic 24bpp BMP with a REAL pixel array (unlike
    * [[syntheticMedia]]'s header-only BMPs): pixel gray levels come from
    * [[mix64]] of `(seed, x, y)`, so two payloads share a seed ⇔ they
    * are the identical image. `perturb != 0` additionally whites out ONE
    * seed-chosen pixel — a near-identical variant a perceptual hash
    * must keep within a few bits while byte-exact dedup misses it. */
  def syntheticBmp(
      seed: Long, w: Int = 16, h: Int = 16, perturb: Long = 0L): Array[Byte] = {
    require(w > 0 && h > 0)
    val rowSize = ((w * 3 + 3) / 4) * 4
    val bytes = new Array[Byte](54 + rowSize * h)
    def p16(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xFF).toByte; bytes(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def p32(off: Int, v: Int): Unit = {
      p16(off, v & 0xFFFF); p16(off + 2, (v >>> 16) & 0xFFFF)
    }
    bytes(0) = 'B'.toByte; bytes(1) = 'M'.toByte
    p32(2, bytes.length); p32(10, 54); p32(14, 40)
    p32(18, w); p32(22, h); p16(26, 1); p16(28, 24)
    val (px, py) =
      if (perturb == 0L) (-1, -1)
      else (((mix64(perturb) >>> 8) % w).toInt.abs,
        ((mix64(perturb) >>> 40) % h).toInt.abs)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val gLvl =
          if (x == px && y == py) 255
          else (mix64(seed * 8191L + x * 131L + y) & 0xFF).toInt
        val p = 54 + (h - 1 - y) * rowSize + x * 3 // bottom-up rows
        bytes(p) = gLvl.toByte; bytes(p + 1) = gLvl.toByte
        bytes(p + 2) = gLvl.toByte
        x += 1
      }
      y += 1
    }
    bytes
  }

  /** Per-image dHash relation `(id, simhash)` over a `(doc_id, payload)`
    * binary table — non-BMP payloads drop out (no perceptual content to
    * hash). Partition-local imperative byte parsing, the
    * [[decodeFeatures]] execution shape: no shuffle, each task hashes
    * its own payload chunk. The column is named `simhash` so the
    * signature relation plugs straight into the SimHash pair machinery. */
  def imageDHashes(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        bmpDHash(p).map(sig => (id, sig)) })
      .toDF("id", "simhash")
  }

  /** Image perceptual near-dup pairs (E206) — the content half the r11
    * multimodal lane lacked (container parsing only): dHash every BMP
    * payload, then find pairs within Hamming distance `maxHamming` via
    * the SimHash pigeonhole banding ([[graft.operators.Dedup
    * .simhashPairsFromSignatures]] — maxHamming+1 signature blocks, any
    * within-distance pair must collide on one, exact `bit_count(XOR)`
    * verification after). Returns `(id_a, id_b, hamming)`.
    *
    * Scale shape: one map-only decode+hash pass over payloads, then
    * 8-byte signatures are all that shuffle — band equi-join with the
    * hot-bucket cap, never an image × image cross join. At 100 TB of
    * images the signature relation is ~N·8 bytes, the same compact-key
    * doctrine as every dedup lane here.
    *
    * Cites reference scope: no media surface in awsdataprofiler
    * (README.md:1-72) — extension per SURVEY §2.E. */
  def imageNearDup(
      bin: DataFrame,
      maxHamming: Int = 5,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame =
    graft.operators.Dedup.simhashPairsFromSignatures(
      imageDHashes(bin), maxHamming, maxBlockFreq)

  /** 64-bit audio energy-delta hash of a canonical 16-bit PCM RIFF/WAVE
    * payload (E207) — the audio sibling of [[bmpDHash]]: the sample
    * stream is cut into 65 equal windows, each window's mean |amplitude|
    * is its energy, and bit i says `energy(i) > energy(i+1)` — a coarse
    * envelope signature that survives re-encodes, level-local edits and
    * small insertions, while unrelated audio lands ~32 bits away (the
    * SimHash geometry again, so the same pigeonhole banding pairs it).
    * All-integer (Long |sample| sums, floor division). `None` for
    * anything that is not a complete canonical WAV or has no samples. */
  def wavDHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 46 ||
      new String(payload, 0, 4, "US-ASCII") != "RIFF" ||
      new String(payload, 8, 8, "US-ASCII") != "WAVEfmt " ||
      le32(payload, 16) != 16 ||
      // canonical layout only: the chunk at 36 must be 'data' — a WAV
      // with a LIST/fact chunk between fmt and data would otherwise be
      // hashed with metadata bytes treated as PCM samples (ADVICE r12)
      new String(payload, 36, 4, "US-ASCII") != "data") return None
    // every 16-bit sample, any channel — bounded by BOTH the payload and
    // the declared data-chunk size, so trailing non-audio bytes never hash
    val declared = le32(payload, 40).toLong & 0xFFFFFFFFL
    val nSamples = math.min((payload.length - 44) / 2, declared / 2).toInt
    if (nSamples < 1) return None
    def amp(i: Int): Long = {
      val v = (payload(44 + 2 * i) & 0xFF) |
        (payload(45 + 2 * i) << 8) // sign-extends the high byte
      math.abs(v.toLong)
    }
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val s0 = w * nSamples / 65
      val s1 = math.min(nSamples, math.max((w + 1) * nSamples / 65, s0 + 1))
      var s = 0L; var i = s0
      while (i < s1) { s += amp(i); i += 1 }
      e(w) = s / (s1 - s0)
      w += 1
    }
    var bits = 0L
    w = 0
    while (w < 64) {
      if (e(w) > e(w + 1)) bits |= 1L << w
      w += 1
    }
    Some(bits)
  }

  /** Deterministic canonical WAV with a REAL 16-bit PCM sample body
    * (unlike [[syntheticMedia]]'s header-only WAVs): amplitude levels
    * are piecewise-constant per 32-sample block from [[mix64]] of
    * `(seed, block)`; `perturb != 0` zeroes ONE seed-chosen 32-sample
    * region — the near-identical variant a perceptual hash must keep
    * close while byte-exact dedup misses it. */
  def syntheticWav(
      seed: Long, nSamples: Int = 2080, perturb: Long = 0L): Array[Byte] = {
    require(nSamples > 0)
    val bytes = new Array[Byte](44 + 2 * nSamples)
    def p16(off: Int, v: Int): Unit = {
      bytes(off) = (v & 0xFF).toByte; bytes(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def p32(off: Int, v: Int): Unit = {
      p16(off, v & 0xFFFF); p16(off + 2, (v >>> 16) & 0xFFFF)
    }
    "RIFF".getBytes("US-ASCII").copyToArray(bytes, 0)
    p32(4, 36 + 2 * nSamples)
    "WAVEfmt ".getBytes("US-ASCII").copyToArray(bytes, 8)
    p32(16, 16); p16(20, 1); p16(22, 1) // PCM, mono
    p32(24, 8000); p32(28, 16000); p16(32, 2); p16(34, 16)
    "data".getBytes("US-ASCII").copyToArray(bytes, 36)
    p32(40, 2 * nSamples)
    val pb = if (perturb == 0L) -1
      else ((mix64(perturb) >>> 16) % (nSamples / 32).max(1)).toInt.abs
    var i = 0
    while (i < nSamples) {
      val block = i / 32
      val lvl =
        if (block == pb) 0
        else (mix64(seed * 524287L + block) & 0x3FFF).toInt // 0..16383
      p16(44 + 2 * i, lvl & 0xFFFF)
      i += 1
    }
    bytes
  }

  /** Per-clip energy-hash relation `(id, simhash)` — [[imageDHashes]]
    * for audio; non-WAV payloads drop out. */
  def audioDHashes(bin: DataFrame): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        wavDHash(p).map(sig => (id, sig)) })
      .toDF("id", "simhash")
  }

  /** Audio perceptual near-dup pairs (E207) — [[imageNearDup]] for WAV
    * payloads: same map-only decode+hash pass, same pigeonhole banding,
    * only 8-byte signatures ever shuffle. Returns `(id_a, id_b,
    * hamming)`. */
  def audioNearDup(
      bin: DataFrame,
      maxHamming: Int = 5,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame =
    graft.operators.Dedup.simhashPairsFromSignatures(
      audioDHashes(bin), maxHamming, maxBlockFreq)

  /** Image near-dup dedup EXECUTOR (E208) — the action half of
    * [[imageNearDup]], the per-pair larger-id drop rule every dedup
    * executor here uses (E170/E181/E188): any image with a SMALLER-id
    * neighbor within `maxHamming` bits is removed, so each duplicate
    * component provably keeps its minimum id (it has no smaller-id
    * neighbor) and the result is idempotent — re-running the executor
    * on the kept corpus finds zero pairs, because any surviving pair
    * would have had its larger member removed. Returns the kept corpus
    * as `(doc_id, n_bytes, fingerprint)` — sha256-pinned payloads, the
    * E169 executor output convention; the removal set is ids only and
    * anti-joins back, payloads never shuffle. */
  def imageDedupExecute(
      bin: DataFrame,
      maxHamming: Int = 5,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame = {
    val removals = imageNearDup(bin, maxHamming, maxBlockFreq)
      .select(col("id_b").as("doc_id")).distinct()
    bin.join(broadcast(removals), Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        substring(sha2(col("payload"), 256), 1, 16).as("fingerprint"))
  }

  /** Audio near-dup dedup EXECUTOR (E219) — [[imageDedupExecute]] for
    * WAV payloads: drop every clip with a smaller-id neighbor within
    * `maxHamming` envelope bits (same larger-id rule, same idempotence
    * and min-id-survives guarantees), return the kept corpus
    * sha256-pinned. */
  def audioDedupExecute(
      bin: DataFrame,
      maxHamming: Int = 5,
      maxBlockFreq: Option[Int] = Some(10000)): DataFrame = {
    val removals = audioNearDup(bin, maxHamming, maxBlockFreq)
      .select(col("id_b").as("doc_id")).distinct()
    bin.join(broadcast(removals), Seq("doc_id"), "left_anti")
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        substring(sha2(col("payload"), 256), 1, 16).as("fingerprint"))
  }

  /** Persisted media dedup state (VERDICT r12 task 6) — one row per
    * payload: `(id, content_hash, simhash)`, the single-word-signature
    * face of [[graft.operators.Dedup.dedupState]]: byte-exact identity
    * via SHA-256 over the raw payload, perceptual identity via the
    * 64-bit dHash (null when the decoder rejects the container — such a
    * payload still participates in the EXACT stage). Payload-free by
    * design: a production image/audio ingest appends this ~40-byte-row
    * relation to its signature store ([[graft.operators.Dedup
    * .StateStore]]) and batch N+1 dedups against it via
    * [[graft.operators.Dedup.incrementalSimhash]] with no earlier
    * payload ever rescanned. */
  def imageDedupState(bin: DataFrame): DataFrame =
    mediaDedupState(bin, bmpDHash)

  /** Audio twin of [[imageDedupState]] — same store schema, envelope
    * hash instead of dHash, so BOTH media lanes ride one store and one
    * incremental detector. */
  def audioDedupState(bin: DataFrame): DataFrame =
    mediaDedupState(bin, wavDHash)

  /** ONE pass over the payload bytes computes both identities — at
    * media scale the payload scan IS the cost, so the exact hash and
    * the perceptual hash must not be separate scans. Hex output matches
    * `sha2(col, 256)` (lowercase), keeping the store join-compatible
    * with column-expression-built states. */
  private def mediaDedupState(
      bin: DataFrame, hasher: Array[Byte] => Option[Long]): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, p) =>
          val bytes = if (p == null) Array.emptyByteArray else p
          md.reset()
          val hex = md.digest(bytes)
            .map(b => f"${b & 0xFF}%02x").mkString
          (id, hex, hasher(bytes))
        }
      }
      .toDF("id", "content_hash", "simhash")
  }

  /** Partition-local batched decode: `(doc_id, payload)` → typed features
    * via the real container parsers in [[decode]]. `batchSize` chunks the
    * iterator like an Arrow batch; the decoder runs once per element but
    * any per-batch setup (codec init, model load) belongs at the `grouped`
    * boundary. */
  def decodeFeatures(
      bin: DataFrame,
      batchSize: Int = 64): Dataset[DecodedFeatures] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would happen here
          batch.iterator.map { case (id, payload) =>
            // null payload (e.g. encoded from a null text) carries nothing
            // to decode — same sentinel shape as an empty raw payload
            // instead of NPE-ing the task on payload.length
            if (payload == null) DecodedFeatures(id, "raw", 0L, 0, 0, 0L)
            else {
              val (kind, w, h, c) = decode(payload)
              DecodedFeatures(id, kind, payload.length.toLong, w, h, c)
            }
          }
        }
      }
  }
}
