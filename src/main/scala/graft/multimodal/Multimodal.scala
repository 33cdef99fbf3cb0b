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
