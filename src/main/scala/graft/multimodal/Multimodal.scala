package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fake features standing in for a real media decode. */
final case class DecodedFeatures(
    doc_id: Long, n_bytes: Long, width: Int, height: Int, checksum: Long)

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted via batched partition-local
  * execution.
  *
  * The Spark-side mechanics are real — binary schema, batch iteration,
  * typed output Encoders, partition parallelism; only the innermost decode
  * is a STUB ([[decodeStub]]) because no image/audio codecs ship in this
  * environment. A production decoder (JPEG/PNG/PCM) plugs into exactly
  * that function without touching the distributed plumbing. Batching
  * mirrors Arrow-batch UDF execution (e.g. mapInPandas): the decoder sees
  * a chunk of payloads at a time, amortizing any per-batch model/codec
  * setup.
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

  /** STUB decoder — a real implementation would parse the media container
    * here (dimensions from the header, frames/samples from the body). The
    * fake is deterministic in the bytes so tests and reruns agree. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long) =
    if (payload.isEmpty) (0, 0, 0L)
    else {
      val width = (payload(0) & 0xFF) + 1
      val height = (payload(payload.length - 1) & 0xFF) + 1
      var checksum = 0L
      var i = 0
      while (i < payload.length) {
        checksum = (checksum * 31 + (payload(i) & 0xFF)) % 2147483647L
        i += 1
      }
      (width, height, checksum)
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

  /** Partition-local batched decode: `(doc_id, payload)` → typed features.
    * `batchSize` chunks the iterator like an Arrow batch; the decoder runs
    * once per element but any per-batch setup (codec init, model load)
    * belongs at the `grouped` boundary. */
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
            val (w, h, c) = decodeStub(payload)
            DecodedFeatures(id, payload.length.toLong, w, h, c)
          }
        }
      }
  }
}
