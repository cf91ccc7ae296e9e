package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** C12: multimodal column plumbing.
  *
  * Media lives as an opaque `binary` column + a typed metadata
  * struct; decode/resize/frame-sample run as partition-local batch
  * stages over `mapPartitions` (the JVM twin of `mapInPandas`: same
  * schema/batch discipline, no driver involvement, linear scan).
  *
  * The actual codec is a STUB — this container has no image/audio
  * libraries — replaced by a deterministic fake: "decoding" computes
  * byte stats, "resize" halves the metadata dims, "frame sampling"
  * strides the payload. The Spark-side contract (schema, batching,
  * partition locality) is the real, tested part; swapping in a real
  * codec touches only `decodeBatch`.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, format: String)
  case class DecodedRecord(doc_id: Long, n_bytes: Long, checksum: Long,
                           out_w: Int, out_h: Int, sampled_len: Long)

  /** Wrap documents as fake media blobs: payload = UTF-8 bytes of the
    * text, metadata derived deterministically from doc fields.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 1).cast("int").as("height"),
      lit("fake/raw").as("format"))

  /** STUB codec: deterministic fake standing in for e.g. libjpeg.
    * Real implementation would decode `payload` here, one batch at a
    * time; everything around it stays unchanged.
    */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedRecord] =
    batch.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
      val sampled = if (r.payload.isEmpty) 0L else (r.payload.length - 1) / 7 + 1
      DecodedRecord(r.doc_id, r.payload.length.toLong, sum,
        r.width / 2 + 1, r.height / 2 + 1, sampled)
    }

  /** The pipeline: binary in, features out, decoding in fixed-size
    * batches per partition (batch shape = what a vectorized codec or
    * GPU stage would want).
    */
  def decodePipeline(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions(it => it.grouped(batchSize).flatMap(decodeBatch))
      .toDF()
  }

  case class PhashRecord(doc_id: Long, ph: Long)

  /** STUB perceptual hash — the signature stage of an image/media
    * dedup pipeline (real pHash: decode → grayscale → DCT → sign
    * bits). Here: 60 parity bits over the payload's byte-value
    * histogram (group = byte mod 60, bit = count parity). Like a real
    * perceptual hash — and unlike a cryptographic digest — it is
    * LOCALITY-SENSITIVE: a small payload edit perturbs a handful of
    * histogram buckets, flipping few bits, so near-identical media
    * land at small hamming distance. Deterministic, so the oracle
    * replays it from the UTF-8 payload bytes.
    */
  private def phashBatch(batch: Seq[MediaRecord]): Seq[PhashRecord] =
    batch.map { r =>
      val cnt = new Array[Long](60)
      var i = 0
      while (i < r.payload.length) { cnt((r.payload(i) & 0xff) % 60) += 1; i += 1 }
      var ph = 0L
      var g = 0
      while (g < 60) { ph |= (cnt(g) & 1L) << g; g += 1 }
      PhashRecord(r.doc_id, ph)
    }

  /** Signature extraction with the same partition-local batch shape
    * as [[decodePipeline]]: binary in, one 60-bit signature row out.
    */
  def phashPipeline(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(phashBatch))
      .toDF()
  }

  case class FrameRecord(doc_id: Long, frame_idx: Long, off: Long,
                         frame_len: Long, frame_sum: Long)

  /** C12b: frame sampling — the one-row-in, N-frame-rows-out stage of
    * a video pipeline: stride windows over the payload, one feature
    * row per sampled frame. Same stub discipline as [[decodeBatch]]:
    * the "frame grab" is a deterministic byte-window fold (so the
    * oracle replays it on the UTF-8 payload), while the partition-
    * local batch shape — the part a real codec slots into — is real.
    * Map-only (no shuffle): frame explosion multiplies rows, so at
    * 100 TB it must happen AFTER any filtering, never before.
    */
  def frameSample(media: DataFrame, stride: Int = 32,
                  frameLen: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        val n = r.payload.length
        (0 until (if (n == 0) 0 else (n - 1) / stride + 1)).map { f =>
          val off = f * stride
          val len = math.min(frameLen, n - off)
          var sum = 0L
          var i = off
          while (i < off + len) { sum += (r.payload(i) & 0xff); i += 1 }
          FrameRecord(r.doc_id, f.toLong, off.toLong, len.toLong, sum)
        }
      })
      .toDF()
  }
}
