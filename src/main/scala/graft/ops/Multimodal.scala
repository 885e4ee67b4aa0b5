package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; per-record decode/feature work runs inside
  * `mapPartitions` so one task amortizes codec initialization across its
  * whole partition (the JVM analogue of a batched pandas UDF).
  *
  * The actual codecs are NOT present in this environment, so the decode
  * kernel is a clearly-marked deterministic STUB ([[decodeStub]]) — the
  * Spark-side contract around it (schemas, encoders, partition-batched
  * execution, frame sampling, columnar metadata ops) is real and tested,
  * and swapping the stub for a JNI/ffmpeg/ImageIO call changes nothing
  * upstream or downstream of it.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)
  final case class MediaRecord(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  final case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  implicit val mediaRecordEnc: Encoder[MediaRecord]     = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit val mediaFrameEnc: Encoder[MediaFrame]       = Encoders.product[MediaFrame]

  /** STUB decode kernel — stands in for a real codec (`ImageIO.read`,
    * ffmpeg, libsndfile…), none of which exist in this container.
    * Deterministic: features are bucketed rolling-hash energies of the
    * payload bytes, so tests get stable values and the full pipeline
    * shape (binary → Array[Float] of `dim`) matches a real embedder.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      acc(i % dim) += (h & 0xFFFF)
      i += 1
    }
    val n = math.max(bytes.length, 1)
    acc.map(a => (a.toDouble / n / 0xFFFF).toFloat)
  }

  /** Partition-batched feature extraction. One codec setup per partition
    * (modeled by the `new Array` scratch in the stub); records stream
    * through without collecting the partition.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] =
    media.mapPartitions { records =>
      // real impl: initialize the decoder/codec ONCE here, then map
      records.map(r => MediaFeatures(r.media_id, r.meta.kind, decodeStub(r.content, dim)))
    }

  /** Frame sampling: fixed-size byte windows every `stride` frames —
    * the video/audio "take every k-th frame" primitive, as a generator
    * (`flatMap`) so a long recording never materializes in one row.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0)
    media.flatMap { r =>
      val nFrames = r.content.length / frameBytes
      (0 until nFrames by stride).iterator.map { idx =>
        MediaFrame(r.media_id, idx,
          java.util.Arrays.copyOfRange(r.content, idx * frameBytes, (idx + 1) * frameBytes))
      }
    }
  }

  /** "Resize" stub: deterministic byte decimation to `targetBytes` —
    * stands in for an image resize; keeps the binary-in/binary-out
    * column contract.
    */
  def resizeStub(df: DataFrame, contentCol: String, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    // columnar slice (codegen'd) — a real resize would be a mapPartitions
    df.withColumn(contentCol, expr(s"substring($contentCol, 1, $targetBytes)"))
  }

  /** Columnar metadata ops — no decode needed, stays in codegen. */
  def withMediaStats(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("content_bytes", octet_length(col(contentCol)))
      .withColumn("content_md5", md5(col(contentCol)))
}
