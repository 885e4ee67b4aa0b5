package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus a typed
  * metadata struct; per-record decode/feature work runs inside
  * `mapPartitions` so one task amortizes codec initialization across its
  * whole partition (the JVM analogue of a batched pandas UDF).
  *
  * Pixel/PCM decode is REAL for the formats the JDK ships codecs for —
  * PNG/JPEG/GIF via `javax.imageio`, WAV PCM via `javax.sound.sampled`
  * ([[decodeImageFeatures]]/[[decodeWavFeatures]], plus real bilinear
  * [[resizeImage]] and the perceptual [[aHash64]]). Formats the JDK
  * cannot read (video containers, exotic codecs) fall back to the
  * clearly-marked deterministic STUB ([[decodeStub]]/[[resizeStub]]);
  * swapping that stub for a JNI/ffmpeg call changes nothing upstream
  * or downstream of it.
  *
  * Container-header METADATA extraction, by contrast, is fully real:
  * [[probeHeader]]/[[probeMedia]] parse PNG/JPEG/GIF/WAV headers with
  * plain byte arithmetic (dimensions, channels, sample rate, duration)
  * — no codec needed, tested against crafted binaries.
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

  /** STUB decode kernel — the fallback for formats the JDK cannot
    * decode (video containers, exotic codecs; real pixel/PCM decode for
    * PNG/JPEG/GIF/WAV lives in [[decodeImageFeatures]] /
    * [[decodeWavFeatures]], routed by [[decodeFeatures]]).
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

  /** REAL image decode via the JDK's `javax.imageio.ImageIO`
    * (PNG/JPEG/GIF ship with every JVM, headless-safe): decodes pixels
    * and emits a `dim`-bucket spatial luminance profile — bucket i is
    * the mean Rec.601 luma of the i-th contiguous run of pixels in
    * row-major order, in [0, 1]. `None` when ImageIO has no reader for
    * the payload or the stream is corrupt.
    */
  def decodeImageFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val total = w.toLong * h
        val acc = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var idx = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) // sRGB regardless of the stored model
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            val bucket = ((idx * dim) / total).toInt
            acc(bucket) += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            cnt(bucket) += 1
            idx += 1
            x += 1
          }
          y += 1
        }
        Some(Array.tabulate(dim)(i => if (cnt(i) == 0) 0f else (acc(i) / cnt(i)).toFloat))
      }
    } catch { case _: Exception => None }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV PCM
    * ships with every JVM): converts to 16-bit signed little-endian
    * PCM and emits a `dim`-bucket temporal energy profile — bucket i is
    * the mean |amplitude| of the i-th contiguous run of samples, in
    * [0, 1]. `None` when the payload is not an audio stream the JDK
    * can read.
    */
  def decodeWavFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val target = new AudioFormat(src.getSampleRate, 16, src.getChannels, true, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        val buf = pcm.readAllBytes()
        val nSamp = buf.length / 2
        if (nSamp == 0) Some(new Array[Float](dim))
        else {
          val acc = new Array[Double](dim)
          val cnt = new Array[Long](dim)
          var i = 0
          while (i < nSamp) {
            val s = (((buf(2 * i + 1): Int) << 8) | (buf(2 * i) & 0xFF)).toShort
            val bucket = ((i.toLong * dim) / nSamp).toInt
            acc(bucket) += math.abs(s / 32768.0)
            cnt(bucket) += 1
            i += 1
          }
          Some(Array.tabulate(dim)(j => if (cnt(j) == 0) 0f else (acc(j) / cnt(j)).toFloat))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Decode router: container sniff ([[probeHeader]]) picks the real JDK
    * kernel; formats with no JDK codec (video, unknown) fall back to the
    * clearly-marked [[decodeStub]] so the pipeline shape never breaks on
    * a mixed-modality corpus. Returns (decoder, features) — `decoder` is
    * "imageio" / "pcm" / "stub" so downstream can filter on provenance.
    */
  def decodeFeatures(bytes: Array[Byte], dim: Int): (String, Array[Float]) =
    probeHeader(bytes)._1 match {
      case "png" | "jpeg" | "gif" =>
        decodeImageFeatures(bytes, dim).map("imageio" -> _)
          .getOrElse("stub" -> decodeStub(bytes, dim))
      case "wav" =>
        decodeWavFeatures(bytes, dim).map("pcm" -> _)
          .getOrElse("stub" -> decodeStub(bytes, dim))
      case _ => "stub" -> decodeStub(bytes, dim)
    }

  /** Partition-batched feature extraction. One codec setup per partition;
    * records stream through without collecting the partition.
    * `realDecode = true` (default) routes PNG/JPEG/GIF/WAV payloads
    * through the real JDK codecs; `false` keeps the legacy stub-only
    * path (deterministic byte-hash features for arbitrary payloads).
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16,
                      realDecode: Boolean = true): Dataset[MediaFeatures] =
    media.mapPartitions { records =>
      // codec instances are JVM-wide (ImageIO registry); per-partition
      // scratch is allocated inside the decode kernels
      records.map { r =>
        val feats =
          if (realDecode) decodeFeatures(r.content, dim)._2
          else decodeStub(r.content, dim)
        MediaFeatures(r.media_id, r.meta.kind, feats)
      }
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
    * the fallback for formats the JDK cannot re-encode (video
    * containers); real image resize lives in [[resizeImage]] /
    * [[resizeImages]]. Keeps the binary-in/binary-out column contract.
    */
  def resizeStub(df: DataFrame, contentCol: String, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    // columnar slice (codegen'd) — a real resize would be a mapPartitions
    df.withColumn(contentCol, expr(s"substring($contentCol, 1, $targetBytes)"))
  }

  /** REAL image resize via the JDK (headless-safe): decode with
    * `ImageIO`, bilinear-draw onto a `w`×`h` RGB canvas, re-encode as
    * PNG. `None` when ImageIO has no reader for the payload — callers
    * route those to [[resizeStub]] or pass them through.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Batch image resize over the typed media stream: decodable images
    * come back as `w`×`h` PNGs, everything else passes through
    * unchanged (a resize pipeline must never drop or corrupt the
    * non-image rows riding the same column). `mapPartitions`-style
    * typed map — one decoder per row, executor-parallel, no driver
    * involvement.
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    require(w > 0 && h > 0)
    import media.sparkSession.implicits._
    media.map { r =>
      resizeImage(r.content, w, h) match {
        case Some(resized) => r.copy(content = resized)
        case None          => r
      }
    }
  }

  /** 64-bit average-hash (aHash) of an image: decode (real JDK codecs),
    * bilinear-reduce to an 8×8 luma grid, set bit i when cell i's luma
    * exceeds the grid mean. The standard cheap perceptual fingerprint —
    * stable under resize/re-encode/mild noise, bit-deterministic for a
    * given payload (ImageIO decode + integer Rec.601 luma, no RNG).
    * Bit order: row-major, bit 0 = top-left. `None` when the payload
    * is not a decodable image.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 8, 8, null)
        } finally g.dispose()
        val luma = new Array[Int](64)
        var total = 0L
        var i = 0
        while (i < 64) {
          val rgb = out.getRGB(i % 8, i / 8)
          val r = (rgb >> 16) & 0xFF
          val gg = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          luma(i) = 299 * r + 587 * gg + 114 * b // integer Rec.601 ×1000
          total += luma(i)
          i += 1
        }
        val mean = total / 64 // integer mean — deterministic threshold
        var h = 0L
        i = 0
        while (i < 64) {
          if (luma(i) > mean) h |= (1L << i)
          i += 1
        }
        Some(h)
      }
    } catch { case _: Exception => None }

  /** Perceptual near-duplicate image pairs: aHash Hamming distance ≤
    * `maxHamming`, found via the same quadrant-banding as
    * `Dedup.simHashNearDupPairs` — the 64-bit hash splits into four
    * 16-bit bands; two hashes within distance 3 < 4 must agree on at
    * least one band (pigeonhole), so candidates come from four
    * equi-joins on (band_idx, band_value), never an all-pairs scan,
    * and the exact `bit_count(xor)` check runs only on collisions.
    *
    * Scale posture: undecodable payloads drop out at the hash step
    * (one typed map); the candidate join is bucketed by band value —
    * |pairs per bucket| is governed by how many images share a 16-bit
    * quadrant, the aHash analogue of the SimHash regime analysis. The
    * pair set feeds [[graft.ops.Dedup.nearDupClusters]] unchanged when
    * components are wanted. Output: (a_id, b_id, hamming).
    */
  def imageNearDupPairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    hash64BandedPairs(
      media.flatMap(r => aHash64(r.content).map(h => (r.media_id, h)))
        .toDF("media_id", "h"),
      maxHamming)
  }

  /** Perceptual audio fingerprint: the 64-bucket temporal energy
    * envelope ([[decodeWavFeatures]]) thresholded at its own mean —
    * bit i set iff bucket i is louder than the track average. The
    * threshold is a RATIO of the signal to itself, so the hash is
    * GAIN-invariant (re-encoded / volume-normalized copies of a track
    * hash identically) and robust to mild noise, the audio analogue of
    * [[aHash64]]'s grid-mean rule. `None` when the payload is not an
    * audio stream the JDK can read.
    */
  def audioHash64(bytes: Array[Byte]): Option[Long] =
    decodeWavFeatures(bytes, 64).map { env =>
      var total = 0.0
      var i = 0
      while (i < 64) { total += env(i); i += 1 }
      val mean = total / 64
      var h = 0L
      i = 0
      while (i < 64) { if (env(i) > mean) h |= (1L << i); i += 1 }
      h
    }

  /** Perceptual near-duplicate audio pairs — [[imageNearDupPairs]]'s
    * audio twin over [[audioHash64]], same quadrant-banding recall
    * contract (complete to hamming ≤ 3). Output: (a_id, b_id, hamming).
    */
  def audioNearDupPairs(media: Dataset[MediaRecord],
                        maxHamming: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    hash64BandedPairs(
      media.flatMap(r => audioHash64(r.content).map(h => (r.media_id, h)))
        .toDF("media_id", "h"),
      maxHamming)
  }

  /** Shared banded join for 64-bit perceptual hashes: four 16-bit
    * quadrant bands, pigeonhole-complete for hamming ≤ 3, exact
    * `bit_count(xor)` only on collisions.
    */
  private def hash64BandedPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4-band pigeonhole guarantees recall only up to hamming 3")
    val bands = hashes.select(col("media_id"), col("h"),
      explode(expr(
        "transform(sequence(0, 3)," +
          " i -> struct(i AS band_idx," +
          " shiftright(h, 16 * i) & 65535L AS band_val))")).as("_b"))
      .select(col("media_id"), col("h"),
        col("_b.band_idx").as("band_idx"), col("_b.band_val").as("band_val"))
    val l = bands.select(col("band_idx"), col("band_val"),
      col("media_id").as("a_id"), col("h").as("ha"))
    val r = bands.select(col("band_idx"), col("band_val"),
      col("media_id").as("b_id"), col("h").as("hb"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Columnar metadata ops — no decode needed, stays in codegen. */
  def withMediaStats(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("content_bytes", octet_length(col(contentCol)))
      .withColumn("content_md5", md5(col(contentCol)))

  // ------------------------------------------------------------------
  // Container-header probing — REAL parsing, not a stub. Reading a
  // format's header (dimensions, channels, sample rate, duration) needs
  // no codec, only byte arithmetic, so this part of the multimodal
  // surface is fully functional in any environment. Formats: PNG
  // (IHDR), JPEG (SOF scan), GIF (logical screen), WAV (RIFF fmt/data).
  // ------------------------------------------------------------------

  /** Probed container metadata; -1 marks fields a format doesn't carry. */
  final case class MediaProbe(media_id: Long, format: String,
                              width: Int, height: Int, channels: Int,
                              sample_rate_hz: Int, duration_ms: Long)
  implicit val mediaProbeEnc: Encoder[MediaProbe] = Encoders.product[MediaProbe]

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Parse one container header. Total work is O(header), not O(file):
    * JPEG walks segment lengths, the rest read fixed offsets.
    */
  def probeHeader(b: Array[Byte]): (String, Int, Int, Int, Int, Long) = {
    def unknown = ("unknown", -1, -1, -1, -1, -1L)
    if (b == null || b.length < 10) unknown // 10 = smallest parseable header (GIF)
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first:
    // length(4) "IHDR" width(4 BE) height(4 BE) bitdepth(1) colortype(1)
    else if (b.take(8).sameElements(PngSig) && b.length >= 26 &&
             new String(b, 12, 4, "US-ASCII") == "IHDR") {
      val colorType = b(25) & 0xFF
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => -1
      }
      ("png", be32(b, 16), be32(b, 20), channels, -1, -1L)
    }
    // GIF: "GIF87a"/"GIF89a" then logical-screen width/height (LE16)
    else if (b.length >= 10 && (new String(b, 0, 6, "US-ASCII") == "GIF87a" ||
             new String(b, 0, 6, "US-ASCII") == "GIF89a")) {
      ("gif", le16(b, 6), le16(b, 8), -1, -1, -1L)
    }
    // WAV: "RIFF" size "WAVE", then chunks; "fmt " carries channels +
    // sample rate + byte rate, "data"'s size / byte rate = duration
    else if (new String(b, 0, 4, "US-ASCII") == "RIFF" && b.length >= 12 &&
             new String(b, 8, 4, "US-ASCII") == "WAVE") {
      var off = 12
      var channels = -1; var rate = -1; var byteRate = -1; var dataLen = -1L
      while (off + 8 <= b.length && (channels < 0 || dataLen < 0)) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = le32(b, off + 4)
        if (id == "fmt " && off + 16 + 8 <= b.length) {
          channels = le16(b, off + 10)
          rate = le32(b, off + 12)
          byteRate = le32(b, off + 16)
        } else if (id == "data") dataLen = size.toLong & 0xFFFFFFFFL
        off += 8 + size + (size & 1) // chunks are word-aligned
        if (size < 0) off = b.length // corrupt size: stop
      }
      val durMs = if (dataLen >= 0 && byteRate > 0) dataLen * 1000L / byteRate else -1L
      ("wav", -1, -1, channels, rate, durMs)
    }
    // JPEG: FF D8, then walk FF-marker segments to the first SOFn
    // (C0..CF minus C4/C8/CC): precision(1) height(2 BE) width(2 BE)
    // components(1)
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var off = 2
      var res = unknown
      var done = false
      while (!done && off + 4 <= b.length) {
        if ((b(off) & 0xFF) != 0xFF) { done = true } // desync: stop
        else {
          val marker = b(off + 1) & 0xFF
          if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
            off += 2 // standalone markers have no length
          } else if (marker == 0xD9 || marker == 0xDA) {
            done = true // EOI / start-of-scan: no SOF seen
          } else {
            val len = be16(b, off + 2)
            val isSof = marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC
            if (isSof && off + 9 < b.length) {
              res = ("jpeg", be16(b, off + 7), be16(b, off + 5), b(off + 9) & 0xFF, -1, -1L)
              done = true
            } else off += 2 + len
          }
        }
      }
      if (res._1 == "jpeg") res else unknown
    }
    else unknown
  }

  /** Probe a media dataset's container headers — one row per record,
    * columnar output, partition-streamed (never materializes payloads
    * beyond the row at hand).
    */
  def probeMedia(media: Dataset[MediaRecord]): Dataset[MediaProbe] =
    media.mapPartitions { records =>
      records.map { r =>
        val (fmt, w, h, ch, sr, dur) = probeHeader(r.content)
        MediaProbe(r.media_id, fmt, w, h, ch, sr, dur)
      }
    }
}
