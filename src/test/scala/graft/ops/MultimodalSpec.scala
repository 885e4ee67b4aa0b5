package graft.ops

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {

  private def mkRecord(id: Long, n: Int, kind: String = "image") =
    MediaRecord(id, Array.tabulate(n)(i => ((i * 7 + id) % 251).toByte),
      MediaMeta(kind, 64, 64, 0, 0L))

  private lazy val media =
    spark.createDataset(Seq(mkRecord(1, 1000), mkRecord(2, 500, "audio"), mkRecord(3, 0)))

  test("extractFeatures: stable schema, dim-sized vectors, deterministic") {
    val feats = extractFeatures(media, dim = 8)
    feats.schema.fieldNames.toSeq shouldBe Seq("media_id", "kind", "features")
    val rows = feats.collect().map(f => f.media_id -> f).toMap
    rows(1L).features.length shouldBe 8
    rows(3L).features.length shouldBe 8 // empty payload still yields a vector
    // deterministic across runs
    extractFeatures(media, dim = 8).collect().map(f => f.media_id -> f.features.toSeq).toMap shouldBe
      rows.map { case (k, v) => k -> v.features.toSeq }
  }

  test("extractFeatures runs partition-batched without repartitioning") {
    val parts = media.repartition(3)
    extractFeatures(parts, 4).rdd.getNumPartitions shouldBe 3
  }

  test("sampleFrames emits every stride-th fixed-size window") {
    val frames = sampleFrames(media, frameBytes = 100, stride = 2).collect()
      .groupBy(_.media_id)
    frames(1L).map(_.frame_idx).sorted.toSeq shouldBe Seq(0, 2, 4, 6, 8)
    frames(1L).foreach(_.frame.length shouldBe 100)
    frames(2L).map(_.frame_idx).sorted.toSeq shouldBe Seq(0, 2, 4)
    frames.contains(3L) shouldBe false // empty payload -> no frames
  }

  test("end-to-end media dedup: decode features feed cosine similarity") {
    // two byte-identical payloads and one distinct one — after (stub)
    // decode, the duplicate pair must be each other's top neighbor at
    // cosine ~1.0 while the distinct payload scores lower
    val dupA  = mkRecord(10, 800)
    val dupB  = dupA.copy(media_id = 11)
    val other = mkRecord(12, 800)
    val ds = spark.createDataset(Seq(dupA, dupB, other))
    val feats = extractFeatures(ds, dim = 8)
      .select(org.apache.spark.sql.functions.col("media_id").as("vec_id"),
        org.apache.spark.sql.functions.col("features").as("embedding"))
    val pairs = Similarity.nearDupCosine(feats, "vec_id", "embedding", tau = 0.999999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.toSet shouldBe Set((10L, 11L))
  }

  test("resizeStub truncates payloads columnar; withMediaStats adds md5/size") {
    val df = media.toDF()
    val resized = resizeStub(df, "content", 64)
    import org.apache.spark.sql.functions._
    resized.select(max(octet_length(col("content")))).collect().head.getInt(0) shouldBe 64
    val stats = withMediaStats(df, "content").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Int]("content_bytes")).toMap
    stats(1L) shouldBe 1000
    stats(3L) shouldBe 0
  }

  // ---- container-header probing: REAL parsers over crafted binaries ----

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def png(w: Int, h: Int, colorType: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
      bytes(w >>> 24, w >>> 16, w >>> 8, w, h >>> 24, h >>> 16, h >>> 8, h,
        8, colorType, 0, 0, 0) ++ bytes(0, 0, 0, 0) // bitdepth..crc

  private def jpeg(w: Int, h: Int): Array[Byte] =
    bytes(0xFF, 0xD8,                      // SOI
      0xFF, 0xE0, 0x00, 0x10) ++           // APP0, len 16
      Array.fill[Byte](14)(0x4A) ++
      bytes(0xFF, 0xC0, 0x00, 0x11, 8,     // SOF0, len 17, precision 8
        h >>> 8, h, w >>> 8, w, 3) ++      // height, width, 3 components
      Array.fill[Byte](12)(0) ++
      bytes(0xFF, 0xD9)                    // EOI

  private def wav(rate: Int, ch: Int, dataLen: Int): Array[Byte] = {
    val byteRate = rate * ch * 2
    def le16(v: Int) = bytes(v, v >>> 8)
    def le32(v: Int) = bytes(v, v >>> 8, v >>> 16, v >>> 24)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(ch) ++
      le32(rate) ++ le32(byteRate) ++ le16(ch * 2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++ Array.fill[Byte](dataLen)(0)
  }

  test("probeHeader parses real PNG / JPEG / GIF / WAV headers") {
    probeHeader(png(640, 480, colorType = 6)) shouldBe (("png", 640, 480, 4, -1, -1L))
    probeHeader(png(16384, 2, colorType = 0)) shouldBe (("png", 16384, 2, 1, -1, -1L))
    probeHeader(jpeg(1920, 1080)) shouldBe (("jpeg", 1920, 1080, 3, -1, -1L))
    probeHeader("GIF89a".getBytes("US-ASCII") ++ bytes(0x40, 0x01, 0xF0, 0x00))
      .shouldBe(("gif", 320, 240, -1, -1, -1L))
    // 44.1 kHz stereo 16-bit, 88200 data bytes = 500 ms
    probeHeader(wav(44100, 2, 88200)) shouldBe (("wav", -1, -1, 2, 44100, 500L))
  }

  test("probeHeader is total: garbage, truncated, and empty inputs -> unknown") {
    probeHeader(Array.emptyByteArray)._1 shouldBe "unknown"
    probeHeader(bytes(0xFF, 0xD8, 0xFF)) shouldBe (("unknown", -1, -1, -1, -1, -1L))
    probeHeader(png(640, 480, 6).take(20))._1 shouldBe "unknown"
    probeHeader(Array.tabulate[Byte](64)(_.toByte))._1 shouldBe "unknown"
    // JPEG with no SOF before EOI
    probeHeader(bytes(0xFF, 0xD8, 0xFF, 0xD9) ++ Array.fill[Byte](8)(0))._1 shouldBe "unknown"
  }

  // ---- REAL JDK decode: ImageIO pixels + javax.sound PCM samples ----

  /** A real encoded PNG: left half black, right half white. */
  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real PCM WAV: first half silence, second half full-scale. */
  private def realWav(nSamples: Int): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    for (i <- nSamples / 2 until nSamples) {
      data(2 * i) = 0xFF.toByte; data(2 * i + 1) = 0x7F.toByte // +32767 LE
    }
    val byteRate = 8000 * 2
    def le16(v: Int) = bytes(v, v >>> 8)
    def le32(v: Int) = bytes(v, v >>> 8, v >>> 16, v >>> 24)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(byteRate) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** A real PCM WAV with a caller-shaped envelope: `pattern(i)` gives
    * bucket i's amplitude (64 buckets), `gain` scales the whole track.
    */
  private def shapedWav(pattern: Int => Double, gain: Double = 1.0,
                        nSamples: Int = 6400): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val bucket = (i.toLong * 64 / nSamples).toInt
      val v = math.max(-32768, math.min(32767,
        (pattern(bucket) * gain * 32767).round.toInt))
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val byteRate = 8000 * 2
    def le16(v: Int) = bytes(v, v >>> 8)
    def le32(v: Int) = bytes(v, v >>> 8, v >>> 16, v >>> 24)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(byteRate) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  test("audioHash64 is gain-invariant and separates envelope shapes") {
    val pulse = (b: Int) => if (b % 2 == 0) 0.9 else 0.1
    val ramp = (b: Int) => b / 64.0
    val loud = audioHash64(shapedWav(pulse)).get
    val quiet = audioHash64(shapedWav(pulse, gain = 0.25)).get
    loud shouldBe quiet // mean threshold is a ratio of the signal to itself
    val other = audioHash64(shapedWav(ramp)).get
    java.lang.Long.bitCount(loud ^ other) should be > 3
    audioHash64("not audio at all".getBytes("UTF-8")) shouldBe None
  }

  test("audioNearDupPairs: re-gained copy pairs up, different shape does not") {
    val pulse = (b: Int) => if (b % 2 == 0) 0.9 else 0.1
    val ramp = (b: Int) => b / 64.0
    val media = spark.createDataset(Seq(
      MediaRecord(1, shapedWav(pulse), MediaMeta("audio", 0, 0, 8000, 800)),
      MediaRecord(2, shapedWav(pulse, gain = 0.5), MediaMeta("audio", 0, 0, 8000, 800)),
      MediaRecord(3, shapedWav(ramp), MediaMeta("audio", 0, 0, 8000, 800)),
      MediaRecord(4, "garbage payload".getBytes("UTF-8"), MediaMeta("junk", 0, 0, 0, 0))
    ))(org.apache.spark.sql.Encoders.product[MediaRecord])
    val pairs = Multimodal.audioNearDupPairs(media).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((1L, 2L))
    pairs.head.getLong(2) shouldBe 0L
  }

  test("decodeImageFeatures reads real PNG pixels: spatial luminance profile") {
    // 64 wide, 4 tall, dim=2: bucket 0 covers the first half of the
    // row-major pixel stream. Each ROW is half black half white, so both
    // buckets average to ~0.5 — use a vertical split instead: encode via
    // per-bucket math on the horizontal split image with dim = image
    // width buckets per row… simpler: 2 rows, dim=2 -> bucket 0 = row 0.
    // Row-major halves of a left/right split image both mix, so assert
    // the mixed mean; then a solid image pins the endpoints exactly.
    val (dec, mixed) = decodeFeatures(realPng(64, 4), dim = 2)
    dec shouldBe "imageio"
    mixed.foreach(_ shouldBe 0.5f +- 0.02f)

    val white = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) white.setRGB(x, y, 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(white, "png", out)
    val Some(f) = decodeImageFeatures(out.toByteArray, dim = 4)
    f.foreach(_ shouldBe 1.0f +- 1e-3f)
  }

  test("decodeWavFeatures reads real PCM samples: temporal energy profile") {
    val (dec, f) = decodeFeatures(realWav(8000), dim = 2)
    dec shouldBe "pcm"
    f(0) shouldBe 0.0f +- 1e-4f          // first half: silence
    f(1) shouldBe 1.0f +- 1e-3f          // second half: full scale
  }

  test("decodeFeatures falls back to the stub for undecodable payloads") {
    val garbage = Array.tabulate[Byte](256)(_.toByte)
    val (dec, f) = decodeFeatures(garbage, dim = 8)
    dec shouldBe "stub"
    f.toSeq shouldBe decodeStub(garbage, 8).toSeq
    // a PNG header with a corrupt body must degrade to the stub, not throw
    decodeFeatures(png(64, 64, 2), dim = 8)._1 shouldBe "stub"
  }

  test("extractFeatures routes real media through the JDK codecs in Spark") {
    val ds = spark.createDataset(Seq(
      MediaRecord(1, realPng(32, 8), MediaMeta("image", 32, 8, 0, 0)),
      MediaRecord(2, realWav(4000), MediaMeta("audio", 0, 0, 8000, 500)),
      MediaRecord(3, Array.tabulate[Byte](100)(_.toByte), MediaMeta("video", 0, 0, 0, 0))))
    val rows = extractFeatures(ds, dim = 2).collect().map(f => f.media_id -> f.features).toMap
    rows(1L)(0) shouldBe 0.5f +- 0.02f   // real pixels: half black/half white
    rows(2L)(1) shouldBe 1.0f +- 1e-3f   // real samples: loud second half
    rows(3L).length shouldBe 2           // stub fallback still yields the contract
  }

  test("probeMedia emits one typed metadata row per record, distributed") {
    val ds = spark.createDataset(Seq(
      MediaRecord(1, png(64, 32, 2), MediaMeta("image", 0, 0, 0, 0)),
      MediaRecord(2, wav(16000, 1, 32000), MediaMeta("audio", 0, 0, 0, 0)),
      MediaRecord(3, Array.emptyByteArray, MediaMeta("?", 0, 0, 0, 0)))).repartition(2)
    val got = probeMedia(ds).collect().map(p => p.media_id -> p).toMap
    got(1L).format shouldBe "png"
    got(1L).width shouldBe 64
    got(1L).channels shouldBe 3
    got(2L).format shouldBe "wav"
    got(2L).sample_rate_hz shouldBe 16000
    got(2L).duration_ms shouldBe 1000L
    got(3L).format shouldBe "unknown"
  }

  test("resizeImage: real JDK resize — output is a PNG of the target size, content preserved") {
    // TOP-black / BOTTOM-white so the row-major luminance buckets split
    // cleanly (a left/right split mixes inside every bucket)
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (y < 2) 0x000000 else 0xFFFFFF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)

    val resized = Multimodal.resizeImage(out.toByteArray, 4, 2).get
    val (fmt, w, h, _, _, _) = Multimodal.probeHeader(resized)
    (fmt, w, h) shouldBe (("png", 4, 2))
    val feats = Multimodal.decodeImageFeatures(resized, 2).get
    feats(0) should be < 0.3f  // top row stays dark
    feats(1) should be > 0.7f  // bottom row stays bright
    // non-image payloads are not resizable
    Multimodal.resizeImage(Array[Byte](1, 2, 3), 4, 2) shouldBe None
  }

  /** Half-black/half-white PNG with the top-left 8th-block optionally
    * toggled white — one aHash grid cell's worth of perturbation. */
  private def patternPng(w: Int, h: Int, toggleBlock: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val inBlock = toggleBlock && x < w / 8 && y < h / 8
      img.setRGB(x, y, if (inBlock || x >= w / 2) 0xFFFFFF else 0x000000)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash64 is resize-invariant for the same pattern, far for the inverse") {
    val a = Multimodal.aHash64(patternPng(64, 64, toggleBlock = false)).get
    val b = Multimodal.aHash64(patternPng(32, 32, toggleBlock = false)).get
    a shouldBe b // same half-plane pattern at 2 scales → identical grid
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if (x < 32) 0xFFFFFF else 0x000000)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      Multimodal.aHash64(out.toByteArray).get
    }
    java.lang.Long.bitCount(a ^ inv) shouldBe 64 // complement pattern
    Multimodal.aHash64(realWav(160)) shouldBe None // not an image
  }

  test("aHash64: one toggled grid block is exactly one bit of distance") {
    val a = Multimodal.aHash64(patternPng(64, 64, toggleBlock = false)).get
    val t = Multimodal.aHash64(patternPng(64, 64, toggleBlock = true)).get
    java.lang.Long.bitCount(a ^ t) shouldBe 1
  }

  test("imageNearDupPairs: banded candidates find near pairs, skip far ones") {
    import spark.implicits._
    def rec(id: Long, content: Array[Byte]) =
      Multimodal.MediaRecord(id, content, Multimodal.MediaMeta("png", -1, -1, -1, -1L))
    val inv = {
      val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if (x < 32) 0xFFFFFF else 0x000000)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      rec(1L, patternPng(64, 64, toggleBlock = false)),
      rec(2L, patternPng(32, 32, toggleBlock = false)), // dup of 1 at half size
      rec(3L, patternPng(64, 64, toggleBlock = true)),  // hamming 1 from 1
      rec(4L, inv),                                     // hamming 64 — far
      rec(5L, realWav(160))                             // undecodable → dropped
    ).toDS()
    val got = Multimodal.imageNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (2L, 3L) -> 1L)
  }

  test("resizeImages: images resized in place, non-image rows pass through untouched") {
    import spark.implicits._
    val wav = realWav(1600)
    val rows = Seq(
      Multimodal.MediaRecord(1L, realPng(8, 4),
        Multimodal.MediaMeta("png", 8, 4, -1, -1L)),
      Multimodal.MediaRecord(2L, wav,
        Multimodal.MediaMeta("wav", -1, -1, 8000, 100L))).toDS()
    val got = Multimodal.resizeImages(rows, 4, 2)
      .collect().map(r => r.media_id -> r.content).toMap
    Multimodal.probeHeader(got(1L))._2 shouldBe 4
    got(2L) shouldBe wav // byte-identical passthrough
  }
}
