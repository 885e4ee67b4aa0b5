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
}
