package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 1000L).toDF("id")

  test("hashBucket is a pure function of the key: partitioning never changes membership") {
    val a = Sampling.sampleByHash(ids, "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(ids.repartition(13), "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    val c = Sampling.sampleByHash(ids.orderBy(col("id").desc), "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    a shouldBe b
    a shouldBe c
    // ~10% of the keyspace, binomial tolerance
    a.size.toDouble should (be >= 60.0 and be <= 140.0)
  }

  test("trainTestSplit covers every row exactly once and is key-stable") {
    val split = Sampling.trainTestSplit(ids, "id", testBuckets = 20)
    split.count() shouldBe 1000
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.keySet shouldBe Set("train", "test")
    byLabel.values.sum shouldBe 1000
    byLabel("test").toDouble should (be >= 120.0 and be <= 280.0)
    // disjoint by construction: same key never flips label
    val again = Sampling.trainTestSplit(ids.repartition(7), "id", testBuckets = 20)
      .filter(col("split") === "test").collect().map(_.getLong(0)).toSet
    split.filter(col("split") === "test").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("stratifiedSampleByHash applies per-stratum thresholds; unlisted strata drop") {
    val rows = (1L to 300L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b" else "c")).toDF("id", "cls")
    val kept = Sampling.stratifiedSampleByHash(rows, "id", "cls",
      Map("a" -> 100, "b" -> 0)) // keep all of a, none of b, c unlisted
    val byCls = kept.groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byCls shouldBe Map("a" -> 100L)
    // the kept subset of a stratum equals the unstratified hash sample
    val keptHalf = Sampling.stratifiedSampleByHash(rows, "id", "cls", Map("c" -> 50))
      .collect().map(_.getLong(0)).toSet
    val plain = Sampling.sampleByHash(rows.filter(col("cls") === "c"), "id", 50)
      .collect().map(_.getLong(0)).toSet
    keptHalf shouldBe plain
  }
}
