package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    Sketch.kmvDistinct(df, "g", "v", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact below k: sketch not full means the count IS the answer") {
    val df = (1 to 10).flatMap(i => Seq(("a", i), ("a", i))) // dups too
      .toDF("g", "v")
    estimates(df, k = 64) shouldBe Map("a" -> 10L)
  }

  test("duplicate-insensitive: multiplicity never moves the estimate") {
    val base = (1 to 5000).map(i => ("a", i)).toDF("g", "v")
    val dup = base.unionAll(base).unionAll(base)
    estimates(base, k = 64) shouldBe estimates(dup, k = 64)
  }

  test("estimate lands near truth at k=256 on 5000 distincts") {
    val df = (1 to 5000).map(i => ("a", i)).toDF("g", "v")
    val est = estimates(df, k = 256)("a")
    // expected relative error ~1/sqrt(k) ≈ 6%; assert a loose 20% box
    est.toDouble shouldBe 5000.0 +- 1000.0
  }

  test("merge path: partitioning never changes the result") {
    val df = (1 to 3000).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "v")
    estimates(df.repartition(1), k = 64) shouldBe
      estimates(df.repartition(16), k = 64)
  }

  test("null values are ignored, countDistinct-style") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(2)), ("b", None))
      .toDF("g", "v")
    // group b has only null values → no surviving rows, no output row
    estimates(df, k = 64) shouldBe Map("a" -> 2L)
  }

  test("KmvAgg.finish applies the (k-1)*2^52 div h_k estimator") {
    val agg = new Sketch.KmvAgg(4)
    val buf = Array(10L, 20L, 30L, 1L << 50)
    agg.finish(buf) shouldBe 3L * (1L << 52) / (1L << 50) // = 12
    agg.finish(Array(10L, 20L)) shouldBe 2L // not full → exact
  }
}
