package graft.ops

import graft.SparkSpec

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val d = 8
  private val k = 4

  private def oneHot(i: Int) =
    Seq((i.toLong, Seq.tabulate(d)(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")

  test("one-hot vectors read the sign matrix directly: every proj is ±1") {
    val got = Projection.jlProject(spark, oneHot(3), "vec_id", "embedding", d, k)
      .collect()
    got.length shouldBe k
    got.foreach(r => math.abs(r.getDouble(2)) shouldBe 1.0)
  }

  test("signs are a deterministic function of (comp, dim) — stable across calls") {
    val a = Projection.jlProject(spark, oneHot(5), "vec_id", "embedding", d, k)
      .orderBy("comp").collect().map(_.getDouble(2)).toSeq
    val b = Projection.jlProject(spark, oneHot(5), "vec_id", "embedding", d, k)
      .orderBy("comp").collect().map(_.getDouble(2)).toSeq
    a shouldBe b
    // and genuinely mixed: a ±1 column is not constant across dims
    val dims = (0 until d).map { i =>
      Projection.jlProject(spark, oneHot(i), "vec_id", "embedding", d, k)
        .filter($"comp" === 0L).collect()(0).getDouble(2)
    }
    dims.toSet.size shouldBe 2
  }

  test("linearity: proj(2x) = 2 proj(x), proj(x+y) = proj(x) + proj(y)") {
    val x = Seq.tabulate(d)(j => (j + 1).toFloat)
    val twoX = Seq((1L, x), (2L, x.map(_ * 2)))
      .toDF("vec_id", "embedding")
    val got = Projection.jlProject(spark, twoX, "vec_id", "embedding", d, k)
      .orderBy("vec_id", "comp").collect()
    val (p1, p2) = got.partition(_.getLong(0) == 1L)
    p1.zip(p2).foreach { case (a, b) =>
      b.getDouble(2) shouldBe 2.0 * a.getDouble(2) +- 1e-12
    }
  }

  test("distortion of a one-hot vector is exactly d (‖y‖² = k, ‖x‖² = 1)") {
    val got = Projection.jlDistortion(spark, oneHot(2), "vec_id", "embedding", d, k)
      .collect()(0)
    got.getDouble(1) shouldBe d.toDouble
  }

  test("zero vector masks distortion to NULL") {
    val z = Seq((1L, Seq.fill(d)(0.0f))).toDF("vec_id", "embedding")
    val got = Projection.jlDistortion(spark, z, "vec_id", "embedding", d, k)
      .collect()(0)
    got.isNullAt(1) shouldBe true
  }

  test("deterministic under repartitioning (pure map-side)") {
    val big = (0 until 100).map { i =>
      (i.toLong, Seq.tabulate(d)(j => ((i * 3 + j) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    val a = Projection.jlProject(spark, big, "vec_id", "embedding", d, k)
      .orderBy("vec_id", "comp").collect().map(_.toSeq).toSeq
    val b = Projection.jlProject(spark, big.repartition(7), "vec_id", "embedding", d, k)
      .orderBy("vec_id", "comp").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
