package graft.ops

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // rank-1 data along d = (0.6, 0.8, 0, 0): x_i = c_i * d, mean 0
  private val cs = Seq(-2.0f, -1.0f, 1.0f, 2.0f)
  private def rank1 = cs.zipWithIndex.map { case (c, i) =>
    (i.toLong, Seq(c * 0.6f, c * 0.8f, 0.0f, 0.0f))
  }.toDF("vec_id", "embedding")

  test("topDirection recovers a planted rank-1 direction, unit-norm, sign-fixed") {
    val (v, means) = Pca.topDirection(rank1, "vec_id", "embedding", iters = 3)
    means.foreach(m => math.abs(m) should be < 1e-9)
    v(0) shouldBe 0.6 +- 1e-6
    v(1) shouldBe 0.8 +- 1e-6
    v(2) shouldBe 0.0 +- 1e-6
    v.map(x => x * x).sum shouldBe 1.0 +- 1e-12
  }

  test("sign convention: dim-0 loading is non-negative even for flipped data") {
    val flipped = cs.zipWithIndex.map { case (c, i) =>
      (i.toLong, Seq(-c * 0.6f, -c * 0.8f, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val (v, _) = Pca.topDirection(flipped, "vec_id", "embedding")
    v(0) should be >= 0.0
    v(0) shouldBe 0.6 +- 1e-6
  }

  test("projections recover the rank-1 coefficients") {
    val got = Pca.projections(rank1, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(_.getDouble(1))
    got.zip(cs).foreach { case (p, c) => p shouldBe c.toDouble +- 1e-6 }
  }

  test("mean-centering: a constant offset does not change the direction") {
    val shifted = cs.zipWithIndex.map { case (c, i) =>
      (i.toLong, Seq(c * 0.6f + 5.0f, c * 0.8f - 3.0f, 7.0f, 7.0f))
    }.toDF("vec_id", "embedding")
    val (v, means) = Pca.topDirection(shifted, "vec_id", "embedding")
    v(0) shouldBe 0.6 +- 1e-6
    v(1) shouldBe 0.8 +- 1e-6
    means(2) shouldBe 7.0 +- 1e-6
  }

  test("deterministic under repartitioning (two-level ordered folds)") {
    val base = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 7 + j * 3) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val runs = (1 to 3).map { n =>
      Pca.topDirection(base.repartition(n), "vec_id", "embedding")._1.toSeq
    }
    runs.distinct.size shouldBe 1 // bit-identical, not just approximately
  }
}
