package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def refMult(u: Long, rep: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${u}_$rep".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      d.take(4).map("%02x".format(_)).mkString, 16) % 1000000L
    val cum = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
      999405L, 999916L, 999989L, 999998L)
    cum.indexWhere(h < _) match { case -1 => 9L; case k => k.toLong }
  }

  test("replicate sums match an independent JVM md5-threshold computation") {
    val df = (0 until 30).map(u => (u.toLong, (u % 7 + 1) * 10)).toDF("unit", "v")
    val got = Bootstrap.poissonBootstrapMeans(df, "unit", col("v"), reps = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (0 until 8).foreach { b =>
      val ms = (0 until 30).map(u => refMult(u.toLong, b))
      val expectedN = ms.sum
      val expectedW = ms.zipWithIndex.map { case (m, u) => m * (u % 7 + 1) * 10 }.sum
      got(b.toLong) shouldBe ((expectedN, expectedW))
    }
  }

  test("constant metric: every non-empty replicate mean is exactly the constant") {
    val df = (0 until 200).map(u => (u.toLong, 42)).toDF("unit", "v")
    val rows = Bootstrap.poissonBootstrapMeans(df, "unit", col("v"), reps = 32)
      .collect()
    rows.length shouldBe 32
    rows.foreach { r =>
      if (r.getLong(1) > 0) r.getDouble(3) shouldBe 42.0
      else r.isNullAt(3) shouldBe true
    }
  }

  test("multiplicity distribution is Poisson(1)-shaped at depth") {
    // 500 units x 16 reps = 8000 draws; expect ~36.8% zeros, mean ~1
    val df = (0 until 500).map(u => (u.toLong, 1)).toDF("unit", "v")
    val rows = Bootstrap.poissonBootstrapMeans(df, "unit", col("v"), reps = 16)
      .collect()
    val totalM = rows.map(_.getLong(1)).sum.toDouble
    (totalM / 8000.0) shouldBe 1.0 +- 0.05
  }

  test("a unit whose metric is NULL on every row is excluded entirely") {
    val df = Seq((1L, Some(10)), (2L, None), (2L, None), (3L, Some(20)))
      .toDF("unit", "v")
    val withNullUnit = Bootstrap.poissonBootstrapMeans(df, "unit", col("v"), 8)
      .orderBy("rep").collect().map(_.toSeq).toSeq
    val without = Bootstrap.poissonBootstrapMeans(
      df.filter(col("v").isNotNull), "unit", col("v"), 8)
      .orderBy("rep").collect().map(_.toSeq).toSeq
    withNullUnit shouldBe without // no n_eff inflation from the NULL unit
  }

  test("deterministic under repartitioning") {
    val df = (0 until 100).map(u => (u.toLong, u % 13)).toDF("unit", "v")
    val a = Bootstrap.poissonBootstrapMeans(df, "unit", col("v"), 16)
      .orderBy("rep").collect().map(_.toSeq).toSeq
    val b = Bootstrap.poissonBootstrapMeans(df.repartition(9), "unit", col("v"), 16)
      .orderBy("rep").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
