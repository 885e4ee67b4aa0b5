package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even, b odd)") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 0L), (0L, 65535L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): a bits 0,1 -> z bits 0,2; b bits 0,2 -> z bits 1,5
    got shouldBe Seq(0L, 1L, 2L, 1L + 2L + 4L + 32L, 0x55555555L, 0xAAAAAAAAL)
  }

  test("quantize16 clamps and preserves order") {
    val got = Seq(-5.0, 0.0, 500.0, 1000.0, 2000.0).toDF("v")
      .select(ZOrder.quantize16(col("v"), 0.0, 1000.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    got.head shouldBe 0L
    got(3) shouldBe 65535L
    got(4) shouldBe 65535L // clamped
    got shouldBe got.sorted
  }

  test("z-ordered files carry tight min/max boxes in BOTH dimensions") {
    // deterministic pseudo-uniform 2D points
    val pts = spark.range(0, 20000).select(
      ((col("id") * 7919) % 1000).as("x"),
      ((col("id") * 104729) % 1000).as("y"))
    val dirZ = java.nio.file.Files.createTempDirectory("zord").toString + "/z"
    val dirX = java.nio.file.Files.createTempDirectory("zord").toString + "/x"
    ZOrder.writeZOrdered(pts, "x", "y", dirZ, numFiles = 16)
    // baseline: single-dimension sort, same file count
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)

    def avgSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect()
      (spans.map(_.getLong(1)).sum.toDouble / spans.length,
        spans.map(_.getLong(2)).sum.toDouble / spans.length)
    }
    val (zx, zy) = avgSpans(dirZ)
    val (xx, xy) = avgSpans(dirX)
    // x-sorted: near-perfect x boxes, useless y boxes (most of the span)
    xy should be > 700.0
    // z-order: BOTH dimensions bounded well below full span
    zx should be < 600.0
    zy should be < 600.0
    zy should be < xy * 0.7
  }

  test("box query prunes z-ordered files by file-level stats") {
    val pts = spark.range(0, 20000).select(
      ((col("id") * 7919) % 1000).as("x"),
      ((col("id") * 104729) % 1000).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zordp").toString + "/z"
    ZOrder.writeZOrdered(pts, "x", "y", dir, numFiles = 16)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min("x"), max("x"), min("y"), max("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // a 100x100 box intersects only a minority of the 16 file boxes
    val hit = boxes.count { case (x0, x1, y0, y1) =>
      x1 >= 400 && x0 <= 500 && y1 >= 400 && y0 <= 500 }
    hit should be < boxes.length / 2
    // correctness unaffected: box-filtered read equals full-scan filter
    val n1 = spark.read.parquet(dir)
      .filter(col("x").between(400, 500) && col("y").between(400, 500)).count()
    val n2 = pts.filter(col("x").between(400, 500) && col("y").between(400, 500)).count()
    n1 shouldBe n2
  }
}
