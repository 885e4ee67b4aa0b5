package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"compact_$tag").toString + "/data"

  test("compaction collapses a many-small-file dataset, preserving rows exactly") {
    val dir = freshDir("a")
    spark.range(0, 10000).select(col("id"), (col("id") * 3).as("v"))
      .repartition(25).write.parquet(dir)
    Compact.dataFileCount(spark, dir) shouldBe 25

    val before = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.toString)
    val n = Compact.compact(spark, dir, targetBytes = 1L << 30) // everything fits one file
    n shouldBe 1
    val after = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.toString)
    after shouldBe before
  }

  test("target size drives the output file count") {
    val dir = freshDir("b")
    spark.range(0, 50000).select(col("id"), md5(col("id").cast("string")).as("pad"))
      .repartition(40).write.parquet(dir)
    val bytes = Compact.dataBytes(spark, dir)
    val target = bytes / 4 + 1 // want ~4 files
    val n = Compact.compact(spark, dir, targetBytes = target)
    n should (be >= 3 and be <= 5)
    spark.read.parquet(dir).count() shouldBe 50000L
  }

  test("a crash between the two swap renames is repaired on the next call") {
    val dir = freshDir("d")
    spark.range(0, 1000).write.parquet(dir)
    val rows = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.toString)

    // simulate: rename(path -> ._compact_old) succeeded, then crash
    val f = new java.io.File(dir)
    val old = new java.io.File(dir + "._compact_old")
    assert(f.renameTo(old))
    assert(!f.exists())

    Compact.recoverCrashedSwap(spark, dir) shouldBe true
    spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.toString) shouldBe rows

    // simulate: swap published but cleanup of ._compact_old was lost
    spark.range(0, 10).write.parquet(old.toString)
    Compact.recoverCrashedSwap(spark, dir) shouldBe true
    old.exists() shouldBe false
    spark.read.parquet(dir).count() shouldBe 1000L

    // clean state: nothing to repair
    Compact.recoverCrashedSwap(spark, dir) shouldBe false
  }

  test("already-compact datasets are left untouched (no rewrite)") {
    val dir = freshDir("c")
    spark.range(0, 100).repartition(1).write.parquet(dir)
    val mtimeBefore = new java.io.File(dir).listFiles().map(_.lastModified).max
    Thread.sleep(20)
    Compact.compact(spark, dir, targetBytes = 1L << 30) shouldBe 1
    val mtimeAfter = new java.io.File(dir).listFiles().map(_.lastModified).max
    mtimeAfter shouldBe mtimeBefore
  }
}
