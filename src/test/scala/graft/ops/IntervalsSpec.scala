package graft.ops

import graft.SparkSpec

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Intervals.coveredExtent(rows.toDF("g", "s", "e"), "g", "s", "e")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("coveredExtent merges overlaps and half-open adjacency") {
    // [0,10) ∪ [5,20) ∪ [20,30) chain into one island (20 touches 20);
    // [40,50) stands alone → covered 30 + 10
    val got = run(Seq(("u", 0L, 10L), ("u", 5L, 20L), ("u", 20L, 30L),
      ("u", 40L, 50L)))
    got("u") shouldBe ((4L, 2L, 40L))
  }

  test("coveredExtent: containment, duplicates, zero-length") {
    val got = run(Seq(
      ("a", 0L, 100L), ("a", 10L, 20L),   // contained — adds nothing
      ("b", 5L, 9L), ("b", 5L, 9L),       // exact duplicate pair
      ("c", 7L, 7L)))                     // zero-length: island of extent 0
    got("a") shouldBe ((2L, 1L, 100L))
    got("b") shouldBe ((2L, 1L, 4L))
    got("c") shouldBe ((1L, 1L, 0L))
  }

  test("coveredExtent drops inverted and null-field intervals") {
    val rows = Seq(
      ("u", Some(0L), Some(10L)),
      ("u", Some(50L), Some(40L)), // e < s — dropped
      ("u", None, Some(5L)), ("u", Some(5L), None))
      .toDF("g", "s", "e")
    Intervals.coveredExtent(rows, "g", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe Seq((1L, 1L, 10L))
  }

  test("coveredExtent is partitioning-invariant") {
    val rows = (1L to 300L).map(i =>
      (s"g${i % 7}", i % 83L, i % 83L + i % 29L))
    run(rows) shouldBe
      Intervals.coveredExtent(rows.toDF("g", "s", "e").repartition(17), "g", "s", "e")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
  }
}
