package graft.ops

import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  // prompt 1: b≻a twice, a≻b once (contradiction), plus a≻c
  // prompt 2: a≻b≻c≻a (a 3-cycle), all single votes
  // prompt 3: clean chain a≻b, a≻c, b≻c
  private val prefs = Seq(
    (1L, "b", "a"), (1L, "b", "a"), (1L, "a", "b"), (1L, "a", "c"),
    (2L, "a", "b"), (2L, "b", "c"), (2L, "c", "a"),
    (3L, "a", "b"), (3L, "a", "c"), (3L, "b", "c"),
    (4L, "x", "x") // self-pair: dropped by the edge filter
  ).toDF("prompt_id", "chosen", "rejected")

  test("contradictions: both-direction pairs with per-direction counts") {
    val got = Preference.contradictions(prefs, "prompt_id", "chosen", "rejected")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    got.toSeq shouldBe Seq((1L, "a", "b", 1L, 2L))
  }

  test("cycles3: the planted cycle reports once, min-rotated; chains are silent") {
    val got = Preference.cycles3(prefs, "prompt_id", "chosen", "rejected")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    got.toSeq shouldBe Seq((2L, "a", "b", "c"))
  }

  test("winRates: integer-ppm record; degenerate items read 0 / 1e6") {
    val got = Preference.winRates(prefs, "prompt_id", "chosen", "rejected")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got((3L, "a")) shouldBe ((2L, 0L, 1000000L)) // never loses
    got((3L, "c")) shouldBe ((0L, 2L, 0L)) // never wins
    got((1L, "a")) shouldBe ((2L, 2L, 500000L))
    got.contains((4L, "x")) shouldBe false // self-pairs carry no signal
  }
}
