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

  test("lengthBias: per-prompt longer-winner share") {
    val responses = Seq((1L, "a", 5L), (1L, "b", 10L), (1L, "c", 3L))
      .toDF("prompt_id", "item", "n_tokens")
    val got = Preference.lengthBias(
      prefs.filter($"prompt_id" === 1L), responses,
      "prompt_id", "chosen", "rejected", "prompt_id", "item", "n_tokens")
      .collect().head
    // votes: b(10)≻a(5) ×2 longer, a(5)≻b(10) shorter, a(5)≻c(3) longer
    got.getAs[Long]("n_votes") shouldBe 4L
    got.getAs[Long]("n_longer_wins") shouldBe 3L
    got.getAs[Long]("n_shorter_wins") shouldBe 1L
    got.getAs[Long]("n_equal") shouldBe 0L
    got.getAs[Long]("longer_win_ppm") shouldBe 750000L
  }

  test("copeland: net-vote scores; cycles flatten to all-zero scores") {
    val got = Preference.copeland(prefs, "prompt_id", "chosen", "rejected")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Long]("n_opp"), r.getAs[Long]("wins"), r.getAs[Long]("losses"),
          r.getAs[Long]("score"), r.getAs[Int]("rnk"))).toMap
    // prompt 3 clean chain: a=2 wins, b split, c=2 losses
    got((3L, "a")) shouldBe ((2L, 2L, 0L, 2L, 1))
    got((3L, "b")) shouldBe ((2L, 1L, 1L, 0L, 2))
    got((3L, "c")) shouldBe ((2L, 0L, 2L, -2L, 3))
    // prompt 1: b wins the net on the contradicted pair (2 > 1)
    got((1L, "b")) shouldBe ((1L, 1L, 0L, 1L, 1))
    got((1L, "a"))._4 shouldBe 0L
    // prompt 2 cycle: every item 1-1, score 0, ranked by item id
    got((2L, "a"))._4 shouldBe 0L
    got((2L, "b"))._4 shouldBe 0L
    got((2L, "c"))._4 shouldBe 0L
    got((2L, "a"))._5 shouldBe 1
  }

  test("bradleyTerry: two MM rounds from uniform, zero-win items sink to 0") {
    val got = Preference.bradleyTerry(
      prefs.filter($"prompt_id" === 3L), "prompt_id", "chosen", "rejected",
      iters = 2)
      .collect().map(r => r.getString(1) ->
        (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins"),
          r.getAs[Double]("strength"))).toMap
    // W: a=2, b=1, c=0; s1 = (2, 1, 0); s2 from the exact same fp tree
    val sa = 2.0 / (1.0 / (2.0 + 1.0) + 1.0 / (2.0 + 0.0))
    val sb = 1.0 / (1.0 / (1.0 + 2.0) + 1.0 / (1.0 + 0.0))
    got("a") shouldBe ((2L, 2L, sa))
    got("b") shouldBe ((2L, 1L, sb))
    got("c") shouldBe ((2L, 0L, 0.0))
    // the dominant item must outrank the middle one
    assert(got("a")._3 > got("b")._3 && got("b")._3 > 0.0)
  }
}
