package graft.ops

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 operator batch: Fleiss' kappa (multi-rater agreement),
  * Cliff's delta (ordinal dominance effect size), dominant-period
  * detection (ACF-peak lag with a noise floor), and the DP stability
  * histogram (contribution-bounded, noisy-thresholded release over a
  * data-derived category domain).
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- fleiss

  test("fleissKappa matches the hand-computed 3-item panel (kappa = 0.55)") {
    // items A [X,X,X], B [X,X,Y], C [Y,Y,Y]; D has only 2 ratings ->
    // excluded; E has 4 -> capped to its FIRST 3 by order (X,X,X; the
    // 4th, a Y, must not count)... E changes the numbers, so keep E out
    // of this fixture and test the cap separately.
    val rows = Seq(
      ("A", "X", 1), ("A", "X", 2), ("A", "X", 3),
      ("B", "X", 1), ("B", "X", 2), ("B", "Y", 3),
      ("C", "Y", 1), ("C", "Y", 2), ("C", "Y", 3),
      ("D", "X", 1), ("D", "Y", 2)).toDF("item", "cat", "ord")
    val got = Stats.fleissKappa(rows, "item", "cat", col("ord"), nRaters = 3)
      .collect().head
    got.getLong(0) shouldBe 3L       // n_items (D excluded)
    got.getLong(1) shouldBe 3L       // n_raters
    got.getLong(2) shouldBe 2L       // n_categories
    // P_bar = (9+5+9-9)/(3*3*2) = 14/18; P_e = (5/9)^2+(4/9)^2 = 41/81
    got.getDouble(3) shouldBe 0.777778
    got.getDouble(4) shouldBe 0.506173
    got.getDouble(5) shouldBe 0.55   // (63/81-41/81)/(40/81) = 22/40
  }

  test("fleissKappa caps each item to its n first ratings by order") {
    // one item, 4 ratings [X@1, X@2, Y@3, Y@4], n=3 -> panel is X,X,Y
    val rows = Seq(("A", "X", 1), ("A", "X", 2), ("A", "Y", 3), ("A", "Y", 4))
      .toDF("item", "cat", "ord")
    val got = Stats.fleissKappa(rows, "item", "cat", col("ord"), nRaters = 3)
      .collect().head
    got.getLong(0) shouldBe 1L
    // s2 = 4+1 = 5; P_bar = (5-3)/(1*3*2) = 1/3
    got.getDouble(3) shouldBe 0.333333
  }

  test("fleissKappa: unanimous single category masks kappa to null (p_e = 1)") {
    val rows = Seq(("A", "X", 1), ("A", "X", 2), ("B", "X", 1), ("B", "X", 2))
      .toDF("item", "cat", "ord")
    val got = Stats.fleissKappa(rows, "item", "cat", col("ord"), nRaters = 2)
      .collect().head
    got.getDouble(4) shouldBe 1.0
    got.isNullAt(5) shouldBe true
  }

  // ---------------------------------------------------------------- cliffs

  test("cliffsDelta matches the enumerated pair count incl. a cross-arm tie") {
    // arm1 = [3, 5], arm0 = [1, 5]: pairs >: (3,1),(5,1); <: (3,5); =: (5,5)
    // delta = (2 - 1) / 4 = 0.25
    val rows = Seq((true, 3L), (true, 5L), (false, 1L), (false, 5L))
      .toDF("arm", "x")
    val got = Stats.cliffsDelta(rows, col("arm"), col("x")).collect().head
    got.getLong(0) shouldBe 2L
    got.getLong(1) shouldBe 2L
    got.getLong(2) shouldBe 4L
    got.getDouble(3) shouldBe 0.25
  }

  test("cliffsDelta is +1/-1 on fully separated arms and null on an empty arm") {
    val sep = Seq((true, 10L), (true, 11L), (false, 1L), (false, 2L))
      .toDF("arm", "x")
    Stats.cliffsDelta(sep, col("arm"), col("x"))
      .collect().head.getDouble(3) shouldBe 1.0
    val flip = Stats.cliffsDelta(sep, !col("arm"), col("x")).collect().head
    flip.getDouble(3) shouldBe -1.0
    val solo = Seq((true, 1L)).toDF("arm", "x")
    Stats.cliffsDelta(solo, col("arm"), col("x"))
      .collect().head.isNullAt(3) shouldBe true
  }

  // ------------------------------------------------------- dominant period

  private def day(i: Int) = Timestamp.valueOf(f"2024-03-${i + 1}%02d 00:00:00")

  test("dominantPeriod finds the planted period-2 cycle") {
    // 12 days alternating 1/5 events: u = 12x-36 = ±24, r2 = 10/12
    val rows = (0 until 12).flatMap { d =>
      val n = if (d % 2 == 0) 1 else 5
      Seq.fill(n)(("a", day(d)))
    }.toDF("series", "ts")
    val got = TimeSeries.dominantPeriod(rows, "series", "ts", maxLag = 4)
      .collect().head
    got.getString(0) shouldBe "a"
    got.getLong(1) shouldBe 12L
    got.getLong(2) shouldBe 2L
    got.getDouble(3) shouldBe 0.833333
  }

  test("dominantPeriod reports a null lag below the noise floor and on constants") {
    // constant series: xmin = xmax -> every r is null -> null lag AND null peak
    val const = (0 until 10).map(d => ("c", day(d))).toDF("series", "ts")
    val g1 = TimeSeries.dominantPeriod(const, "series", "ts", maxLag = 3)
      .collect().head
    g1.isNullAt(2) shouldBe true
    g1.isNullAt(3) shouldBe true
    // planted cycle but a floor above its peak -> lag suppressed, peak kept
    val rows = (0 until 12).flatMap { d =>
      Seq.fill(if (d % 2 == 0) 1 else 5)(("a", day(d)))
    }.toDF("series", "ts")
    val g2 = TimeSeries.dominantPeriod(rows, "series", "ts",
      maxLag = 4, minR = 0.9).collect().head
    g2.isNullAt(2) shouldBe true
    g2.getDouble(3) shouldBe 0.833333
  }

  // ---------------------------------------------------------- gof / srm

  test("chiSquareGof matches the hand-computed SRM chi-square") {
    // 60/40 observed vs declared 50/50 on n=100: chi2 = 2*(10^2/50) = 4
    val rows = (Seq.fill(60)("a") ++ Seq.fill(40)("b") ++ Seq.fill(3)("zz"))
      .toDF("arm")
    val got = Stats.chiSquareGof(rows, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .collect().head
    got.getLong(0) shouldBe 100L
    got.getLong(1) shouldBe 3L // undeclared category counted separately
    got.getLong(2) shouldBe 1L
    got.getDouble(3) shouldBe 4.0
  }

  test("chiSquareGof is zero on a perfect match and null on empty input") {
    val rows = (Seq.fill(30)("a") ++ Seq.fill(10)("b")).toDF("arm")
    Stats.chiSquareGof(rows, "arm", Map("a" -> 0.75, "b" -> 0.25))
      .collect().head.getDouble(3) shouldBe 0.0
    val empty = Seq.empty[String].toDF("arm")
    Stats.chiSquareGof(empty, "arm", Map("a" -> 0.5, "b" -> 0.5))
      .collect().head.isNullAt(3) shouldBe true
  }

  // -------------------------------------------------------- shard balance

  test("shardBalance reports exact extremes and the doubled-median skew") {
    // shards sized 2,4,6,100: median2 = 4+6, skew = 2*100e6/10 = 20e6
    val rows = (Seq.fill(2)(0) ++ Seq.fill(4)(1) ++ Seq.fill(6)(2) ++
      Seq.fill(100)(3)).toDF("shard")
    val got = Sampling.shardBalance(rows, "shard").collect().head
    got.getLong(0) shouldBe 4L
    got.getLong(1) shouldBe 112L
    got.getLong(2) shouldBe 2L
    got.getLong(3) shouldBe 100L
    got.getLong(4) shouldBe 20000000L
  }

  test("shardBalance is 1e6 ppm on a perfectly balanced manifest") {
    val rows = (0 until 40).map(i => i % 4).toDF("shard")
    Sampling.shardBalance(rows, "shard")
      .collect().head.getLong(4) shouldBe 1000000L
  }

  // ------------------------------------------------------------------ mmr

  test("mmrSelect greedily trades relevance against similarity to the selected set") {
    // a: top rel; b: near-dup of a (must be deferred); c: orthogonal
    val rows = Seq(
      (1L, 10L, 0.90, Seq(1.0, 0.0)),
      (1L, 11L, 0.85, Seq(1.0, 0.01)),
      (1L, 12L, 0.50, Seq(0.0, 1.0)),
      (1L, 13L, 0.40, Seq(0.6, 0.8))).toDF("q", "id", "rel", "vec")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Similarity.mmrSelect(rows, "q", "id", "rel", "vec",
      k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val cosBA = 1.0 / math.sqrt(1.0 + 0.01 * 0.01)
    got shouldBe Array(
      (1L, 10L, 0.9),                         // seed: pure relevance
      (2L, 12L, r6(0.5 * 0.5 - 0.5 * 0.0)),   // orthogonal c beats near-dup b
      (3L, 11L, r6(0.5 * 0.85 - 0.5 * cosBA)))
  }

  test("mmrSelect breaks score ties to the smaller id and excludes short queries") {
    val rows = Seq(
      (1L, 21L, 0.7, Seq(1.0, 0.0)),
      (1L, 20L, 0.7, Seq(0.0, 1.0)),
      (2L, 30L, 0.9, Seq(1.0, 0.0))).toDF("q", "id", "rel", "vec")
    val got = Similarity.mmrSelect(rows, "q", "id", "rel", "vec",
      k = 2, lambda = 1.0).collect()
    got.map(_.getLong(0)).distinct shouldBe Array(1L) // query 2 too short
    // λ=1: pure relevance both steps; tie at 0.7 -> id 20 first
    got.map(_.getLong(2)) shouldBe Array(20L, 21L)
  }

  // ------------------------------------------------------------- pass@k

  test("passAtK matches the exact combinatorial estimator") {
    // task A: n=5, c=2 -> pass@3 = 1 - C(3,3)/C(5,3) = 0.9
    // task B: n=5, c=4 -> n-c < k -> exactly 1.0
    // task C: n=2 < k -> excluded
    val rows =
      Seq(("A", true), ("A", true), ("A", false), ("A", false), ("A", false),
        ("B", true), ("B", true), ("B", true), ("B", true), ("B", false),
        ("C", true), ("C", false)).toDF("task", "ok")
    val got = EvalMetrics.passAtK(rows, "task", col("ok"), k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    got.keySet shouldBe Set("A", "B")
    got("A") shouldBe ((5L, 2L, 0.9))
    got("B") shouldBe ((5L, 4L, 1.0))
  }

  test("passAtK at k=1 equals the plain success rate") {
    val rows = Seq(("A", true), ("A", false), ("A", false), ("A", false))
      .toDF("task", "ok")
    EvalMetrics.passAtK(rows, "task", col("ok"), k = 1)
      .collect().head.getDouble(3) shouldBe 0.25
  }

  // --------------------------------------------------- mixture reweight

  test("mixtureReweight applies the exponentiated-gradient update") {
    // two equal-size domains, mean losses 10 vs 20, eta = 0.1:
    // w' = (e^1, e^2) / (e^1 + e^2) -> (1/(1+e), e/(1+e))
    val rows = Seq(("d1", 10L), ("d1", 10L), ("d2", 20L), ("d2", 20L))
      .toDF("domain", "l")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Sampling.mixtureReweight(rows, "domain", col("l"), eta = 0.1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    got("d1") shouldBe ((2L, 10.0, 0.5, r6(1.0 / (1.0 + math.exp(1.0)))))
    got("d2") shouldBe ((2L, 20.0, 0.5, r6(math.exp(1.0) / (1.0 + math.exp(1.0)))))
  }

  test("mixtureReweight is the identity on equal losses and sums to 1") {
    val rows = Seq(("a", 5L), ("b", 5L), ("b", 5L)).toDF("domain", "l")
    val got = Sampling.mixtureReweight(rows, "domain", col("l"), eta = 0.5)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    got("a")._1 shouldBe got("a")._2 // equal losses: w_new = w_old
    got("b")._1 shouldBe got("b")._2
    (got("a")._2 + got("b")._2) shouldBe 1.0 +- 1e-6
  }

  // ---------------------------------------------------- stability histogram

  /** Independent JVM re-derivation of the seeded Laplace noise. */
  private def lap(key: String, scale: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(13)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = (h + 0.5) / 4503599627370496.0
    -scale * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
  }

  test("stableHistogram releases only above-threshold categories with the seeded noise") {
    val rows = (1 to 30).map(i => (i.toLong, "big")) ++ Seq((1L, "rare"))
    val df = rows.toDF("u", "c")
    val expBig = BigDecimal(30.0 + lap("big\u00017", 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expRare = BigDecimal(1.0 + lap("rare\u00017", 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Privacy.stableHistogram(df, "u", "c",
      maxCatsPerUnit = 4, epsilon = 1.0, tau = 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // release schema carries no exact count column
    Privacy.stableHistogram(df, "u", "c", 4, 1.0, 10.0)
      .columns.toSeq shouldBe Seq("c", "noisy_count")
    expBig should be >= 10.0 // fixture sanity: big clears the threshold
    got("big") shouldBe expBig
    if (expRare >= 10.0) got.contains("rare") shouldBe true
    else got.contains("rare") shouldBe false
  }

  // --------------------------------------------------- query likelihood

  test("queryLikelihood matches the hand-computed Dirichlet scores and ranks") {
    val docs = Seq(
      (1L, "spark spark window"),
      (2L, "window other other other"),
      (3L, "nothing here")).toDF("doc_id", "text")
    val got = TextAnalysis.queryLikelihood(docs, "doc_id", "text",
      Seq("spark", "window"), mu = 2.0, topN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // total_dl = 9, ctf(spark) = ctf(window) = 2, p = 2/9
    val s1 = math.log(1 + 2 / (2.0 * (2.0 / 9))) +
      math.log(1 + 1 / (2.0 * (2.0 / 9))) + 2 * math.log(2.0 / (3 + 2))
    val s2 = math.log(1 + 1 / (2.0 * (2.0 / 9))) + 2 * math.log(2.0 / (4 + 2))
    val s3 = 2 * math.log(2.0 / (2 + 2))
    got shouldBe Array((1L, 2L, r6(s1)), (2L, 1L, r6(s2)), (3L, 0L, r6(s3)))
  }

  // ----------------------------------------------------------------- rbo

  private def rankDf(ids: Seq[String]) =
    ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF("id", "rank")

  test("rbo (min form, eq. 11 incl. tail) on identical and disjoint lists") {
    val a = rankDf(Seq("x", "y", "z"))
    val got = Retrieval.rbo(a, a, "id", "rank", p = 0.5, k = 3).collect().head
    got.getLong(0) shouldBe 3L
    got.getLong(1) shouldBe 3L
    // (1-p)/p * [ sum p^d (=0.875) + 3*(-ln(0.5) - sum p^d/d) ] — the
    // tail assumes agreement persists at X_k=3 beyond depth 3
    got.getDouble(2) shouldBe 0.954442
    val d = Retrieval.rbo(a, rankDf(Seq("q", "r", "s")), "id", "rank", 0.5, 3)
      .collect().head
    d.getLong(1) shouldBe 0L
    d.getDouble(2) shouldBe 0.0 // X_k = 0: no overlap, no tail either
  }

  test("rbo weights top-rank disagreement: swapped top-2 at p=0.5") {
    // X_1 = 0, X_2 = 2 -> depth term (1-p)/p * p^2 * 2/2 = 0.25, plus
    // the X_k=2 tail: 2*(-ln(0.5) - (0.5 + 0.125)) = 0.136294
    val got = Retrieval.rbo(rankDf(Seq("x", "y")), rankDf(Seq("y", "x")),
      "id", "rank", p = 0.5, k = 2).collect().head
    got.getLong(1) shouldBe 2L
    got.getDouble(2) shouldBe 0.386294
  }

  // ---------------------------------------------------------------- dunn

  test("dunnPosthoc matches the hand-computed untied 2-group z") {
    // A = [1,2], B = [3,4]: midranks 1..4, Rbar 1.5 vs 3.5,
    // sigma^2 = 4*5/12, z = -2 / sqrt(5/3)
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L)).toDF("g", "x")
    val got = Stats.dunnPosthoc(rows, "g", col("x")).collect().head
    got.getString(0) shouldBe "A"
    got.getString(1) shouldBe "B"
    got.getLong(2) shouldBe 2L
    got.getLong(3) shouldBe 2L
    got.getDouble(4) shouldBe -1.549193
  }

  test("dunnPosthoc emits every pair of a 3-group design once, g1 < g2") {
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 3L), ("B", 4L),
      ("C", 5L), ("C", 6L)).toDF("g", "x")
    val got = Stats.dunnPosthoc(rows, "g", col("x"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(("A", "B"), ("A", "C"), ("B", "C"))
  }

  test("stableHistogram bounds each unit to maxCatsPerUnit md5-ordered categories") {
    // one unit voting for 6 categories, cap 4: exactly the 4 lowest by
    // md5(u \x01 cat \x01 seed) survive; with tau below any noise floor
    // every surviving category is released with n=1
    val cats = Seq("c1", "c2", "c3", "c4", "c5", "c6")
    val df = cats.map(c => (9L, c)).toDF("u", "c")
    def capKey(c: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"9\u0001$c\u00017".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val expected = cats.sortBy(c => (capKey(c), c)).take(4).toSet
    val got = Privacy.stableHistogram(df, "u", "c",
      maxCatsPerUnit = 4, epsilon = 1.0, tau = -100.0)
      .collect().map(_.getString(0)).toSet
    got shouldBe expected
  }
}
