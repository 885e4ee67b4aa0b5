package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (city, age band); two safe cohorts, one singleton, one null-QI
  private lazy val people = Seq(
    ("NYC", "20s", 1L), ("NYC", "20s", 2L), ("NYC", "20s", 3L),
    ("SFO", "30s", 4L), ("SFO", "30s", 5L), ("SFO", "30s", 4L),
    ("LAX", "40s", 6L), // singleton cohort: re-identifiable
    (null, "20s", 7L), (null, "20s", 8L) // null city is its own cohort
  ).toDF("city", "age_band", "person_id")

  test("kAnonymity: cohort counts, at_risk below k, null QI forms a cohort") {
    val got = Privacy.kAnonymity(people, Seq("city", "age_band"), k = 2L)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    got shouldBe Map(
      ("NYC", "20s") -> ((3L, false)),
      ("SFO", "30s") -> ((3L, false)),
      ("LAX", "40s") -> ((1L, true)),
      ("<null>", "20s") -> ((2L, false)))
  }

  test("noisyCounts: reproducible seeded noise, seed changes the draw, nonzero perturbation") {
    val a = Privacy.noisyCounts(people, Seq("city", "age_band"), epsilon = 0.5)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val b = Privacy.noisyCounts(people, Seq("city", "age_band"), epsilon = 0.5)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    a shouldBe b // bit-reproducible release
    a.size shouldBe 4
    // the draw is per-cohort noise, not the raw count
    a.values.count { case (n, noisy) => noisy != n.toDouble } should be >= 3
    // a different seed is a different release
    val c = Privacy.noisyCounts(people, Seq("city", "age_band"), epsilon = 0.5, seed = 8L)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) ->
        r.getDouble(3)).toMap
    a.count { case (k, (_, noisy)) => c(k) != noisy } should be >= 3
  }

  test("lDiversity: distinct sensitive values gate, nulls disclose nothing") {
    // SFO cohort has 3 rows but only 2 distinct persons -> fails l=3;
    // a null sensitive value must not count toward diversity
    val withNull = people.union(
      Seq(("NYC", "20s", None: Option[Long]))
        .toDF("city", "age_band", "person_id"))
    val got = Privacy.lDiversity(withNull, Seq("city", "age_band"), "person_id", l = 3L)
      .collect().map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    got(("NYC", "20s")) shouldBe ((4L, 3L, false)) // null row counted in n_rows only
    got(("SFO", "30s")) shouldBe ((3L, 2L, true)) // large cohort, homogeneous secret
    got(("LAX", "40s")) shouldBe ((1L, 1L, true))
  }

  test("tCloseness: integer-ppm ordered EMD per cohort, dense over missing values") {
    import spark.implicits._
    // global: v1 x4, v2 x6 (N=10, m=2); B never takes v1 (dense grid)
    val df = (Seq.fill(3)(("A", "v1")) ++ Seq.fill(1)(("A", "v2")) ++
      Seq.fill(4)(("B", "v2")) ++ Seq(("C", "v1"), ("C", "v2")))
      .toDF("qi", "v")
    val got = Privacy.tCloseness(df, Seq("qi"), "v", tPpm = 300000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // EMD_ppm = 1e6 * |c_cum*N - g_cum*n| / ((m-1)*n*N) at the v1 step
    got("A") shouldBe ((4L, 350000L, true))  // |3*10-4*4|=14 -> 14e6/40
    got("B") shouldBe ((4L, 400000L, true))  // |0*10-4*4|=16 -> 16e6/40
    got("C") shouldBe ((2L, 100000L, false)) // |1*10-4*2|=2  -> 2e6/20
  }

  test("tCloseness: single-value corpus is trivially close (no div-by-zero)") {
    import spark.implicits._
    val df = Seq(("A", "x"), ("A", "x"), ("B", "x")).toDF("qi", "v")
    val got = Privacy.tCloseness(df, Seq("qi"), "v", tPpm = 0L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    got("A") shouldBe ((0L, false))
    got("B") shouldBe ((0L, false))
  }
}
