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
}
