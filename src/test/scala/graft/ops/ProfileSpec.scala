package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some("en"), 10),
    (2L, Some("de"), 20),
    (3L, None, 20),
    (4L, Some("en"), 30)).toDF("id", "lang", "n")

  test("profile: one row per column with completeness, cardinality, range") {
    val got = Profile.profile(rows, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    got("id")   shouldBe ((4L, 4L, 4L, "1", "4"))
    got("lang") shouldBe ((4L, 3L, 2L, "de", "en")) // null neither counted nor ranged
    got("n")    shouldBe ((4L, 4L, 3L, "10", "30"))
  }

  test("profile is ONE aggregation pass: a single scan feeds every column's measures") {
    val plan = Profile.profile(rows, Seq("id", "lang", "n"))
      .queryExecution.executedPlan.toString
    // exact multi-column distinct plans via Expand over one scan — not
    // one scan per column
    plan.split("LocalTableScan").length - 1 should be <= 1
  }

  test("approxDistinct avoids the Expand duplication for the HLL path") {
    val exact = Profile.profile(rows, Seq("id", "lang", "n"))
      .queryExecution.executedPlan.toString
    val approx = Profile.profile(rows, Seq("id", "lang", "n"), approxDistinct = true)
      .queryExecution.executedPlan.toString
    exact should include("Expand")
    approx should not include "Expand"
    // sketch counts still land close on tiny input
    val got = Profile.profile(rows, Seq("id"), approxDistinct = true)
      .collect().head.getLong(3)
    got shouldBe 4L
  }
}
