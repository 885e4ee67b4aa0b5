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

  test("incremental col stats: merged batch states equal the direct single pass") {
    import org.apache.spark.sql.functions._
    // 9000 distinct values > k, so the KMV estimator path is exercised;
    // the merged union sketch must equal the full-data sketch EXACTLY
    // (the k global minima live inside their batch's k minima)
    val full = (1 to 9000).map(i => i * 7L).toDF("v")
    val batches = (0 until 3).map(b => full.filter(col("v") % 3 === b))
    val states = batches.map(Profile.colStatsState(_, "v", k = 64))
      .reduce(_ unionAll _)
    val viaMerge = Profile.finishColStats(
      Profile.mergeColStats(states, k = 64), k = 64).collect().head
    val direct = Profile.finishColStats(
      Profile.colStatsState(full, "v", k = 64), k = 64).collect().head
    viaMerge shouldBe direct
    viaMerge.getAs[Long]("n_rows") shouldBe 9000L
    viaMerge.getAs[Long]("min_value") shouldBe 7L
    viaMerge.getAs[Long]("max_value") shouldBe 63000L
  }

  test("incremental col stats: nulls count in n_rows, not n_nonnull or the sketch") {
    val df = Seq(Some(5L), None, Some(9L), None, Some(5L)).toDF("v")
    val r = Profile.finishColStats(
      Profile.colStatsState(df, "v", k = 64), k = 64).collect().head
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nonnull"),
      r.getAs[Long]("est_distinct"), r.getAs[Long]("min_value"),
      r.getAs[Long]("max_value")) shouldBe ((5L, 3L, 2L, 5L, 9L))
  }

  test("incremental col stats: merge order never matters") {
    val a = Profile.colStatsState((1 to 500).toDF("v"), "v", k = 16)
    val b = Profile.colStatsState((400 to 900).toDF("v"), "v", k = 16)
    val ab = Profile.finishColStats(
      Profile.mergeColStats(a.unionAll(b), k = 16), k = 16).collect().head
    val ba = Profile.finishColStats(
      Profile.mergeColStats(b.unionAll(a), k = 16), k = 16).collect().head
    ab shouldBe ba
  }
}
