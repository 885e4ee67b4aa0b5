package graft.ops

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (Some(1L), Some("en"), Some(10)),
    (Some(2L), Some("de"), Some(600)),
    (Some(3L), None, Some(25)),
    (Some(3L), Some("xx"), None)).toDF("id", "lang", "n")

  test("audit computes one row per check with exact metrics") {
    val got = Quality.audit(rows, Seq(
      Quality.Completeness("id"),
      Quality.Completeness("lang", 0.7),
      Quality.Uniqueness("id"),
      Quality.Bounds("n", 0, 500),
      Quality.AcceptedValues("lang", Seq("en", "de"), 0.5)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    got(("completeness", "id"))      shouldBe ((1.0, true))
    got(("completeness", "lang"))    shouldBe ((0.75, true))      // 3 of 4
    got(("uniqueness", "id"))        shouldBe ((0.75, false))     // 3 distinct / 4
    got(("bounds", "n"))             shouldBe ((0.666667, false)) // 600 out of [0,500], null excluded
    got(("accepted_values", "lang")) shouldBe ((0.666667, true))  // xx rejected, null excluded
  }

  test("all checks fold into a single aggregation pass (one scan)") {
    val plan = Quality.audit(rows, Seq(
      Quality.Completeness("id"), Quality.Uniqueness("id"),
      Quality.Bounds("n", 0, 500), Quality.AcceptedValues("lang", Seq("en"))))
      .queryExecution.executedPlan.toString
    plan.split("LocalTableScan").length - 1 should be <= 1
  }

  test("rollup emits every grain once, grouping flags disambiguate real nulls") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", Some("g1"), 1L), ("a", None, 2L), ("b", Some("g1"), 4L))
      .toDF("d", "g", "v")
    val out = df.rollup("d", "g")
      .agg(sum("v").as("s"),
        grouping(col("d")).cast("long").as("gd"),
        grouping(col("g")).cast("long").as("gg"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)), r.getLong(3), r.getLong(4)) -> r.getLong(2))
      .toMap
    out((null, None, 1L, 1L)) shouldBe 7L          // grand total
    out(("a", None, 0L, 1L))  shouldBe 3L          // subtotal for d=a
    out(("a", None, 0L, 0L))  shouldBe 2L          // REAL null genre group
    out(("a", Some("g1"), 0L, 0L)) shouldBe 1L
  }

  test("explicit-values pivot skips the eager distinct discovery pass") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, "x"), (1, "y"), (2, "x")).toDF("k", "t")
    val out = df.groupBy("k").pivot("t", Seq("x", "y", "z")).agg(count(lit(1)))
      .collect().map(r => r.getInt(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    out(1) shouldBe ((1L, 1L, null)) // absent combos are null until coalesced
    out(2) shouldBe ((1L, null, null))
    // implicit pivot COLLECTS the value set at construction time (a full
    // job over the child); explicit values never evaluate the child —
    // observable with a pivot column that errors on evaluation
    // (string-typed so pivot's analysis accepts it; errors only if evaluated)
    val poisoned = Seq(1).toDF("k")
      .select(col("k"), expr("if(assert_true(k > 100) is null, 'x', 'y')").as("t"))
    noException should be thrownBy
      poisoned.groupBy("k").pivot("t", Seq("x")).agg(count(lit(1)))
    an[Exception] should be thrownBy
      poisoned.groupBy("k").pivot("t").agg(count(lit(1)))
  }
}
