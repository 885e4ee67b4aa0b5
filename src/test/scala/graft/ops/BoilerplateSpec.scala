package graft.ops

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val banner = "accept cookies"
  private val nav = "home | about | contact"
  private def docs = Seq(
    (1L, s"$banner\nunique alpha\n$nav\nunique beta"),
    (2L, s"$banner\n$nav\nsecond doc body"),
    (3L, s"$banner\nthird doc body\n$nav"),
    (4L, s"$banner\n$nav"),                 // all lines are boilerplate
    (5L, null.asInstanceOf[String]),        // must pass through, not drop
    (6L, "solo document\nwith own lines")
  ).toDF("doc_id", "text")

  test("lineFrequencies counts distinct docs, not occurrences") {
    val dup = Seq((1L, "x\nx\ny"), (2L, "x")).toDF("doc_id", "text")
    val f = Boilerplate.lineFrequencies(dup, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    f("x") shouldBe 2L // appears twice in doc 1 but counts once
    f("y") shouldBe 1L
  }

  test("removeBoilerplate drops frequent lines, keeps order, never drops docs") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
    // banner+nav are in 4 docs each -> removed; unique lines survive in order
    out(1L) shouldBe (("unique alpha\nunique beta", 4L, 2L))
    out(2L) shouldBe (("second doc body", 3L, 2L))
    out(3L) shouldBe (("third doc body", 3L, 2L))
    out(4L) shouldBe (("", 2L, 2L)) // fully boilerplate -> empty, not dropped
    out(5L)._1 shouldBe null        // null text passes through
    out(6L) shouldBe (("solo document\nwith own lines", 2L, 0L))
  }

  test("salted join splits a mega-hot boilerplate line and matches unsalted") {
    import org.apache.spark.sql.functions._
    // one line in EVERY doc — the worst-case hot join key
    val hot = (1L to 400L).map(i =>
      (i, s"MEGA HOT BANNER\nbody line $i\nMEGA HOT BANNER")).toDF("doc_id", "text")
    val plain  = Boilerplate.removeBoilerplate(hot, "doc_id", "text", minDocs = 3)
    val salted = Boilerplate.removeBoilerplate(hot, "doc_id", "text", minDocs = 3,
      saltBuckets = 8)
    // bit-identical results
    val a = plain.orderBy("doc_id").collect().map(_.toSeq)
    val b = salted.orderBy("doc_id").collect().map(_.toSeq)
    a should contain theSameElementsInOrderAs b
    // the plan really joins on (_line, _salt): the hot line's probe rows
    // carry >1 distinct salt, so no single task owns the hot key
    val saltPlan = salted.queryExecution.optimizedPlan.toString
    saltPlan should include ("_salt")
    val nSalts = hot
      .select(posexplode(split(col("text"), "\n")).as(Seq("_pos", "_line")),
        col("doc_id").as("_id"))
      .filter(col("_line") === "MEGA HOT BANNER")
      .select(pmod(hash(col("_id"), col("_pos")), lit(8)).as("s"))
      .distinct().count()
    nSalts should be > 1L
  }

  test("custom delimiter splits literally, not as a regex") {
    val d = Seq((1L, "a. b. c"), (2L, "a. z"), (3L, "a. q")).toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(d, "doc_id", "text",
      delim = ". ", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "b. c" // "a" removed; "." did not act as wildcard
    out(2L) shouldBe "z"
  }
}
