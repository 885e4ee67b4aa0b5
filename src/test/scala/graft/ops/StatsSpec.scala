package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Stats.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head

  test("chiSquare matches the hand-computed 2x2 incl. a zero cell") {
    val rows =
      Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("A", "Y")) ++
        Seq.fill(20)(("B", "X")) // (B, Y) is a structural zero cell
    val got = run(rows)
    got.getLong(0) shouldBe 40L            // n
    got.getLong(1) shouldBe 2L             // n_rows_cat
    got.getLong(2) shouldBe 2L             // n_cols_cat
    got.getLong(3) shouldBe 1L             // dof
    // 25/15 + 25/5 + 25/15 + 25/5 = 40/3 (the zero cell contributes e=5)
    got.getDouble(4) shouldBe 13.333333
    got.getDouble(5) shouldBe 0.57735      // sqrt(chi2 / (n * 1))
  }

  test("chiSquare is exactly zero under perfect independence") {
    val rows =
      Seq.fill(6)(("A", "X")) ++ Seq.fill(2)(("A", "Y")) ++
        Seq.fill(3)(("B", "X")) ++ Seq.fill(1)(("B", "Y"))
    val got = run(rows)
    got.getDouble(4) shouldBe 0.0
    got.getDouble(5) shouldBe 0.0
  }

  test("chiSquare drops null categories before totals") {
    val rows = Seq(("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y"),
      (null, "X"), ("A", null))
    run(rows).getLong(0) shouldBe 4L
  }

  private def mi(rows: Seq[(String, String)]) =
    Stats.mutualInformation(rows.toDF("r", "c"), "r", "c").collect().head

  test("mutualInformation: 0 when independent, ln 2 when determined") {
    val indep = Seq.fill(2)(("A", "X")) ++ Seq.fill(2)(("A", "Y")) ++
      Seq.fill(2)(("B", "X")) ++ Seq.fill(2)(("B", "Y"))
    mi(indep).getDouble(2) shouldBe 0.0
    // column fully determines row: I = H = ln 2
    val det = Seq.fill(2)(("A", "X")) ++ Seq.fill(2)(("B", "Y"))
    val r = mi(det)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 2L  // only observed cells
    r.getDouble(2) shouldBe 0.693147
  }

  test("linearFit recovers an exact line; zero x-variance yields nulls") {
    import org.apache.spark.sql.functions.col
    val pts = Seq(("g", 1L, 3L), ("g", 2L, 5L), ("g", 3L, 7L),
      ("v", 2L, 1L), ("v", 2L, 5L)).toDF("grp", "x", "y")
    val got = Agg.linearFit(pts, "grp", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    got("g") shouldBe ((3L, Some(2.0), Some(1.0)))   // y = 2x + 1 exactly
    got("v") shouldBe ((2L, None, None))             // vertical — undefined
  }
}
