package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent JVM re-derivation of the md5-parity arm split shared
    * by welchZ / diffInDiff (first 4 md5 bytes as hex, mod 2). */
  private def parity(u: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 2
  }

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

  test("populationStability: identical distributions score exactly 0") {
    val a = (1 to 100).map(_ % 10 * 1.0).toDF("v")
    Stats.populationStability(a, a, "v", lo = 0.0, hi = 10.0, buckets = 5)
      .collect().head.getDouble(3) shouldBe 0.0
  }

  test("populationStability: hand-computed two-bucket shift with smoothing") {
    // ref: 8 in bucket 0, 2 in bucket 1; cur: 2 and 8. Laplace (+1, +2):
    // q = (9/12, 3/12), p = (3/12, 9/12)
    val ref = (Seq.fill(8)(0.5) ++ Seq.fill(2)(1.5)).toDF("v")
    val cur = (Seq.fill(2)(0.5) ++ Seq.fill(8)(1.5)).toDF("v")
    val r = Stats.populationStability(ref, cur, "v", 0.0, 2.0, 2).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((10L, 10L, 2L))
    val p0 = 3.0 / 12; val q0 = 9.0 / 12
    val expect = (p0 - q0) * math.log(p0 / q0) +
      (q0 - p0) * math.log(q0 / p0) // symmetric buckets
    r.getDouble(3) shouldBe
      BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("populationStability: out-of-range values clamp to edge buckets; empty buckets stay finite") {
    val ref = Seq(-5.0, 0.5, 99.0).toDF("v") // -5 → bucket 0, 99 → last
    val cur = Seq(0.5).toDF("v")
    val r = Stats.populationStability(ref, cur, "v", 0.0, 10.0, 4).collect().head
    (r.getLong(0), r.getLong(1)) shouldBe ((3L, 1L))
    r.getDouble(3).isNaN shouldBe false
    r.getDouble(3).isInfinite shouldBe false
  }

  test("cohensKappa: hand-computed 2x2 agreement") {
    // raters on 10 items: agree yes×4, agree no×2, split 2 each way
    val df = (Seq.fill(4)(("yes", "yes")) ++ Seq.fill(2)(("no", "no")) ++
      Seq.fill(2)(("yes", "no")) ++ Seq.fill(2)(("no", "yes"))).toDF("r1", "r2")
    // po = 6/10; marginals: r1 yes 6 / no 4, r2 yes 6 / no 4
    // pe = 0.6*0.6 + 0.4*0.4 = 0.52; kappa = (0.6-0.52)/0.48 = 1/6
    val r = Stats.cohensKappa(df, "r1", "r2").collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)) shouldBe
      ((10L, 2L, 0.6, 0.52))
    r.getDouble(4) shouldBe 0.166667 // (0.6-0.52)/0.48 = 1/6, rounded to 6dp
  }

  test("cohensKappa: chance-level agreement is 0, perfect agreement is null-safe 1") {
    val perfect = Seq.fill(5)(("a", "a")).toDF("r1", "r2")
    // po = 1, pe = 1 (single category) → 0/0 guarded to null
    Option(Stats.cohensKappa(perfect, "r1", "r2").collect().head.get(4)) shouldBe None
    val mixed = (Seq.fill(3)(("a", "a")) ++ Seq.fill(2)(("a", "b")) ++
      Seq.fill(3)(("b", "a")) ++ Seq.fill(2)(("b", "b"))).toDF("r1", "r2")
    // po = 0.5; r1: a 5 / b 5; r2: a 6 / b 4 → pe = 0.5*0.6+0.5*0.4 = 0.5
    Stats.cohensKappa(mixed, "r1", "r2").collect().head.getDouble(4) shouldBe 0.0
  }

  test("cohensKappa: a category only one rater used still enters pe with 0 partner mass") {
    val df = Seq(("a", "a"), ("a", "c"), ("b", "b")).toDF("r1", "r2")
    val r = Stats.cohensKappa(df, "r1", "r2").collect().head
    r.getLong(1) shouldBe 3L // categories {a, b, c}
    // pe = (2/3)(1/3) + (1/3)(1/3) + 0·(1/3) = 3/9
    r.getDouble(3) shouldBe 0.333333
  }

  test("confusionStats: hand-computed per-class counts and integer ppm") {
    val df = Seq(
      ("cat", "cat"), ("cat", "cat"), ("cat", "dog"),
      ("dog", "cat"), ("dog", "dog"),
      ("bird", "dog")).toDF("label", "pred")
    val got = Stats.confusionStats(df, "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val cat = got("cat")
    // tp=2 fp=1 fn=1: precision 2/3, recall 2/3, f1 = 4/6
    (cat.getAs[Long]("tp"), cat.getAs[Long]("fp"), cat.getAs[Long]("fn")) shouldBe ((2L, 1L, 1L))
    cat.getAs[Long]("precision_ppm") shouldBe 666666L
    cat.getAs[Long]("recall_ppm") shouldBe 666666L
    cat.getAs[Long]("f1_ppm") shouldBe 666666L
    // bird: labeled once, never predicted → precision null, recall 0
    val bird = got("bird")
    Option(bird.get(bird.fieldIndex("precision_ppm"))) shouldBe None
    bird.getAs[Long]("recall_ppm") shouldBe 0L
    bird.getAs[Long]("f1_ppm") shouldBe 0L
  }

  test("confusionStats: a class only ever predicted gets null recall") {
    val df = Seq(("a", "ghost"), ("a", "a")).toDF("label", "pred")
    val got = Stats.confusionStats(df, "label", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("ghost")
    (g.getAs[Long]("n_labeled"), g.getAs[Long]("n_predicted")) shouldBe ((0L, 1L))
    Option(g.get(g.fieldIndex("recall_ppm"))) shouldBe None
    g.getAs[Long]("precision_ppm") shouldBe 0L
  }

  test("standardizeByGroup: hand-computed z; zero-variance and singleton groups yield null") {
    import org.apache.spark.sql.functions.col
    // group a: values 2, 4, 6 → mean 4, pop var 8/3; z(6) = 2/sqrt(8/3)
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("b", 4L, 5L), ("b", 5L, 5L),   // zero variance
      ("c", 6L, 9L))                  // singleton
      .toDF("g", "k", "v")
    val got = Agg.standardizeByGroup(df, "g", "k", col("v"))
      .collect().map(r => r.getLong(1) -> r).toMap
    // unrounded: the op emits the raw fixed-tree double (bit-exact)
    val z6 = (6.0 - 12.0 / 3.0) / math.sqrt((56.0 - 12.0 * 12.0 / 3.0) / 3.0)
    got(3L).getAs[Double]("z") shouldBe z6
    got(1L).getAs[Double]("group_mean") shouldBe 4.0
    Option(got(4L).get(got(4L).fieldIndex("z"))) shouldBe None
    Option(got(6L).get(got(6L).fieldIndex("z"))) shouldBe None
    // partition-order independence of the exact sums
    val again = Agg.standardizeByGroup(df.repartition(7), "g", "k", col("v"))
      .collect().map(r => (r.getLong(1), Option(r.get(r.fieldIndex("z"))))).toMap
    got.keySet.foreach { k =>
      again(k) shouldBe Option(got(k).get(got(k).fieldIndex("z")))
    }
  }

  test("calibrationBins: hand-binned counts, top-edge fold, null exclusion") {
    val d = Seq(
      (0.05, 0L), (0.08, 1L),           // bin 0: n=2, pos=1
      (0.95, 1L), (1.0, 1L), (0.99, 0L) // bin 9 (score 1.0 folds in): n=3, pos=2
    ).toDF("score", "y")
      .unionByName(Seq((null.asInstanceOf[java.lang.Double], java.lang.Long.valueOf(1L)))
        .toDF("score", "y"))
    val out = Stats.calibrationBins(d, "score", "y", bins = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out.keySet shouldBe Set(0L, 9L)
    out(0L) shouldBe ((2L, 1L, 500000L))
    out(9L) shouldBe ((3L, 2L, 666666L))
  }

  test("aucExact: midrank ties, integer ppm; perfect separation reads 1e6") {
    import spark.implicits._
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("score", "label")
    Stats.aucExact(perfect, "score", "label").collect().head
      .getAs[Long]("auc_ppm") shouldBe 1000000L
    // tie at 0.5 contributes half a win: AUC = (3 + 0.5)/4 = 0.875
    val tied = Seq((0.9, 1L), (0.5, 1L), (0.5, 0L), (0.1, 0L))
      .toDF("score", "label")
    val r = Stats.aucExact(tied, "score", "label").collect().head
    (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("auc_ppm")) shouldBe ((2L, 2L, 875000L))
    // label inversion mirrors around 1/2
    val inv = Stats.aucExact(tied.withColumn("label",
      org.apache.spark.sql.functions.expr("1 - label")), "score", "label")
      .collect().head
    inv.getAs[Long]("auc_ppm") shouldBe 125000L
  }

  test("krippendorffAlpha: coincidence algebra on a complete 2-rater design") {
    import spark.implicits._
    // units: (a,a) (a,b) (b,b) (b,b) -> Do_s=2, n=8, marginals a=3 b=5
    // alpha = 1 - 14/30; ppm = 1e6 - floor(14e6/30) = 533334
    val ratings = Seq(
      (1L, "r1", "a"), (1L, "r2", "a"),
      (2L, "r1", "a"), (2L, "r2", "b"),
      (3L, "r1", "b"), (3L, "r2", "b"),
      (4L, "r1", "b"), (4L, "r2", "b"),
      (5L, "r1", "a") // incomplete unit: dropped, counted
    ).toDF("unit", "rater", "value")
    val r = Stats.krippendorffAlpha(ratings, "unit", "rater", "value",
      ratersPerUnit = 2).collect().head
    r.getAs[Long]("n_units") shouldBe 4L
    r.getAs[Long]("n_dropped_units") shouldBe 1L
    r.getAs[Long]("n_ratings") shouldBe 8L
    r.getAs[Long]("alpha_ppm") shouldBe 533334L
  }

  test("krippendorffAlpha: perfect agreement reads 1e6") {
    import spark.implicits._
    val ratings = Seq(
      (1L, "r1", "x"), (1L, "r2", "x"),
      (2L, "r1", "y"), (2L, "r2", "y")
    ).toDF("unit", "rater", "value")
    Stats.krippendorffAlpha(ratings, "unit", "rater", "value", 2)
      .collect().head.getAs[Long]("alpha_ppm") shouldBe 1000000L
  }

  test("selectionImpact: four-fifths rule on cross-multiplied exact ratios") {
    import spark.implicits._
    val v = ((1 to 10).map(i => ("en", i <= 8)) ++
      (1 to 4).map(i => ("fr", i <= 1))).toDF("lang", "keep")
    val got = Stats.selectionImpact(v, "lang", "keep")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    got("en") shouldBe ((10L, 8L, 800000L, 1244444L, false))
    got("fr") shouldBe ((4L, 1L, 250000L, 388888L, true))
  }

  test("welchZ matches an independent JVM computation of the md5 split") {
    import spark.implicits._
    // per-unit metric = sum of integral values; 40 units, 3 rows each
    val rows = (0 until 40).flatMap { u =>
      (0 until 3).map(i => (u.toLong, (u * 13 + i * 7) % 101))
    }
    val df = rows.toDF("unit", "v")
    val got = Stats.welchZ(df, "unit", col("v")).collect().head
    // independent reference: same md5-parity assignment, plain doubles
    def arm(p: Long) = rows.groupBy(_._1).view
      .mapValues(_.map(_._2.toLong).sum).toMap
      .filter { case (u, _) =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(u.toString.getBytes("UTF-8"))
        val hex = d.take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % 2 == p
      }.values.map(_.toDouble).toSeq
    val (a, b) = (arm(0), arm(1))
    def stats(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (nc, mc, vc) = stats(a); val (nt, mt, vt) = stats(b)
    got.getLong(0) shouldBe nc.toLong
    got.getLong(1) shouldBe nt.toLong
    got.getDouble(2) shouldBe mc +- 1e-9
    got.getDouble(3) shouldBe mt +- 1e-9
    got.getDouble(4) shouldBe vc +- 1e-6
    got.getDouble(5) shouldBe vt +- 1e-6
    got.getDouble(6) shouldBe
      ((mt - mc) / math.sqrt(vt / nt + vc / nc)) +- 1e-9
  }

  test("diffInDiff nets out the shared trend: planted effect recovered") {
    import spark.implicits._
    val ctl = (0L until 64L).filter(parity(_) == 0).take(3)
    val trt = (0L until 64L).filter(parity(_) == 1).take(3)
    val pre = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-15 12:00:00")
    // control: 10 -> 20 (shared trend +10); treated: 30 -> 55 (+10
    // trend +15 effect); constant within cell so means are exact
    val rows =
      ctl.flatMap(u => Seq((u, pre, 10), (u, post, 20))) ++
      trt.flatMap(u => Seq((u, pre, 30), (u, post, 55)))
    val got = Stats.diffInDiff(rows.toDF("user_id", "ts", "v"),
      "user_id", "ts", col("v"), "2024-01-10 00:00:00").collect().head
    got.getLong(0) shouldBe 3L; got.getLong(3) shouldBe 3L
    got.getDouble(4) shouldBe 10.0; got.getDouble(5) shouldBe 20.0
    got.getDouble(6) shouldBe 30.0; got.getDouble(7) shouldBe 55.0
    got.getDouble(8) shouldBe 15.0
  }

  test("diffInDiff: an empty cell NULL-propagates into did") {
    import spark.implicits._
    val u0 = (0L until 64L).find(parity(_) == 0).get
    val pre = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val got = Stats.diffInDiff(Seq((u0, pre, 5)).toDF("user_id", "ts", "v"),
      "user_id", "ts", col("v"), "2024-01-10 00:00:00").collect().head
    got.getLong(0) shouldBe 1L
    got.getLong(3) shouldBe 0L
    got.isNullAt(8) shouldBe true
  }

  test("welchZ masks z to NULL when an arm has fewer than 2 units") {
    import spark.implicits._
    // deterministically pick 2 control units and 1 treatment unit
    val ids = (0L until 64L)
    val cs = ids.filter(parity(_) == 0).take(2)
    val ts = ids.filter(parity(_) == 1).take(1)
    val df = (cs ++ ts).map(u => (u, 10)).toDF("unit", "v")
    val row = Stats.welchZ(df, "unit", col("v")).collect().head
    row.getLong(0) shouldBe 2L
    row.getLong(1) shouldBe 1L
    row.isNullAt(5) shouldBe true // treat variance undefined
    row.isNullAt(6) shouldBe true // z masked
  }

  test("cuped: exact linear pre/post relation gives rho2 1 and theta recovered") {
    import spark.implicits._
    // y = 3x exactly per unit: theta = 3, var_reduction = 1, and the
    // adjusted means collapse the covariate spread entirely
    val pre = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-20 12:00:00")
    val rows = (0L until 40L).flatMap { u =>
      val x = (u % 7 + 1).toInt
      Seq((u, pre, x), (u, post, 3 * x))
    }
    val got = Stats.cuped(rows.toDF("user_id", "ts", "v"),
      "user_id", "ts", col("v"), "2024-01-16 00:00:00").collect().head
    got.getDouble(2) shouldBe 3.0 +- 1e-12          // theta
    got.getDouble(6) shouldBe 1.0 +- 1e-12          // var_reduction
    // adjusted arm means both equal the pooled post mean under y = 3x
    got.getDouble(3) shouldBe got.getDouble(4) +- 1e-9
  }

  test("cuped: all-tied covariate masks theta-dependent outputs to NULL") {
    import spark.implicits._
    val post = java.sql.Timestamp.valueOf("2024-01-20 12:00:00")
    val rows = (0L until 10L).map(u => (u, post, (u % 3 + 1).toInt))
    val got = Stats.cuped(rows.toDF("user_id", "ts", "v"),
      "user_id", "ts", col("v"), "2024-01-16 00:00:00").collect().head
    got.isNullAt(2) shouldBe true  // theta: every x = 0 (no pre period)
    got.isNullAt(5) shouldBe true  // adj_lift propagates
    got.isNullAt(6) shouldBe true
  }

  test("experimentHealth matches a hand-computed MDE and flags a forced SRM") {
    import spark.implicits._
    // split 0..63 by the md5 parity, verify mde against the JVM formula
    val rows = (0L until 64L).map(u => (u, ((u * 13) % 29 + 1).toInt))
    val df = rows.toDF("user_id", "v")
    val got = Stats.experimentHealth(df, "user_id", col("v")).collect().head
    val byArm = rows.groupBy { case (u, _) => parity(u) }
    val stats = byArm.map { case (v, xs) =>
      val n = xs.size; val s = xs.map(_._2.toLong).sum
      val s2 = xs.map(t => t._2.toLong * t._2).sum
      v -> ((n, (s2.toDouble - s.toDouble * s / n) / (n - 1)))
    }
    val (nc, vc) = stats(0L); val (nt, vt) = stats(1L)
    got.getLong(0) shouldBe nc.toLong
    got.getLong(1) shouldBe nt.toLong
    val mde = (1.9599639845400545 + 0.8416212335729143) *
      math.sqrt(vc / nc + vt / nt)
    got.getDouble(2) shouldBe mde +- 1e-12
    math.abs(got.getDouble(3)) should be < 3.0
    got.getBoolean(4) shouldBe false
  }

  test("benfordDigits: counts exact, shares sum to 1, nonpositive dropped") {
    import spark.implicits._
    val vals = Seq(123L, 1999L, 2L, 25L, 34L, 91L, 9L, 0L, -5L, 111L)
    val got = Stats.benfordDigits(vals.toDF("m"), col("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got shouldBe Map(1 -> 3L, 2 -> 2L, 3 -> 1L, 9 -> 2L)
    val shares = Stats.benfordDigits(vals.toDF("m"), col("m"))
      .collect().map(_.getDouble(2)).sum
    shares shouldBe 1.0 +- 1e-12
  }

  test("giniIndex: equal counts give 0-ish, full concentration near 1") {
    import spark.implicits._
    // group a: 4 units x 5 events each -> G = 0 exactly by the identity
    val equal = (0 until 4).flatMap(u => Seq.fill(5)(("a", u.toLong)))
    // group b: 9 units with 1 event, 1 unit with 91 -> heavy concentration
    val conc = (0 until 9).map(u => ("b", u.toLong)) ++
      Seq.fill(91)(("b", 9L))
    val df = (equal ++ conc).toDF("g", "u")
    val got = Stats.giniIndex(df, "g", "u", lit(1L))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got("a") shouldBe 0.0 +- 1e-12
    // hand: n=10, sx=100, six = 1*1+..+9*1 + 10*91 = 45 + 910 = 955
    // G = (2*955 - 11*100) / (10*100) = 810/1000
    got("b") shouldBe 0.81 +- 1e-12
  }

  test("spearman: monotone nonlinear is exactly 1; reversed is -1; ties handled") {
    import spark.implicits._
    // y = x^3 is monotone -> rho 1 regardless of nonlinearity
    val mono = (1 to 20).map(i => ("m", i.toLong, (i.toLong * i * i)))
    val rev = (1 to 20).map(i => ("r", i.toLong, (21 - i).toLong))
    // ties: x has duplicates, y strictly increasing; doubled avg ranks stay exact
    val tied = Seq(("t", 1L, 1L), ("t", 1L, 2L), ("t", 2L, 3L), ("t", 2L, 4L))
    val df = (mono ++ rev ++ tied).toDF("g", "x", "y")
    val got = Stats.spearman(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got("m") shouldBe 1.0
    got("r") shouldBe -1.0
    got("t") shouldBe 0.894427 +- 1e-6 // hand: u=(3,3,7,7), v=(2,4,6,8)
  }

  test("spearman: all-tied side masks to NULL (discrete guard)") {
    import spark.implicits._
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L)).toDF("g", "x", "y")
    Stats.spearman(df, "g", col("x"), col("y")).collect().head.isNullAt(2) shouldBe true
  }

  test("conformalInterval: exact fit recovery and full coverage on noiseless data") {
    import spark.implicits._
    // y = 7x exactly: slope 7, intercept 0, all residuals 0 -> q90 = 0,
    // coverage 100% (0 <= 0)
    val rows = (1 to 4000).map(i => (i.toString, (i % 97 + 1).toLong, 7L * (i % 97 + 1)))
    val df = rows.toDF("id", "x", "y")
    val got = Stats.conformalInterval(df, col("id"), col("x"), col("y"))
      .collect().head
    (got.getLong(0) + got.getLong(1) + got.getLong(2)) shouldBe 4000L
    got.getDouble(3) shouldBe 7.0 +- 1e-12
    got.getDouble(4) shouldBe 0.0 +- 1e-9
    got.getDouble(5) shouldBe 0.0 +- 1e-9
    got.getLong(6) shouldBe 1000000L
  }

  test("conformalInterval: calibration quantile is the ceil((n+1)*0.9) order stat") {
    import spark.implicits._
    // noise on a known line; verify q90 equals the JVM-computed order stat
    val rows = (1 to 5000).map { i =>
      val x = (i % 50 + 1).toLong
      val noise = (i * 37 % 11).toLong - 5 // deterministic, mean ~0
      (i.toString, x, 3L * x + noise)
    }
    val df = rows.toDF("id", "x", "y")
    val got = Stats.conformalInterval(df, col("id"), col("x"), col("y"))
      .collect().head
    val nCal = got.getLong(1)
    val k = (9 * (nCal + 1) + 9) / 10
    // recompute residuals for the cal split in the JVM
    def bucket(id: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val slope = got.getDouble(3); val intercept = got.getDouble(4)
    val calR = rows.filter(r => { val b = bucket(r._1); b >= 90 && b < 95 })
      .map(r => math.abs(r._3.toDouble - (intercept + slope * r._2.toDouble)))
      .sorted
    got.getDouble(5) shouldBe calR(k.toInt - 1)
    // coverage should be near 90% on exchangeable noise
    got.getLong(6).toDouble / 1e6 should (be >= 0.8 and be <= 1.0)
  }

  test("hillTailIndex matches the hand-computed fold over top-k order stats") {
    // values 1..15, k=10: top-11 = {5..15}, threshold x_(k+1) = 5,
    // lnSum folds ascending over {6..15}: sum ln(i/5)
    val df = (1 to 15).map(_.toLong).toDF("v")
    val got = Stats.hillTailIndex(df, col("v"), k = 10).collect().head
    got.getLong(0) shouldBe 10L
    got.getLong(1) shouldBe 5L
    val lnSum = (6 to 15).foldLeft(0.0)((a, i) => a + math.log(i / 5.0))
    got.getDouble(2) shouldBe BigDecimal(10.0 / lnSum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** General md5 hash bucket (first 4 bytes as unsigned int, mod m) —
    * the JVM re-derivation of Sampling.hashBucket. */
  private def bucket(u: Long, m: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % m
  }

  test("jackknifeRatio matches the JVM leave-one-out re-derivation") {
    val rows = (1L to 200L).map(u => (u, u % 7 + 1, u % 3 + 1))
    val df = rows.toDF("u", "y", "w")
    val got = Stats.jackknifeRatio(df, col("u"), col("y"), col("w"), b = 10)
      .collect().head
    // re-derive: bucket sums in bucket order, then the same folds
    val byB = rows.groupBy(r => bucket(r._1, 10)).toSeq.sortBy(_._1)
    val (sy, sw) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val reps = byB.map { case (_, rs) =>
      (sy - rs.map(_._2).sum).toDouble / (sw - rs.map(_._3).sum).toDouble
    }
    val tb = reps.foldLeft(0.0)(_ + _) / byB.size
    val ssq = reps.foldLeft(0.0)((a, t) => a + (t - tb) * (t - tb))
    got.getLong(0) shouldBe 200L
    got.getLong(1) shouldBe byB.size.toLong
    got.getDouble(2) shouldBe sy.toDouble / sw.toDouble
    got.getDouble(3) shouldBe math.sqrt((byB.size - 1).toDouble / byB.size * ssq)
  }

  test("ksTest matches the JVM exact-integer sup re-derivation") {
    val rows = (1L to 40L).map(u => (u, u % 5))
    val got = Stats.ksTest(rows.toDF("u", "m"), "u", col("m")).collect().head
    val byArm = rows.groupBy(r => bucket(r._1, 2))
    val (n0, n1) = (byArm(0L).size.toLong, byArm(1L).size.toLong)
    val values = rows.map(_._2).distinct.sorted
    var best = (BigInt(-1), -1L)
    var (c0, c1) = (0L, 0L)
    values.foreach { v =>
      c0 += byArm(0L).count(_._2 == v); c1 += byArm(1L).count(_._2 == v)
      val diff = (BigInt(c0) * n1 - BigInt(c1) * n0).abs
      if (diff >= best._1) best = (diff, v) // ties -> largest v
    }
    got.getLong(0) shouldBe n0
    got.getLong(1) shouldBe n1
    got.getDouble(2) shouldBe best._1.toDouble / (BigInt(n0) * n1).toDouble
    got.getLong(3) shouldBe best._2
  }

  test("wilsonCi matches the JVM fixed-tree re-derivation per arm") {
    // unit u succeeds iff u % 3 == 0; one event row per (u, flag)
    val rows = (1L to 60L).flatMap(u =>
      Seq((u, if (u % 3 == 0) "hit" else "miss"), (u, "miss")))
    val got = Stats.wilsonCi(rows.toDF("u", "e"), "u", col("e") === "hit")
      .collect().map(r => r.getInt(0) -> r).toMap
    val byArm = (1L to 60L).groupBy(u => bucket(u, 2).toInt)
    byArm.foreach { case (arm, us) =>
      val n = us.size.toDouble
      val k = us.count(_ % 3 == 0).toDouble
      val zz = 1.96 * 1.96
      val p = k / n
      val denom = 1.0 + zz / n
      val center = (p + zz / (2.0 * n)) / denom
      val half = (1.96 * math.sqrt(p * (1.0 - p) / n +
        zz / (4.0 * n * n))) / denom
      got(arm).getLong(1) shouldBe us.size.toLong
      got(arm).getDouble(3) shouldBe p
      got(arm).getDouble(4) shouldBe (center - half)
      got(arm).getDouble(5) shouldBe (center + half)
    }
  }

  test("decileShare assigns tie-consistent integer deciles and exact shares") {
    // distinct values 1..10: one unit per decile, top value -> decile 1
    val df = (1L to 10L).map(v => (v, v)).toDF("u", "m")
    val got = Stats.decileShare(df, "u", col("m"))
      .collect().map(r => r.getLong(0) -> r).toMap
    got(1).getLong(2) shouldBe 10L   // decile 1 holds the top value
    got(10).getLong(2) shouldBe 1L
    got(1).getLong(3) shouldBe (10L * 1000000L / 55L)
    got.keySet shouldBe (1L to 10L).toSet

    // all-tied values land in ONE decile (10), never split
    val tied = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("u", "m")
    val t = Stats.decileShare(tied, "u", col("m")).collect()
    t.length shouldBe 1
    t.head.getLong(0) shouldBe 10L
    t.head.getLong(1) shouldBe 4L
    t.head.getLong(3) shouldBe 1000000L
  }

  test("matchedUplift excludes one-armed strata and weights by treated size") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-31 00:00:00")
    // users 1..40: pre-activity level = 1 for u<=20 else 2 (both arms
    // present in each by hash luck with 40 users); post outcome = u%5
    val rows = (1L to 40L).flatMap { u =>
      val pre = if (u <= 20) Seq((u, t0, 0L)) else Seq((u, t0, 0L), (u, t0, 0L))
      pre ++ Seq((u, t1, u % 5))
    }
    val got = Stats.matchedUplift(rows.toDF("u", "t", "y"), "u", "t",
      col("y") * 100, preCap = 20).collect().head
    // JVM re-derivation with the same arm hash and midpoint semantics
    val units = (1L to 40L).map { u =>
      (if (u <= 20) 1L else 2L, bucket(u, 2), (u % 5) * 100)
    }
    val strata = units.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, us) =>
      val t = us.filter(_._2 == 1); val c = us.filter(_._2 == 0)
      (s, t.size.toLong, c.size.toLong, t.map(_._3).sum, c.map(_._3).sum)
    }.filter(x => x._2 > 0 && x._3 > 0)
    val ntm = strata.map(_._2).sum
    val att = strata.foldLeft(0.0) { case (a, (_, nt, nc, yt, yc)) =>
      a + (nt.toDouble / ntm) * (yt.toDouble / nt - yc.toDouble / nc)
    }
    got.getLong(0) shouldBe 40L
    got.getLong(1) shouldBe strata.size.toLong
    got.getLong(2) shouldBe strata.map(x => x._2 + x._3).sum * 1000000L / 40L
    got.getDouble(3) shouldBe att
  }

  test("hillTailIndex masks all-tied tops to NULL and drops non-positives") {
    // 12 copies of 7 plus junk below zero: top-11 all tied -> lnSum 0
    val df = (Seq.fill(12)(7L) ++ Seq(-3L, 0L)).toDF("v")
    val got = Stats.hillTailIndex(df, col("v"), k = 10).collect().head
    got.getLong(1) shouldBe 7L
    got.isNullAt(2) shouldBe true
  }

  test("aucExact masks single-class input to NULL instead of ANSI div0") {
    val allPos = Seq((0.1, 1L), (0.9, 1L), (0.5, 1L)).toDF("score", "label")
    val r = Stats.aucExact(allPos, "score", "label").collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 0L
    r.isNullAt(2) shouldBe true
    val allNeg = Seq((0.1, 0L), (0.9, 0L)).toDF("score", "label")
    Stats.aucExact(allNeg, "score", "label").collect().head
      .isNullAt(2) shouldBe true
  }

  test("krippendorffAlpha masks the zero-De degenerate (all ratings equal)") {
    // every rating the same value: De = 0 -> alpha undefined -> NULL
    val ratings = Seq(
      (1L, "r1", "x"), (1L, "r2", "x"),
      (2L, "r1", "x"), (2L, "r2", "x")
    ).toDF("unit", "rater", "value")
    val r = Stats.krippendorffAlpha(ratings, "unit", "rater", "value", 2)
      .collect().head
    r.getLong(0) shouldBe 2L
    r.isNullAt(3) shouldBe true
  }

  test("decileShare masks shares to NULL on an all-zero metric") {
    val df = Seq(("u1", 0L), ("u2", 0L), ("u3", 0L)).toDF("u", "m")
    val got = Stats.decileShare(df, "u", col("m")).collect()
    got.foreach { r =>
      r.getLong(2) shouldBe 0L
      r.isNullAt(3) shouldBe true
    }
  }

  test("conformalInterval clamps the calibration rank on tiny n_cal") {
    // ids chosen so the 100-bucket md5 split leaves < 9 calibration
    // rows: the ceil(0.9*(n+1)) rank would overflow n_cal and the old
    // code silently emitted an all-NULL row; the clamp keeps it total.
    val rows = (1L to 60L).map(i => (i, i, 3 * i + 1))
    val df = rows.toDF("id", "x", "y")
    val got = Stats.conformalInterval(df, col("id"), col("x"), col("y"))
      .collect().head
    val nCal = got.getLong(1)
    if (nCal > 0L) {
      got.getLong(2) should be > 0L       // n_test populated
      got.getDouble(5) should be >= 0.0   // q90 present (clamped rank)
    }
  }
}
