package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def estimates(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    Sketch.kmvDistinct(df, "g", "v", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact below k: sketch not full means the count IS the answer") {
    val df = (1 to 10).flatMap(i => Seq(("a", i), ("a", i))) // dups too
      .toDF("g", "v")
    estimates(df, k = 64) shouldBe Map("a" -> 10L)
  }

  test("duplicate-insensitive: multiplicity never moves the estimate") {
    val base = (1 to 5000).map(i => ("a", i)).toDF("g", "v")
    val dup = base.unionAll(base).unionAll(base)
    estimates(base, k = 64) shouldBe estimates(dup, k = 64)
  }

  test("estimate lands near truth at k=256 on 5000 distincts") {
    val df = (1 to 5000).map(i => ("a", i)).toDF("g", "v")
    val est = estimates(df, k = 256)("a")
    // expected relative error ~1/sqrt(k) ≈ 6%; assert a loose 20% box
    est.toDouble shouldBe 5000.0 +- 1000.0
  }

  test("merge path: partitioning never changes the result") {
    val df = (1 to 3000).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "v")
    estimates(df.repartition(1), k = 64) shouldBe
      estimates(df.repartition(16), k = 64)
  }

  test("null values are ignored, countDistinct-style") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(2)), ("b", None))
      .toDF("g", "v")
    // group b has only null values → no surviving rows, no output row
    estimates(df, k = 64) shouldBe Map("a" -> 2L)
  }

  test("KmvAgg.finish applies the (k-1)*2^52 div h_k estimator") {
    val agg = new Sketch.KmvAgg(4)
    val buf = Array(10L, 20L, 30L, 1L << 50)
    agg.finish(buf) shouldBe 3L * (1L << 52) / (1L << 50) // = 12
    agg.finish(Array(10L, 20L)) shouldBe 2L // not full → exact
  }

  test("kmvOverlap: exact below k — inclusion-exclusion recovers true counts") {
    val df = ((1 to 30).map(("a", _)) ++ (21 to 50).map(("b", _))).toDF("g", "v")
    val row = Sketch.kmvOverlap(df, "g", "v", k = 64).collect().head
    // |A|=30, |B|=30, |A∪B|=50, |A∩B|=10 — all sketches under-full → exact
    (row.getAs[Long]("est_a"), row.getAs[Long]("est_b"),
      row.getAs[Long]("est_union"), row.getAs[Long]("est_inter")) shouldBe
      ((30L, 30L, 50L, 10L))
  }

  test("kmvOverlap: union estimate from two sketches EQUALS the sketch of the union") {
    // the k smallest of A∪B are contained in sketch(A) ∪ sketch(B), so
    // merging the two k-arrays must reproduce the direct union sketch
    // bit-for-bit — not approximately
    val df = ((1 to 5000).map(("a", _)) ++ (2501 to 7500).map(("b", _))).toDF("g", "v")
    val est = Sketch.kmvOverlap(df, "g", "v", k = 64).collect().head.getAs[Long]("est_union")
    val direct = estimates(df.select(lit("u").as("g"), $"v"), k = 64)("u")
    est shouldBe direct
  }

  test("kmvOverlap: estimator path lands near truth") {
    val df = ((1 to 5000).map(("a", _)) ++ (2501 to 7500).map(("b", _))).toDF("g", "v")
    val row = Sketch.kmvOverlap(df, "g", "v", k = 256).collect().head
    row.getAs[Long]("est_union").toDouble shouldBe 7500.0 +- 1500.0
    // intersection inherits both ends' error — loose box, clamped at 0
    row.getAs[Long]("est_inter").toDouble shouldBe 2500.0 +- 1250.0
  }

  test("kmvOverlap: disjoint groups clamp intersection at 0, never negative") {
    val df = ((1 to 2000).map(("a", _)) ++ (10001 to 12000).map(("b", _))).toDF("g", "v")
    val row = Sketch.kmvOverlap(df, "g", "v", k = 64).collect().head
    row.getAs[Long]("est_inter") should be >= 0L
  }

  test("hashSampleQuantiles: k >= population means EXACT type-1 quantiles") {
    val df = (1 to 100).map(i => (i, i * 10)).toDF("id", "v")
    val got = Sketch.hashSampleQuantiles(df, "id", "v", Seq(0.25, 0.5, 1.0), k = 200)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // full population in the sample → rank ceil(p*100) of 10..1000
    got(0.25) shouldBe ((100L, 250))
    got(0.5) shouldBe ((100L, 500))
    got(1.0) shouldBe ((100L, 1000))
  }

  test("hashSampleQuantiles is partitioning-independent (same keys, same sample)") {
    val df = (1 to 5000).map(i => (i, (i * 37) % 1000)).toDF("id", "v")
    val a = Sketch.hashSampleQuantiles(df.repartition(1), "id", "v",
      Seq(0.1, 0.5, 0.9), k = 256).collect().map(r => (r.getDouble(0), r.getInt(2))).toSet
    val b = Sketch.hashSampleQuantiles(df.repartition(23), "id", "v",
      Seq(0.1, 0.5, 0.9), k = 256).collect().map(r => (r.getDouble(0), r.getInt(2))).toSet
    a shouldBe b
  }

  test("hashSampleQuantiles: sample estimates land near true quantiles") {
    // values uniform on [0, 10000) — with k=1024 the p-quantile rank
    // error is ~1/sqrt(k) ≈ 3%; assert a 10-point box on p50/p90
    val df = (1 to 20000).map(i => (i, (i * 7919) % 10000)).toDF("id", "v")
    val got = Sketch.hashSampleQuantiles(df, "id", "v", Seq(0.5, 0.9), k = 1024)
      .collect().map(r => r.getDouble(0) -> r.getInt(2)).toMap
    got(0.5).toDouble shouldBe 5000.0 +- 1000.0
    got(0.9).toDouble shouldBe 9000.0 +- 1000.0
  }

  test("countMinAudit: estimates never undercount; width 1 collapses to the total") {
    import spark.implicits._
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).map(Tuple1(_))
      .toDF("k")
    // width 1: every key shares the one cell in every row -> est = N
    val w1 = Sketch.countMinAudit(df, "k", depth = 3, width = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    w1("a") shouldBe ((3L, 6L))
    w1("b") shouldBe ((2L, 6L))
    w1("c") shouldBe ((1L, 6L))
    // wide sketch: 3 keys in 1024 buckets x 3 rows -> exact, overcount 0
    val wide = Sketch.countMinAudit(df, "k", depth = 3, width = 1024)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    wide("a") shouldBe ((3L, 3L, 0L))
    wide("b") shouldBe ((2L, 2L, 0L))
    wide("c") shouldBe ((1L, 1L, 0L))
  }

  test("countMinAudit is multiplicity-true under any partitioning") {
    import spark.implicits._
    val df = (1 to 200).map(i => s"k${i % 7}").map(Tuple1(_)).toDF("k")
    val ests = (1 to 3).map { n =>
      Sketch.countMinAudit(df.repartition(n), "k", depth = 3, width = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    ests.distinct.size shouldBe 1 // deterministic sketch, any layout
    ests.head.foreach { case (_, exact, est) => assert(est >= exact) }
  }

  test("hllDistinct: linear-counting regime tracks a small cardinality") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", s"v$i")).toDF("g", "k")
    val r = Sketch.hllDistinct(df, "g", "k").collect().head
    r.getLong(1) shouldBe 40L // exact leg
    // n << m=256 -> empty buckets exist -> linear counting branch
    math.abs(r.getDouble(3) - 40.0) / 40.0 should be < 0.15
  }

  test("hllDistinct: harmonic regime within ~3 sigma at load factor 20") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", s"item-$i")).toDF("g", "k")
    val r = Sketch.hllDistinct(df, "g", "k").collect().head
    // m=256 -> sigma ~ 1.04/sqrt(256) = 6.5%
    math.abs(r.getDouble(3) - 5000.0) / 5000.0 should be < 0.20
  }

  test("hll registers are mergeable: max-union of halves == whole") {
    import spark.implicits._
    val all = (1 to 1000).map(i => ("g", s"x$i")).toDF("g", "k")
    val whole = Sketch.hllRegisters(all, "g", "k")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val merged = Sketch.hllRegisters(all.filter($"k" < "x5"), "g", "k")
      .unionByName(Sketch.hllRegisters(all.filter($"k" >= "x5"), "g", "k"))
      .groupBy("grp", "bucket")
      .agg(org.apache.spark.sql.functions.max("r").as("r"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    merged shouldBe whole
  }

  test("hllDistinct is partitioning-invariant (sorted register fold)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"u${i % 700}")).toDF("g", "k")
    val runs = (1 to 3).map { n =>
      Sketch.hllDistinct(df.repartition(n), "g", "k")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).toSet
    }
    runs.distinct.size shouldBe 1
  }
}
