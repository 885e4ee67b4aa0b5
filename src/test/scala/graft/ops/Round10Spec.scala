package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 operator pins: Theil–Sen slope, Kendall τ-b,
  * resource-allocation link prediction, chrF2, embedding anisotropy,
  * n-gram novelty, term burstiness, and Neyman-allocation sampling —
  * each against a hand-computed fixture.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("theilSen: median of pairwise integerized slopes") {
    // daily counts 1, 2, 4 -> slopes ppm: (2-1)/1=1e6, (4-1)/2=1.5e6,
    // (4-2)/1=2e6 -> median 1,500,000
    val rows = Seq.fill(1)(ts(1)) ++ Seq.fill(2)(ts(2)) ++ Seq.fill(4)(ts(3))
    val df = rows.map(("a", _)).toDF("series", "t")
    val got = TimeSeries.theilSen(df, "series", "t").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("slope_ppm") == 1500000L)
  }

  test("theilSen: even pair count takes the floor-average of the middles") {
    // daily counts 1, 2 on days 1, 3 for series b; plus series c with a
    // single day (no pairs -> dropped entirely, the mannKendall contract)
    val rows = Seq(("b", ts(1)), ("b", ts(3)), ("b", ts(3)), ("c", ts(1)))
    val got = TimeSeries.theilSen(rows.toDF("series", "t"), "series", "t")
      .collect()
    assert(got.map(_.getString(0)).toSet == Set("b"))
    // one pair: (2-1)*1e6/2 = 500000
    assert(got.head.getAs[Long]("slope_ppm") == 500000L)
  }

  test("kendallTau: tie-corrected concordance on a hand case") {
    // (x, y) = (1,2) (2,1) (3,3) (3,4): C=4, D=1, x-ties n1=1, y-ties 0
    // tau_b = 3 / sqrt(5 * 6)
    val df = Seq((1L, 2L), (2L, 1L), (3L, 3L), (3L, 4L))
      .toDF("x", "y").withColumn("g", lit("g"))
    val r = Stats.kendallTau(df, "g", col("x"), col("y")).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("c_minus_d") == 3L)
    assert(math.abs(r.getAs[Double]("tau_b") - 3.0 / math.sqrt(30.0)) < 1e-12)
  }

  test("kendallTau: constant column masks tau to NULL") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L))
      .toDF("x", "y").withColumn("g", lit("g"))
    val r = Stats.kendallTau(df, "g", col("x"), col("y")).collect().head
    assert(r.isNullAt(r.fieldIndex("tau_b")))
  }

  test("resourceAllocation: 1/deg sums over common neighbors, new links only") {
    // graph 1-2, 1-3, 2-4 (each pair co-occurs in 2 baskets)
    val df = Seq(
      ("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2),
      ("b3", 1), ("b3", 3), ("b4", 1), ("b4", 3),
      ("b5", 2), ("b5", 4), ("b6", 2), ("b6", 4)
    ).toDF("basket", "item")
    val got = Graph.resourceAllocation(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Long]("n_common"), r.getAs[Long]("ra_nano"))).toMap
    // deg(1)=2, deg(2)=2: (2,3) via node 1 -> 1e9 div 2; (1,4) via node 2
    assert(got == Map((2, 3) -> (1L, 500000000L), (1, 4) -> (1L, 500000000L)))
  }

  test("chrF: perfect match scores matched orders at 1, others 0") {
    // cand = "a b", ref = "ab": whitespace strips away -> identical "ab"
    // m1=2 -> F1=1; m2=1 -> F2=1; n=3..6 empty -> 0; chrf2 = 2/6
    val df = Seq((1L, "a b", "ab")).toDF("id", "cand", "ref")
    val r = EvalMetrics.chrF(df, "id", "cand", "ref").collect().head
    assert(r.getAs[Long]("len_cand") == 2L)
    assert(r.getAs[Long]("len_ref") == 2L)
    assert(math.abs(r.getAs[Double]("chrf2") - 2.0 / 6.0) < 1e-12)
  }

  test("chrF: recall-weighted beta favors the reference side") {
    // cand "ab", ref "abab": m1=2, t1=2, r1=4 -> P=1, R=.5
    // F1 = 5*1*.5 / (4*1 + .5) = 2.5/4.5
    val df = Seq((1L, "ab", "abab")).toDF("id", "cand", "ref")
    val r = EvalMetrics.chrF(df, "id", "cand", "ref").collect().head
    val p1 = 2.0 / 2.0; val r1 = 2.0 / 4.0
    val f1 = (5.0 * p1 * r1) / (4.0 * p1 + r1)
    val p2 = 1.0 / 1.0; val r2 = 1.0 / 3.0 // "ab" in "abab": ab,ba,ab -> 1
    val f2 = (5.0 * p2 * r2) / (4.0 * p2 + r2)
    assert(math.abs(r.getAs[Double]("chrf2") - (f1 + f2) / 6.0) < 1e-12)
  }

  test("anisotropy: cosine to the exact integer centroid") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.anisotropy(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cos_centroid")).toMap
    // centroid direction (2, 2): cos(v1)=cos(v2)=1/sqrt(2), cos(v3)=1
    assert(math.abs(got(1L) - 1.0 / math.sqrt(2.0)) < 1e-9)
    assert(math.abs(got(2L) - 1.0 / math.sqrt(2.0)) < 1e-9)
    assert(math.abs(got(3L) - 1.0) < 1e-9)
  }

  test("ngramNovelty: share of candidate grams unseen in the reference") {
    val df = Seq(
      (1L, "a b c d", true),  // ref: grams {a b c, b c d}
      (2L, "a b c x", false), // cand: {a b c, b c x} -> 1 of 2 novel
      (3L, "a b", false)      // cand too short -> (0, 0, NULL)
    ).toDF("doc_id", "text", "is_ref")
    val got = TextAnalysis.ngramNovelty(df, "doc_id", "text",
        refFilter = col("is_ref"), n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(2L).getAs[Long]("n_grams") == 2L)
    assert(got(2L).getAs[Long]("n_novel") == 1L)
    assert(got(2L).getAs[Long]("novel_ppm") == 500000L)
    assert(got(3L).getAs[Long]("n_grams") == 0L)
    assert(got(3L).isNullAt(got(3L).fieldIndex("novel_ppm")))
  }

  test("termBurstiness: Fano factor from exact sufficient stats") {
    // term t: counts (2, 1, 0) over 3 docs -> S=3, Q=5, N=3
    // vmr = (3*5 - 9) / (3*3) = 2/3; term u has df=1 < minDf -> dropped
    val df = Seq((1L, "t t"), (2L, "t"), (3L, "u")).toDF("doc_id", "text")
    val got = TextAnalysis.termBurstiness(df, "doc_id", "text", minDf = 2L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("term") == "t")
    assert(r.getAs[Long]("df") == 2L && r.getAs[Long]("total") == 3L)
    assert(math.abs(r.getAs[Double]("vmr") - 2.0 / 3.0) < 1e-12)
  }

  test("neymanAllocation: budget flows to the high-variance stratum") {
    // A: values {0,10,0,10} -> w = sqrt(4*200 - 400) = 20
    // B: constant 5s -> w = 0 (one draw tells you everything)
    val df = Seq(
      ("A", "a1", 0L), ("A", "a2", 10L), ("A", "a3", 0L), ("A", "a4", 10L),
      ("B", "b1", 5L), ("B", "b2", 5L)
    ).toDF("stratum", "key", "v")
    val got = Sampling.neymanAllocation(df, "stratum", "key", col("v"),
      budget = 2L).collect()
    assert(got.length == 2)
    assert(got.forall(_.getString(0) == "A"))
  }

  test("neymanAllocation: membership is hash-stable under appends") {
    val base = (1 to 20).map(i => ("S", s"k$i", i.toLong)).toDF("g", "k", "v")
    val kept = Sampling.neymanAllocation(base, "g", "k", col("v"), budget = 5L)
      .collect().map(_.getString(1)).toSet
    // re-run on the same data: identical survivors (derandomized contract)
    val again = Sampling.neymanAllocation(base, "g", "k", col("v"), budget = 5L)
      .collect().map(_.getString(1)).toSet
    assert(kept == again && kept.size == 5)
  }

  // ---- prefix-filter set-similarity join (AllPairs/PPJoin) ----------

  test("nearDupPairsPrefix: equals the full-index result (lossless filter)") {
    // near-dups, an exact dup, a hot shared phrase, and unrelated docs —
    // the prefix filter must reproduce the complete index bit-for-bit
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "completely different text about spark shuffle exchange plans"),
      (5L, "another unrelated document mentioning the quick brown fox once"),
      (6L, "the lazy dog sleeps while the quick brown fox runs far away")
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val full = Dedup.nearDupPairsExact(docs, "doc_id", "text", n = 3, tau = 0.5)
      .collect().map(key).sortBy(p => (p._1, p._2))
    val pfx = Dedup.nearDupPairsPrefix(docs, "doc_id", "text", n = 3, tau = 0.5)
      .collect().map(key).sortBy(p => (p._1, p._2))
    assert(full.nonEmpty && (pfx.toSeq == full.toSeq))
  }

  test("nearDupPairsPrefix: tau = 1 keeps only identical shingle sets") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d f")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupPairsPrefix(docs, "doc_id", "text", n = 3, tau = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
  }

  // ---- average precision --------------------------------------------

  test("averagePrecision: hits at ranks 1 and 3 with two judged docs") {
    val ranking = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 10L, 1L)).toDF("q", "d", "r")
    val qrels = Seq((1L, 10L, 1L), (1L, 12L, 2L), (2L, 99L, 1L))
      .toDF("q", "d", "rel")
    val got = Retrieval.averagePrecision(ranking, qrels, "q", "d", "r", "rel",
        k = 10)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // q1: (1/1 + 2/3) / 2 = 0.833333; q2: judged, nothing hit -> 0
    assert(got(1L) == ((2L, 2L, 0.833333)))
    assert(got(2L) == ((1L, 0L, 0.0)))
  }

  test("averagePrecision: a relevant doc beyond k costs recall, not error") {
    val ranking = Seq((1L, 10L, 1L), (1L, 11L, 12L)).toDF("q", "d", "r")
    val qrels = Seq((1L, 10L, 1L), (1L, 11L, 1L)).toDF("q", "d", "rel")
    val r = Retrieval.averagePrecision(ranking, qrels, "q", "d", "r", "rel",
      k = 10).collect().head
    // hit at rank 1 only; denominator stays 2
    assert(r.getLong(2) == 1L && r.getDouble(3) == 0.5)
  }

  // ---- Pareto front --------------------------------------------------

  test("paretoFront: keeps the skyline, drops dominated rows, keeps ties") {
    val pts = Seq(
      ("a", 1L, 5L), ("b", 2L, 7L), ("b2", 2L, 7L), ("c", 2L, 6L),
      ("d", 3L, 7L), ("e", 3L, 9L), ("f", 5L, 9L)
    ).toDF("key", "cost", "score")
    val got = Sampling.paretoFront(pts, "key", "cost", "score")
      .collect().map(_.getString(0)).toSet
    // c dominated at its own cost (score 6 < 7); d dominated by b
    // (cost 2 < 3, score 7 >= 7); f dominated by e; the (2,7) twins
    // survive together (neither dominates the other)
    assert(got == Set("a", "b", "b2", "e"))
  }

  test("paretoFront: bucket boundaries do not change the answer") {
    val pts = (1 to 200).map(i =>
      (s"k$i", i.toLong, ((i * 7919) % 400).toLong)).toDF("key", "cost", "score")
    def front(shift: Int) =
      Sampling.paretoFront(pts, "key", "cost", "score", bucketShift = shift)
        .collect().map(_.getString(0)).toSet
    assert(front(0) == front(3) && front(3) == front(16))
  }

  // ---- Welch ANOVA ----------------------------------------------------

  test("welchAnova: matches the hand-computed statistic") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 4L), ("b", 6L),
      ("c", 5L), ("c", 5L), ("c", 8L)).toDF("g", "x")
    val r = Stats.welchAnova(df, "g", col("x")).collect().head
    // reference computation (same formula, plain doubles)
    val groups = Seq(Seq(1.0, 2.0, 3.0), Seq(2.0, 4.0, 6.0), Seq(5.0, 5.0, 8.0))
    val k = groups.size.toDouble
    val stats = groups.map { g =>
      val n = g.size.toDouble; val m = g.sum / n
      val v = g.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, n / v)
    }
    val bigW = stats.map(_._3).sum
    val xbar = stats.map(s => s._3 * s._2).sum / bigW
    val aNum = stats.map(s => s._3 * (s._2 - xbar) * (s._2 - xbar)).sum
    val c = stats.map(s => math.pow(1 - s._3 / bigW, 2) / (s._1 - 1)).sum
    val f = (aNum / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * c)
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_total") == 9L)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-6)
    assert(math.abs(r.getAs[Double]("df2") - (k * k - 1) / (3 * c)) < 1e-6)
  }

  test("welchAnova: zero-variance and tiny groups mask to NULL") {
    val zv = Seq(("a", 5L), ("a", 5L), ("b", 1L), ("b", 3L)).toDF("g", "x")
    val r1 = Stats.welchAnova(zv, "g", col("x")).collect().head
    assert(r1.isNullAt(r1.fieldIndex("f_stat")))
    val tiny = Seq(("a", 5L), ("b", 1L), ("b", 3L)).toDF("g", "x")
    val r2 = Stats.welchAnova(tiny, "g", col("x")).collect().head
    assert(r2.isNullAt(r2.fieldIndex("f_stat")))
  }

  // ---- log-rank test --------------------------------------------------

  test("logRank: hand-computed O/E/V on a 4-user fixture") {
    // g1: u1 (d1..d3, t=2, churns), u2 (d1, t=0, churns)
    // g0: u3 (d1..d6, censored), u4 (d2..d6, censored); horizon = d6
    val ev = Seq(("u1", 1), ("u1", 3), ("u2", 1), ("u3", 1), ("u3", 6),
      ("u4", 2), ("u4", 6)).map { case (u, d) => (u, ts(d)) }.toDF("u", "t")
    val g = when(col("u").isin("u1", "u2"), 1L).otherwise(0L)
    val r = Survival.logRank(ev, "u", "t", g, censorDays = 2).collect().head
    assert(r.getAs[Long]("n_users") == 4L && r.getAs[Long]("n_users_1") == 2L)
    assert(r.getAs[Long]("n_event_times") == 2L && r.getAs[Long]("o1") == 2L)
    // E1 = 1*(2/4) + 1*(1/3); V = 1*(1/2)(1/2)*(3/3) + 1*(1/3)(2/3)*(2/2)
    val e1 = 0.5 + 1.0 / 3.0
    val v = 0.25 + 2.0 / 9.0
    assert(math.abs(r.getAs[Double]("e1") - e1) < 1e-6)
    assert(math.abs(r.getAs[Double]("v") - v) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") - (2.0 - e1) / math.sqrt(v)) < 1e-6)
  }

  test("logRank: single-group data masks z to NULL") {
    val ev = Seq(("u1", 1), ("u1", 2), ("u2", 1), ("u2", 9), ("u3", 1),
      ("u3", 9)).map { case (u, d) => (u, ts(d)) }.toDF("u", "t")
    // every user in group 0 -> n1(t) = 0 at every event time
    val r = Survival.logRank(ev, "u", "t", lit(0L), censorDays = 2)
      .collect().head
    assert(r.getAs[Long]("o1") == 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ---- permutation test + BH-FDR --------------------------------------

  test("permutationTest: a null effect (constant metric) gives p = 1") {
    // every unit contributes the same value -> |diff_obs| = 0 and every
    // relabel's diff is 0 >= 0, so n_exceed = B and p = (B+1)/(B+1)
    val df = (1 to 40).map(i => (s"u$i", "s", 100L)).toDF("u", "strat", "x")
    val r = Bootstrap.permutationTest(df, "u", "strat", col("x"), reps = 19)
      .collect().head
    assert(r.getAs[Long]("n_exceed") == 19L)
    assert(r.getAs[Double]("p") == 1.0)
    assert(r.getAs[Double]("diff") == 0.0)
  }

  test("permutationTest: derandomized — identical across runs") {
    val df = (1 to 60).map(i => (s"u$i", "s", (i * 37 % 11).toLong))
      .toDF("u", "strat", "x")
    def run() = Bootstrap.permutationTest(df, "u", "strat", col("x"),
      reps = 49).collect().head
    val (a, b) = (run(), run())
    assert(a.getAs[Long]("n_exceed") == b.getAs[Long]("n_exceed"))
    assert(a.getAs[Double]("p") == b.getAs[Double]("p"))
    assert(a.getAs[Double]("p") >= 1.0 / 50.0 && a.getAs[Double]("p") <= 1.0)
  }

  test("bhFdr: step-up rejections and monotone q-values on a hand case") {
    val tests = Seq(("t1", Some(0.01)), ("t2", Some(0.02)),
      ("t3", Some(0.2)), ("t4", Some(0.9)), ("t5", None))
      .toDF("id", "p")
    val got = Stats.bhFdr(tests, "id", "p", alpha = 0.1)
      .collect().map(r => r.getString(0) -> r).toMap
    // m=4; thresholds 0.025/0.05/0.075/0.1 -> k*=2
    assert(got("t1").getAs[Boolean]("rejected"))
    assert(got("t2").getAs[Boolean]("rejected"))
    assert(!got("t3").getAs[Boolean]("rejected"))
    assert(!got("t4").getAs[Boolean]("rejected"))
    assert(got("t1").getAs[Double]("q_value") == 0.04)
    assert(got("t2").getAs[Double]("q_value") == 0.04)
    assert(math.abs(got("t3").getAs[Double]("q_value") - 0.266667) < 1e-9)
    assert(got("t4").getAs[Double]("q_value") == 0.9)
    // NULL p stays out of the family but is emitted
    assert(got("t5").isNullAt(got("t5").fieldIndex("rank")))
    assert(got("t5").isNullAt(got("t5").fieldIndex("rejected")))
  }

  // ---- Fellegi–Sunter linkage -----------------------------------------

  test("fsLinkage: name disagreement costs more than code agreements earn") {
    // 8 records, block = initial; names pair up inside one block.
    val df = Seq(
      (1L, "alpha part one", "X", "T1"), (2L, "alpha part one", "X", "T2"),
      (3L, "alpha part two", "Y", "T1"), (4L, "alpha part twq", "Y", "T1"),
      (5L, "beta thing", "X", "T2"), (6L, "beta thing", "X", "T2"),
      (7L, "gamma item", "X", "T1"), (8L, "delta item", "X", "T2")
    ).toDF("id", "name", "brand", "ptype")
      .withColumn("ini", substring(col("name"), 1, 1))
    val got = Dedup.fsLinkage(df, "id", "name",
        fieldCols = Seq("brand", "ptype"), blockCols = Seq("ini"),
        candSim = 0.85, m = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // (3,4): brand + type agree, name differs by one char (jw ~0.97)
    // (5,6): brand + type agree + name exact
    val r34 = got((3L, 4L)); val r56 = got((5L, 6L))
    assert(r34.getAs[String]("pattern") == "110")
    assert(r56.getAs[String]("pattern") == "111")
    assert(r56.getAs[Long]("n_agree") == 3L)
    // field-level u: brand Σn²=40/64, type 32/64, name 12/64 — the
    // high-cardinality name term dominates both code fields
    val ln2 = math.log(2.0)
    val w34 = math.log(0.9 / (40.0 / 64.0)) / ln2 +
      math.log(0.9 / (32.0 / 64.0)) / ln2 +
      math.log((1.0 - 0.9) / (1.0 - 12.0 / 64.0)) / ln2
    assert(math.abs(r34.getAs[Double]("weight") - w34) < 1e-6)
    assert(r34.getAs[Double]("weight") < 0.0) // one name miss sinks it
    assert(r56.getAs[Double]("weight") > r34.getAs[Double]("weight"))
  }

  test("fsLinkage: hand-checked weight for a full-agreement pair") {
    val df = Seq(
      (1L, "aa bb", "B1", "T1"), (2L, "aa bb", "B1", "T1"),
      (3L, "ax yz", "B2", "T2"), (4L, "az qr", "B1", "T2")
    ).toDF("id", "name", "brand", "ptype")
      .withColumn("ini", substring(col("name"), 1, 1))
    val r = Dedup.fsLinkage(df, "id", "name",
        fieldCols = Seq("brand", "ptype"), blockCols = Seq("ini"),
        candSim = 0.0, m = 0.9)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    val p12 = r((1L, 2L))
    // u_brand = (3^2+1)/16, u_type = (2^2+2^2)/16, u_name = (2^2+1+1)/16
    val ln2 = math.log(2.0)
    val w = math.log(0.9 / (10.0 / 16.0)) / ln2 +
      math.log(0.9 / (8.0 / 16.0)) / ln2 +
      math.log(0.9 / (6.0 / 16.0)) / ln2
    assert(p12.getAs[String]("pattern") == "111")
    assert(math.abs(p12.getAs[Double]("weight") - w) < 1e-6)
  }

  // ---- EB beta-binomial shrinkage --------------------------------------

  test("ebShrinkage: pulls extreme small-n rates toward the prior mean") {
    // many keys at ~50% with n=20; one 1/1 key and one 0/1 key
    val steady = (1 to 20).flatMap(k =>
      (1 to 20).map(i => (s"k$k", 1L, if (i <= 10) 1L else 0L)))
    val rows = steady ++ Seq(("hot", 1L, 1L), ("cold", 1L, 0L))
    val df = rows.toDF("key", "t", "s")
    val got = Stats.ebShrinkage(df, "key", col("t"), col("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    val hot = got("hot"); val cold = got("cold")
    assert(hot.getAs[Long]("raw_ppm") == 1000000L)
    assert(cold.getAs[Long]("raw_ppm") == 0L)
    // both shrink toward ~500000, and stay ordered
    val hs = hot.getAs[Long]("shrunk_ppm"); val cs = cold.getAs[Long]("shrunk_ppm")
    assert(hs < 1000000L && hs > 500000L)
    assert(cs > 0L && cs < 500000L)
    val k1 = got("k1").getAs[Long]("shrunk_ppm")
    assert(math.abs(k1 - 500000L) < math.abs(hs - 500000L))
  }

  test("ebShrinkage: tied rates (v = 0) mask shrunk_ppm to NULL") {
    val df = (1 to 5).map(k => (s"k$k", 2L, 1L)).toDF("key", "t", "s")
    val got = Stats.ebShrinkage(df, "key", col("t"), col("s")).collect()
    assert(got.forall(_.isNullAt(got.head.fieldIndex("shrunk_ppm"))))
    assert(got.forall(_.getAs[Long]("raw_ppm") == 500000L))
  }

  // ---- bounded-hop BFS --------------------------------------------------

  test("bfsHops: hop distances on a hand path graph") {
    // path 1-2-3-4-5 plus island 9; sources {1}; maxHops 3
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 9L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val src = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.bfsHops(edges, "src", "dst", src, "node", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: multi-source takes the minimum distance") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L)).toDF("src", "dst")
    val src = Seq(Tuple1(1L), Tuple1(4L)).toDF("node")
    val got = Graph.bfsHops(edges, "src", "dst", src, "node", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("kruskalWallis: tie-corrected H on a hand case") {
    // a: [1,2], b: [3,3] -> midranks 1, 2, 3.5, 3.5; R_a=3, R_b=7
    // H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4; T = 2^3-2 = 6
    // corr = 1 - 6/60 = 0.9 -> H' = 2.4/0.9 = 2.666667
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 3L)).toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", col("x")).collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_total") == 4L)
    assert(r.getAs[Long]("df") == 1L)
    assert(math.abs(r.getAs[Double]("h_stat") - 2.666667) < 1e-9)
  }

  test("kruskalWallis: single distinct value masks H to NULL") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", col("x")).collect().head
    assert(r.isNullAt(r.fieldIndex("h_stat")))
  }

  test("brownForsythe: median-centered F on a hand case") {
    // a: [1,2,3] (med2=4, 2z: 2,0,2); b: [1,5,9] (med2=10, 2z: 8,0,8)
    // grand=20/6; num=24, den=136/3 -> F = 4*24/(136/3) = 36/17
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 5L), ("b", 9L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", col("x")).collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Long]("df1") == 1L)
    assert(r.getAs[Long]("df2") == 4L)
    assert(math.abs(r.getAs[Double]("f_stat") - 2.117647) < 1e-9)
  }

  test("brownForsythe: zero within-group deviation variance masks to NULL") {
    // both groups symmetric around their median -> all z equal per group
    val df = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 6L)).toDF("g", "x")
    val r = Stats.brownForsythe(df, "g", col("x")).collect().head
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  test("mcnemar: discordant-pair chi2 with continuity correction") {
    // u1 (1,0), u2 (0,1), u3 (1,0), u4 (1,1), u5 (0,0)
    // b10=2, b01=1 -> chi2 = 1/3; cc = (1-1)^2/3 = 0
    val df = Seq(("u1", 1, 0), ("u2", 0, 1), ("u3", 1, 0), ("u4", 1, 1),
      ("u5", 0, 0)).toDF("u", "a", "b")
    val r = Stats.mcnemar(df, "u", col("a") === 1, col("b") === 1)
      .collect().head
    assert(r.getAs[Long]("n_units") == 5L)
    assert(r.getAs[Long]("b10") == 2L)
    assert(r.getAs[Long]("b01") == 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 1.0 / 3.0) < 1e-6)
    assert(r.getAs[Double]("chi2_cc") == 0.0)
  }

  test("mcnemar: zero discordant pairs masks to NULL") {
    val df = Seq(("u1", 1, 1), ("u2", 0, 0)).toDF("u", "a", "b")
    val r = Stats.mcnemar(df, "u", col("a") === 1, col("b") === 1)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("grubbs: names the suspect value with the exact-integer argmax") {
    // [1,2,3,10]: mean 4, sd = sqrt(50/3); dev 24 at x=10
    // G = 6 / 4.0824829 = 1.469694
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 10L)).toDF("s", "x")
    val r = Stats.grubbs(df, "s", col("x")).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("suspect_value") == 10L)
    assert(math.abs(r.getAs[Double]("g_stat") - 6.0 / math.sqrt(50.0 / 3.0)) < 1e-6)
  }

  test("grubbs: zero variance and tiny groups mask to NULL") {
    val df = Seq(("c", 5L), ("c", 5L), ("c", 5L), ("t", 1L), ("t", 2L))
      .toDF("s", "x")
    val got = Stats.grubbs(df, "s", col("x")).collect()
      .map(r => r.getString(0) -> r.isNullAt(r.fieldIndex("g_stat"))).toMap
    assert(got == Map("c" -> true, "t" -> true))
  }

  // triangle 1-2-3 plus pendant edge 3-4, via baskets at minSupport=1
  private def lccBaskets = Seq(
    ("b1", 1L), ("b1", 2L), ("b1", 3L), ("b2", 3L), ("b2", 4L))
    .toDF("basket", "item")

  test("localClustering: triangle members vs the pendant node") {
    val got = Graph.localClustering(lccBaskets, "basket", "item",
        minSupport = 1L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)),
      4L -> ((1L, 0L, -1L))))
  }

  test("degreeAssortativity: hand-computed Newman r on the tadpole") {
    val r = Graph.degreeAssortativity(lccBaskets, "basket", "item",
      minSupport = 1L).collect().head
    assert(r.getAs[Long]("n_edges") == 8L)
    // cov=-20, vx=vy=28 -> r = -20/28
    assert(math.abs(r.getAs[Double]("assortativity") - (-20.0 / 28.0)) < 1e-6)
  }

  test("degreeAssortativity: regular graph masks to NULL (zero variance)") {
    // single edge -> both endpoints degree 1
    val df = Seq(("b1", 1L), ("b1", 2L)).toDF("basket", "item")
    val r = Graph.degreeAssortativity(df, "basket", "item", minSupport = 1L)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }

  test("pacfLag2: Yule-Walker closed form; constant series masks") {
    // counts [1,2,1,2]: r1=-0.75, r2=0.5
    // pacf2 = (0.5 - 0.5625)/(1 - 0.5625) = -1/7
    val rows = (1 to 4).flatMap(d =>
      Seq.fill(if (d % 2 == 1) 1 else 2)(("a", ts(d)))) ++
      Seq(("c", ts(1)), ("c", ts(2)))
    val got = TimeSeries.pacfLag2(rows.toDF("series", "ts"), "series", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getDouble(2) == -0.75)
    assert(got("a").getDouble(3) == 0.5)
    assert(math.abs(got("a").getAs[Double]("pacf2") - (-1.0 / 7.0)) < 1e-6)
    assert(got("c").isNullAt(got("c").fieldIndex("pacf2")))
  }

  test("trimmedMean: boundary ties split exactly on the value frame") {
    // [1,1,2..7,8,8] n=10 k=1: one 1 and one 8 leave -> mean 36/8
    val df = (Seq(1L, 1L) ++ (2L to 7L) ++ Seq(8L, 8L)).map(("g", _))
      .toDF("g", "x")
    val r = Outliers.trimmedMean(df, "g", col("x")).collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_trimmed") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 4.5)
    // trim past the middle masks
    val z = Outliers.trimmedMean(Seq(("g", 1L)).toDF("g", "x"), "g",
      col("x"), trimPpm = 499999L).collect().head
    assert(z.getAs[Double]("trimmed_mean") == 1.0) // k=0 at n=1
  }

  test("vocabRichness: Chao1 and unseen mass; F2=0 masks Chao1") {
    val df = Seq(Tuple1("a b a"), Tuple1("c c d")).toDF("text")
    val r = TextAnalysis.vocabRichness(df, "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("f1") == 2L)
    assert(r.getAs[Long]("f2") == 2L)
    assert(r.getAs[Double]("chao1") == 5.0)
    assert(r.getAs[Long]("unseen_ppm") == 333333L)
    val z = TextAnalysis.vocabRichness(Seq(Tuple1("x y")).toDF("text"), "text")
      .collect().head
    assert(z.isNullAt(z.fieldIndex("chao1")))
  }

  test("oddsRatio: ln-domain Woolf interval on a hand 2x2") {
    val df = Seq(("u1", 1, 1), ("u2", 1, 0), ("u3", 0, 1), ("u4", 0, 0),
      ("u5", 1, 1)).toDF("u", "e", "o")
    val r = Stats.oddsRatio(df, "u", col("e") === 1, col("o") === 1)
      .collect().head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("d")) == ((2L, 1L, 1L, 1L)))
    assert(math.abs(r.getAs[Double]("ln_or") - math.log(2.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(3.5)) < 1e-6)
  }

  test("gainsTable: exact deciles, top-down capture") {
    val rows = Seq(("u1", "view"), ("u2", "click"),
      ("u3", "click"), ("u3", "click"), ("u3", "purchase"),
      ("u4", "click"), ("u4", "click"), ("u4", "click"), ("u4", "purchase"))
    val df = rows.toDF("u", "t")
    val got = Stats.gainsTable(df, "u",
        when(col("t") === "click", 1L).otherwise(0L),
        col("t") === "purchase").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // deciles 0,2,5,7; cum from top: 7->1 (500000), 5->2, 2->2, 0->2
    assert(got == Map(
      7L -> ((1L, 1L, 500000L)), 5L -> ((1L, 2L, 1000000L)),
      2L -> ((0L, 2L, 1000000L)), 0L -> ((0L, 2L, 1000000L))))
  }

  test("varianceComponents: hand-computed ICC") {
    // a [1,3], b [5,7]: msb=16, msw=2, k0=2 -> s2b=7, icc=7/9
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L)).toDF("g", "x")
    val r = Stats.varianceComponents(df, "g", col("x")).collect().head
    assert(r.getAs[Double]("ms_between") == 16.0)
    assert(r.getAs[Double]("ms_within") == 2.0)
    assert(r.getAs[Double]("sigma2_between") == 7.0)
    assert(math.abs(r.getAs[Double]("icc") - 7.0 / 9.0) < 1e-6)
  }

  test("clusterTopTerms: df-squared-over-df lift ranking") {
    val assign = Seq((1L, "c0"), (2L, "c0"), (3L, "c1")).toDF("id", "cl")
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "x y")).toDF("doc_id", "text")
    val got = Similarity.clusterTopTerms(assign, "id", "cl",
        docs, "doc_id", "text", k = 5).collect()
      .map(r => (r.getString(0), r.getAs[Long]("rank")) ->
        (r.getString(1), r.getAs[Double]("score"))).toMap
    // c0: x 4/3, z 1.0, y 0.5; c1: y 0.5, x 1/3
    assert(got(("c0", 1L))._1 == "x")
    assert(math.abs(got(("c0", 1L))._2 - 1.333333) < 1e-6)
    assert(got(("c0", 2L)) == (("z", 1.0)))
    assert(got(("c0", 3L)) == (("y", 0.5)))
    assert(got(("c1", 1L)) == (("y", 0.5)))
    assert(math.abs(got(("c1", 2L))._2 - 0.333333) < 1e-6)
  }

  test("communityModularity: two clean triangles score 0.25 each") {
    val baskets = Seq(("b1", 1L), ("b1", 2L), ("b1", 3L),
      ("b2", 4L), ("b2", 5L), ("b2", 6L)).toDF("basket", "item")
    val got = Graph.communityModularity(baskets, "basket", "item",
        minSupport = 1L, rounds = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(1L -> ((3L, 3L, 6L, 0.25)),
      4L -> ((3L, 3L, 6L, 0.25))))
  }

  test("regressionDiagnostics: studentized ranking on a hand fit") {
    // (1,1) (2,2) (3,3) (4,10): b=2.8, a=-3, s2=5.4; residuals
    // 1.2, -0.6, -2.4, 1.8; h = .7/.3/.3/.7
    // |t| = 0.9428, 0.3086, 1.2345, 1.4142 -> rank 1 x=4, rank 4 x=2
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 10L))
      .toDF("g", "x", "y")
    val got = Agg.regressionDiagnostics(df, "g", col("x"), col("y"), k = 5)
      .collect().map(r => r.getAs[Long]("rank") -> r).toMap
    assert(got.size == 4)
    assert(got(1L).getAs[Long]("x") == 4L)
    assert(math.abs(got(1L).getAs[Double]("studentized") -
      1.8 / math.sqrt(5.4 * 0.3)) < 1e-6)
    assert(math.abs(got(1L).getAs[Double]("leverage") - 0.7) < 1e-9)
    assert(got(4L).getAs[Long]("x") == 2L)
    assert(got(4L).getAs[Double]("residual") == -0.6)
  }

  test("regressionDiagnostics: zero x-variance group is dropped") {
    val df = Seq(("g", 2L, 1L), ("g", 2L, 5L), ("g", 2L, 9L)).toDF("g", "x", "y")
    assert(Agg.regressionDiagnostics(df, "g", col("x"), col("y")).count() == 0)
  }

  test("noisySum: per-unit contribution clipping bounds the release") {
    val df = Seq(("u1", "a", 50L), ("u2", "a", 120L), ("u2", "a", 80L),
      ("u3", "a", -300L)).toDF("u", "seg", "v")
    val r = Privacy.noisySum(df, Seq("seg"), "u", col("v"),
      clip = 100L, epsilon = 0.5).collect().head
    assert(r.getAs[Long]("n_units") == 3L)
    // u1 50, u2 200 -> 100, u3 -300 -> -100
    assert(r.getAs[Long]("clipped_sum") == 50L)
    assert(!r.isNullAt(r.fieldIndex("noisy_sum")))
  }

  test("embedNorms: micro-quantized L2 buckets") {
    val df = Seq((1L, Array(0.3f, 0.4f)), (2L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embedNorms(df, "vec_id", "embedding").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(0.5 -> 1L, 1.0 -> 1L))
  }

  test("cramerVonMises: hand-computed T; empty side masks") {
    // g1 [1,3], g0 [2,4]: gaps (2,0,2,0) squared -> num 8; T = 8/64
    val df = Seq(("t", 1L), ("t", 3L), ("c", 2L), ("c", 4L)).toDF("grp", "x")
    val r = Stats.cramerVonMises(df, col("grp") === "t", col("x"))
      .collect().head
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("t_stat") == 0.125)
    val e = Stats.cramerVonMises(Seq(("t", 1L)).toDF("grp", "x"),
      col("grp") === "t", col("x")).collect().head
    assert(e.isNullAt(e.fieldIndex("t_stat")))
  }

  test("rfm: exact quintile scores on distinct dimensions") {
    // user k: k events on day k, 10k value each -> monetary 1000k^2
    val rows = (1 to 5).flatMap(k =>
      Seq.fill(k)((k.toLong, ts(k), (k * 10).toDouble)))
    val df = rows.toDF("user_id", "ts", "value")
    val got = Rfm.rfm(df, "user_id", "ts",
        round(col("value") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("recency_days") == 4L)
    assert(got(1L).getAs[Long]("rfm") == 111L)
    assert(got(5L).getAs[Long]("recency_days") == 0L)
    assert(got(5L).getAs[Long]("frequency") == 5L)
    assert(got(5L).getAs[Long]("rfm") == 555L)
    assert(got(3L).getAs[Long]("rfm") == 333L)
  }

  test("jaccardLinks: normalized common-neighbor score, new links only") {
    val got = Graph.jaccardLinks(lccBaskets, "basket", "item",
        minSupport = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // non-adjacent pairs through witness 3: (1,4) and (2,4)
    assert(got == Map((1L, 4L) -> ((1L, 500000L)),
      (2L, 4L) -> ((1L, 500000L))))
  }

  test("acfProfile: centered-integer autocorrelations on a hand series") {
    // daily counts [1,2,1,2] -> u = [-2,2,-2,2], den 16
    // r1 = -12/16, r2 = 8/16, r3 = -4/16, r4..7 NULL
    val rows = (1 to 4).flatMap(d =>
      Seq.fill(if (d % 2 == 1) 1 else 2)(("a", ts(d)))) ++
      Seq(("c", ts(1)), ("c", ts(2)))
    val got = TimeSeries.acfProfile(rows.toDF("series", "ts"), "series", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got.size == 14)
    assert(got(("a", 1L)) == -0.75)
    assert(got(("a", 2L)) == 0.5)
    assert(got(("a", 3L)) == -0.25)
    assert(got(("a", 4L)).isNaN)
    // constant series masks every lag
    assert((1L to 7L).forall(l => got(("c", l)).isNaN))
  }

  test("mannWhitney: U and tie-corrected z on a hand case") {
    // treat [3,4] vs control [1,2]: U = 4, z = 2/sqrt(5/3)
    val df = Seq(("t", 3L), ("t", 4L), ("c", 1L), ("c", 2L)).toDF("grp", "x")
    val r = Stats.mannWhitney(df, col("grp") === "t", col("x"))
      .collect().head
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("u_stat") == 4.0)
    assert(math.abs(r.getAs[Double]("z") - 2.0 / math.sqrt(5.0 / 3)) < 1e-6)
  }

  test("mannWhitney: all-tied input masks to NULL") {
    val df = Seq(("t", 5L), ("c", 5L), ("c", 5L)).toDF("grp", "x")
    val r = Stats.mannWhitney(df, col("grp") === "t", col("x"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("grangerLag: closed-form nested OLS on a hand series") {
    // daily y = [1,2,3,5,4], x = [2,1,4,1,3] -> lagged m = 4
    val days = Seq((1, 1, 2), (2, 2, 1), (3, 3, 4), (4, 5, 1), (5, 4, 3))
    val rows = days.flatMap { case (d, p, c) =>
      Seq.fill(p)((ts(d), "purchase")) ++ Seq.fill(c)((ts(d), "click"))
    }
    val r = TimeSeries.grangerLag(rows.toDF("ts", "event_type"), "ts",
      col("event_type") === "purchase", col("event_type") === "click")
      .collect().head
    assert(r.getAs[Long]("m") == 4L)
    // sums: sy 14 su 11 sv 8 syy 54 suu 39 svv 22 suv 21 suy 43 svy 31
    val (m, a11, a22, a12, b1, b2, syc) =
      (4.0, 39 - 11.0 * 11 / 4, 22 - 8.0 * 8 / 4, 21 - 11.0 * 8 / 4,
        43 - 11.0 * 14 / 4, 31 - 8.0 * 14 / 4, 54 - 14.0 * 14 / 4)
    val det = a11 * a22 - a12 * a12
    val bhat = (a22 * b1 - a12 * b2) / det
    val chat = (a11 * b2 - a12 * b1) / det
    val rss1 = syc - bhat * b1 - chat * b2
    val rss0 = syc - b1 * b1 / a11
    val f = (rss0 - rss1) / (rss1 / (m - 3.0))
    assert(math.abs(r.getAs[Double]("b_lag") - bhat) < 1e-6)
    assert(math.abs(r.getAs[Double]("c_cross") - chat) < 1e-6)
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-6)
    assert(r.getAs[Long]("df2") == 1L)
  }

  test("grangerLag: constant lagged-y masks to NULL (singular fit)") {
    val rows = (1 to 5).flatMap { d =>
      Seq.fill(2)((ts(d), "purchase")) ++ Seq.fill(d)((ts(d), "click"))
    }
    val r = TimeSeries.grangerLag(rows.toDF("ts", "event_type"), "ts",
      col("event_type") === "purchase", col("event_type") === "click")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  test("codeSignals: planted snippet flags, prose does not") {
    val code = "a\n  x = 1;\n  if (x) { y(); }\n\tz;"
    val df = Seq((1L, "hello world"), (2L, code)).toDF("doc_id", "text")
    val got = TextAnalysis.codeSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got(1L).getAs[Boolean]("is_code"))
    assert(got(1L).getAs[Long]("brace_semi_cnt") == 0L)
    val c = got(2L)
    assert(c.getAs[Long]("n_lines") == 4L)
    assert(c.getAs[Long]("brace_semi_cnt") == 5L)
    assert(c.getAs[Long]("indent_line_ppm") == 750000L)
    assert(c.getAs[Boolean]("is_code"))
  }

  test("bartlett: hand-computed chi2; zero-variance group masks") {
    // a [1,2,3] var 1; b [2,4,6] var 4 -> sp2 2.5, C 1.25
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 4L), ("b", 6L)).toDF("g", "x")
    val r = Stats.bartlett(df, "g", col("x")).collect().head
    val want = (4 * math.log(2.5) - 2 * math.log(4.0)) / 1.25
    assert(math.abs(r.getAs[Double]("chi2") - want) < 1e-6)
    assert(r.getAs[Long]("df") == 1L)
    val z = Stats.bartlett(Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 3L))
      .toDF("g", "x"), "g", col("x")).collect().head
    assert(z.isNullAt(z.fieldIndex("chi2")))
  }

  test("pairwiseContrasts: pooled t; both-zero-variance pair masks") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 7L), ("b", 9L),
      ("c", 4L), ("c", 4L), ("d", 6L), ("d", 6L)).toDF("g", "x")
    val got = Stats.pairwiseContrasts(df, "g", col("x")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.size == 6)
    val ab = got(("a", "b"))
    assert(ab.getAs[Double]("mean_diff") == -5.0)
    assert(math.abs(ab.getAs[Double]("t_stat") -
      (-5.0 / math.sqrt(2.5 * (2.0 / 3)))) < 1e-6)
    assert(ab.getAs[Long]("df") == 4L)
    val cd = got(("c", "d"))
    assert(cd.isNullAt(cd.fieldIndex("t_stat")))
    // one-sided zero variance still pools: (a, c) has t
    assert(!got(("a", "c")).isNullAt(got(("a", "c")).fieldIndex("t_stat")))
  }

  test("jsDivergence: hand-computed symmetric divergence") {
    // A: "a a b" (a:2,b:1, n=3); B: "a b b b" (a:1,b:3, n=4)
    val df = Seq(("en", "a a b"), ("de", "a b b b")).toDF("lang", "text")
    val r = TextAnalysis.jsDivergence(df, "text", col("lang") === "en")
      .collect().head
    assert(r.getAs[Long]("n_tokens_a") == 3L)
    assert(r.getAs[Long]("n_tokens_b") == 4L)
    assert(r.getAs[Long]("n_terms") == 2L)
    def h(p: Double, q: Double) = {
      val m = 0.5 * (p + q)
      0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    }
    val want = h(2.0 / 3, 1.0 / 4) + h(1.0 / 3, 3.0 / 4)
    assert(math.abs(r.getAs[Double]("jsd_nats") - want) < 1e-6)
  }

  test("jsDivergence: one empty side masks to NULL") {
    val df = Seq(("en", "a b")).toDF("lang", "text")
    val r = TextAnalysis.jsDivergence(df, "text", col("lang") === "en")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("jsd_nats")))
  }

  test("friedman: tie-corrected chi2 on a hand case") {
    // values: u1 (0,1,2), u2 (2,1,0), u3 (0,0,5)
    // doubled ranks: (2,4,6), (6,4,2), (3,3,6)
    // U=(11,11,14), sumU2=438, uu=166 -> chi2 = 2*(438-432)/(166-144)=12/22
    val rows =
      Seq.fill(1)(("u1", 1)) ++ Seq.fill(2)(("u1", 2)) ++
      Seq.fill(2)(("u2", 0)) ++ Seq.fill(1)(("u2", 1)) ++
      Seq.fill(5)(("u3", 2))
    val df = rows.toDF("u", "t")
    val r = Stats.friedman(df, "u",
      Seq(col("t") === 0, col("t") === 1, col("t") === 2)).collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(math.abs(r.getAs[Double]("chi2_f") - 12.0 / 22.0) < 1e-6)
    assert(r.getAs[Long]("df") == 2L)
  }

  test("friedman: all-tied blocks mask to NULL") {
    // every unit has equal counts across treatments -> uu = nk(k+1)^2
    val df = Seq(("u1", 0), ("u1", 1), ("u2", 0), ("u2", 1))
      .toDF("u", "t")
    val r = Stats.friedman(df, "u", Seq(col("t") === 0, col("t") === 1))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_f")))
  }

  test("anovaF: hand-computed equal-variance F") {
    // a [1,2,3], b [5,7,9]: num=37.5, den=10, F = 4*3.75 = 15
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 7L), ("b", 9L)).toDF("g", "x")
    val r = Stats.anovaF(df, "g", col("x")).collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Double]("f_stat") == 15.0)
    assert(r.getAs[Long]("df1") == 1L)
    assert(r.getAs[Long]("df2") == 4L)
  }

  test("anovaF: zero within-group variance masks to NULL") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("g", "x")
    val r = Stats.anovaF(df, "g", col("x")).collect().head
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  test("cochranQ: hand-computed Q on the 4x3 matrix") {
    // rows: (1,1,0) (1,0,0) (1,1,1) (0,0,0) -> C=(3,2,1) N=6 sumR2=14
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3
    val df = Seq(("u1", 1, 1, 0), ("u2", 1, 0, 0), ("u3", 1, 1, 1),
      ("u4", 0, 0, 0)).toDF("u", "t0", "t1", "t2")
    val r = Stats.cochranQ(df, "u",
      Seq(col("t0") === 1, col("t1") === 1, col("t2") === 1)).collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_units") == 4L)
    assert(r.getAs[Double]("q_stat") == 3.0)
    assert(r.getAs[Long]("df") == 2L)
  }

  test("cochranQ: all-concordant rows mask to NULL") {
    // R_i in {k, 0} for every unit -> denominator exactly 0
    val df = Seq(("u1", 1, 1, 1), ("u2", 0, 0, 0)).toDF("u", "t0", "t1", "t2")
    val r = Stats.cochranQ(df, "u",
      Seq(col("t0") === 1, col("t1") === 1, col("t2") === 1)).collect().head
    assert(r.isNullAt(r.fieldIndex("q_stat")))
  }

  test("alwaysValidP: mixture log-ratio matches the closed form; " +
      "degenerate days mask") {
    val parities = (1L to 20L).toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id"), 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val treat = (1L to 20L).filter(parities(_) == 1L).take(2)
    val ctrl = (1L to 20L).filter(parities(_) == 0L).take(2)
    // day 1: all clicks (zero conversions -> NULL ll); day 2: one
    // treated purchase; day 3: one control purchase
    val rows =
      (treat ++ ctrl).map(u => (u, ts(1), "click")) ++
      Seq((treat(0), ts(2), "purchase"), (ctrl(0), ts(2), "click")) ++
      Seq((ctrl(1), ts(3), "purchase"))
    val got = Stats.alwaysValidP(rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", col("event_type") === "purchase")
      .collect().sortBy(_.getTimestamp(0).getTime)
    def ll(nt: Long, st: Long, nc: Long, sc: Long): Double = {
      val p = (st + sc).toDouble / (nt + nc).toDouble
      val z = st.toDouble / nt - sc.toDouble / nc
      val v = p * (1 - p) * (1.0 / nt + 1.0 / nc)
      0.5 * math.log(v / (v + 0.01)) + z * z * 0.01 / (2 * v * (v + 0.01))
    }
    assert(got.length == 3)
    assert(got(0).isNullAt(got(0).fieldIndex("log_lambda")))
    assert(got(0).isNullAt(got(0).fieldIndex("neg_log_p")))
    val l2 = ll(3, 1, 3, 0); val l3 = ll(3, 1, 4, 1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1).getAs[Double]("log_lambda") - r6(l2)) < 1e-9)
    assert(math.abs(got(2).getAs[Double]("log_lambda") - r6(l3)) < 1e-9)
    assert(math.abs(got(2).getAs[Double]("neg_log_p") -
      r6(math.max(0.0, math.max(l2, l3)))) < 1e-9)
  }

  test("labelPropagation: synchronous rounds with the min tie-break") {
    // path 1-2-3-4, both orientations
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val r1 = Graph.labelPropagation(e, "src", "dst", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    val r2 = Graph.labelPropagation(e, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L))
  }
}
