package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interval sweep, heavy hitters, rolling windows, snapshot diff,
  * transitions, winsorize, vocab: hand-computable fixtures pinning
  * each round-5 operator's semantics (the sf0.01 DuckDB oracle covers
  * them at scale).
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Intervals -----------------------------------------------------

  test("peakConcurrency counts overlapping intervals, half-open ends") {
    val iv = Seq(
      // g1: 3 overlap during [10:10, 10:20)
      ("g1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      ("g1", ts("2024-01-01 10:05:00"), ts("2024-01-01 10:20:00")),
      ("g1", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:40:00")),
      ("g1", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:10:00")),
      // g2: touching intervals never overlap (end == next start)
      ("g2", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00")),
      ("g2", ts("2024-01-01 09:30:00"), ts("2024-01-01 10:00:00"))
    ).toDF("g", "s", "e")
    val got = Intervals.peakConcurrency(iv, "g", "s", "e")
      .orderBy("g").as[(String, Long, Timestamp)].collect()
    got shouldBe Array(
      ("g1", 3L, ts("2024-01-01 10:10:00")),
      ("g2", 1L, ts("2024-01-01 09:00:00")))
  }

  test("concurrencyTimeline gives tied boundaries one deterministic value") {
    // two intervals starting at the SAME instant: both +1 rows share the
    // same (ts, delta) order key, so the RANGE frame must give both rows
    // the post-both concurrency (2), not an arbitrary 1-then-2
    val iv = Seq(
      ("g", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      ("g", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"))
    ).toDF("g", "s", "e")
    val starts = Intervals.concurrencyTimeline(iv, "g", "s", "e")
      .filter(col("delta") === 1).select("concurrency").as[Long].collect()
    starts shouldBe Array(2L, 2L)
  }

  // ---- Frequency (Misra-Gries) ---------------------------------------

  test("heavyHitters returns exact counts above the share threshold") {
    // 100 rows: a=40, b=25, c=20, d..m = 15 singletons + noise
    val rows = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(20)("c") ++
      (1 to 15).map(i => s"noise_$i")
    val df = rows.toDF("v").repartition(7) // force multi-partition merge
    val got = Frequency.heavyHitters(df, "v", minShare = 0.18)
      .orderBy(col("n_rows").desc).as[(String, Long, Double)].collect()
    got shouldBe Array(("a", 40L, 0.4), ("b", 25L, 0.25), ("c", 20L, 0.2))
  }

  test("MG guarantee: a just-above-threshold item survives heavy noise") {
    // n = 1000, minShare 0.02 -> k = 50; item "hot" has 21 > 20 = n/50
    // among 979 distinct noise values that each hit the sketch once
    val rows = Seq.fill(21)("hot") ++ (1 to 979).map(i => s"n$i")
    val df = rows.toDF("v").repartition(13)
    val got = Frequency.heavyHitters(df, "v", minShare = 0.02)
      .as[(String, Long, Double)].collect()
    got shouldBe Array(("hot", 21L, 0.021))
  }

  test("MisraGriesAgg merge keeps the k-counter bound") {
    val agg = new Frequency.MisraGriesAgg(3)
    val a = Map("x" -> 5L, "y" -> 4L, "z" -> 3L)
    val b = Map("p" -> 6L, "q" -> 2L, "x" -> 1L)
    val m = agg.merge(a, b)
    m.size should be <= 3
    // combined = {x:6, y:4, z:3, p:6, q:2}; cut = 4th-largest = 3;
    // subtract-and-drop leaves the strongest counters only
    m shouldBe Map("x" -> 3L, "p" -> 3L, "y" -> 1L)
  }

  // ---- TimeSeries.trailingDaily --------------------------------------

  test("trailingDaily sums only days inside the range frame") {
    val df = Seq(
      ("k", ts("2024-01-01 08:00:00")), ("k", ts("2024-01-01 09:00:00")),
      ("k", ts("2024-01-03 08:00:00")),
      ("k", ts("2024-01-20 08:00:00")) // far outside any 7-day window
    ).toDF("k", "t")
    val got = TimeSeries.trailingDaily(df, "k", "t", days = 7)
      .orderBy("day")
      .select("n_events", "n_trailing", "days_active_trailing")
      .as[(Long, Long, Long)].collect()
    got shouldBe Array((2L, 2L, 1L), (1L, 3L, 2L), (1L, 1L, 1L))
  }

  // ---- Cdc.snapshotDiff ----------------------------------------------

  test("snapshotDiff classifies added/removed/changed, skips unchanged") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    val neu = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("k", "s", "x")
    val got = Cdc.snapshotDiff(old, neu, "k")
      .orderBy("k")
      .select("k", "change_type", "old_s", "new_s")
      .as[(Long, String, Option[String], Option[String])].collect()
    got shouldBe Array(
      (2L, "changed", Some("b"), Some("B")),
      (3L, "removed", Some("c"), None),
      (4L, "added", None, Some("d")))
  }

  test("snapshotDiff change test is null-safe per column") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("v"))).toDF("k", "s")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val got = Cdc.snapshotDiff(old, neu, "k")
      .select("k", "change_type").as[(Long, String)].collect()
    got shouldBe Array((2L, "changed")) // null == null is NOT a change
  }

  // ---- Funnel.transitions --------------------------------------------

  test("transitions order by (ts, tie) and normalize per from-state") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 10:00:00"), 5L, "buy") // tie: event_id orders view->buy
    ).toDF("user_id", "t", "event_id", "et")
    val got = Funnel.transitions(events, "user_id", "t", "et", "event_id")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect()
    got shouldBe Array(
      ("click", "view", 1L, 1.0),
      ("view", "buy", 1L, 0.5),
      ("view", "click", 1L, 0.5))
  }

  // ---- Outliers.winsorize --------------------------------------------

  test("winsorize clamps to the discrete p-quantile values") {
    // 1..20: p05 -> rn ceil(1)=1 -> value 1; p95 -> rn ceil(19)=19
    val df = (1 to 20).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val got = Outliers.winsorize(df, "g", "id", "v", 0.05, 0.95)
      .orderBy("id").select("clipped").as[Double].collect()
    got.head shouldBe 1.0   // rank-1 value is its own floor
    got(18) shouldBe 19.0
    got.last shouldBe 19.0  // 20 clamps down to the p95 value
    got(9) shouldBe 10.0    // interior values untouched
  }

  // ---- Sampling.capPerGroup / balanceClasses -------------------------

  test("capPerGroup is order- and partitioning-independent") {
    val df = (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "k")
    val a = Sampling.capPerGroup(df.repartition(1), "g", "k", 10)
      .orderBy("g", "k").as[(String, Long)].collect()
    val b = Sampling.capPerGroup(df.repartition(17, col("k")), "g", "k", 10)
      .orderBy("g", "k").as[(String, Long)].collect()
    a shouldBe b
    a.groupBy(_._1).values.foreach(_.length shouldBe 10)
  }

  test("balanceClasses downsamples every class to the smallest") {
    val df = ((1 to 30).map(i => ("big", i.toLong)) ++
      (31 to 37).map(i => ("small", i.toLong))).toDF("label", "k")
    val got = Sampling.balanceClasses(df, "label", "k")
      .groupBy("label").count().as[(String, Long)].collect().toMap
    got shouldBe Map("big" -> 7L, "small" -> 7L)
  }

  // ---- TextAnalysis.hashFeatures -------------------------------------

  test("hashFeatures preserves token mass and respects the bucket bound") {
    val docs = Seq((1L, "a b c a"), (2L, "b b")).toDF("doc_id", "text")
    val got = TextAnalysis.hashFeatures(docs, "doc_id", "text", 8)
    got.agg(sum("n")).as[Long].head() shouldBe 6L // 4 + 2 tokens
    got.select("bucket").as[Long].collect().foreach { b =>
      b should (be >= 0L and be < 8L)
    }
    // identical tokens hash identically: doc 2's two b's share one bucket row
    got.filter(col("doc_id") === 2).count() shouldBe 1L
  }

  // ---- Similarity.labelCentroids -------------------------------------

  test("labelCentroids averages per dimension with exact integer sums") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 2.0f)),
      (2L, 0, Seq(3.0f, 6.0f)),
      (3L, 1, Seq(10.0f, 20.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelCentroids(df, "label", "embedding")
      .orderBy("label", "dim")
      .select("label", "dim", "centroid", "n_vectors")
      .as[(Int, Long, Double, Long)].collect()
    got shouldBe Array(
      (0, 0L, 2.0, 2L), (0, 1L, 4.0, 2L),
      (1, 0L, 10.0, 1L), (1, 1L, 20.0, 1L))
  }

  // ---- Validator.unionEvolved ----------------------------------------

  test("unionEvolved null-fills by name across schema versions") {
    import graft.validate.Validator
    val v1 = Seq((1L, "a")).toDF("id", "x")
    val v2 = Seq((2L, 9.5)).toDF("id", "y")
    val got = Validator.unionEvolved(Seq(v1, v2)).orderBy("id")
    got.columns shouldBe Array("id", "x", "y")
    got.as[(Long, Option[String], Option[Double])].collect() shouldBe
      Array((1L, Some("a"), None), (2L, None, Some(9.5)))
  }

  // ---- Agg: orderedStringAgg / modeByGroup / pearsonFromIntegers -----

  test("orderedStringAgg renders a canonical sorted join, any partitioning") {
    val df = Seq(("g", "b"), ("g", "c"), ("g", "a"), ("h", "z")).toDF("g", "v")
    val got = Agg.orderedStringAgg(df.repartition(5), "g", "v")
      .orderBy("g").as[(String, Long, String)].collect()
    got shouldBe Array(("g", 3L, "a,b,c"), ("h", 1L, "z"))
  }

  test("modeByGroup breaks count ties by smallest value") {
    val df = Seq(("u", "x"), ("u", "x"), ("u", "a"), ("u", "a"), ("u", "z"))
      .toDF("g", "v")
    Agg.modeByGroup(df, "g", "v").as[(String, String, Long)].collect() shouldBe
      Array(("u", "a", 2L)) // a and x tie at 2; a < x
  }

  test("pearsonFromIntegers matches the closed form on a known series") {
    // y = 2x exactly -> r = 1; anti-correlated pair -> r = -1
    val df = ((1 to 10).map(i => ("pos", i.toLong, 2L * i)) ++
      (1 to 10).map(i => ("neg", i.toLong, -3L * i))).toDF("g", "x", "y")
    val got = Agg.pearsonFromIntegers(df, "g", col("x"), col("y"))
      .orderBy("g").as[(String, Long, Double)].collect()
    got shouldBe Array(("neg", 10L, -1.0), ("pos", 10L, 1.0))
  }

  test("editDistancePairs: bucketed join emits each pair exactly once") {
    // lengths straddle a bucket boundary (w = 3): "abcdef" (6, bucket 2)
    // vs "abcdefg" (7, bucket 2) vs "abcdefghi" (9, bucket 3)
    val df = Seq((1L, "abcdef", "B"), (2L, "abcdefg", "B"), (3L, "abcdefghi", "B"),
      (4L, "zzzzzz", "B")).toDF("id", "t", "blk")
    val got = Dedup.editDistancePairs(df, "id", "t", "blk", maxDist = 2)
      .orderBy("a_id", "b_id").as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 2L, 1L), (2L, 3L, 2L)) // no dups, no (1,3): dist 3
  }

  // ---- Cdc.latestPerKey / Funnel.topPaths / TimeSeries tw-avg, wow ---

  test("latestPerKey keeps one row per key, ties broken by tie column desc") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 11:00:00"), 3L, "c"), // same ts, higher tie wins
      (2L, ts("2024-01-01 09:00:00"), 4L, "d")
    ).toDF("k", "t", "id", "v")
    val got = Cdc.latestPerKey(df, "k", "t", "id")
      .orderBy("k").select("k", "v").as[(Long, String)].collect()
    got shouldBe Array((1L, "c"), (2L, "d"))
  }

  test("topPaths bounds per-user state via WindowGroupLimit before the collect") {
    // > k rows: InferWindowGroupLimit skips children whose maxRows
    // already bound the partition below the limit
    val df = (1 to 5).map(i =>
      (1L, ts(f"2024-01-01 10:0$i%d:00"), i.toLong, "view")).toDF("u", "t", "id", "et")
    // the rank filter must plan as a group-limit (bounded k-heap per
    // user while scanning), not a full per-user sort + slice-after-agg
    val plan = Funnel.topPaths(df, "u", "t", "et", "id", k = 3)
      .queryExecution.optimizedPlan.toString
    plan should include ("WindowGroupLimit")
  }

  test("topPaths renders time-ordered truncated journeys") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "purchase"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "view"), // beyond k=3: ignored
      (2L, ts("2024-01-01 10:00:00"), 5L, "view")  // truncated user: 1-step path
    ).toDF("u", "t", "id", "et")
    val got = Funnel.topPaths(df, "u", "t", "et", "id", k = 3)
      .orderBy("path").as[(String, Long)].collect()
    got shouldBe Array(("view", 1L), ("view>click>purchase", 1L))
  }

  test("timeWeightedAvg weights by held seconds; last observation open") {
    // u1: 100 cents held 60 s, then 400 cents held 180 s, last event open
    // tw = (100*60 + 400*180) / 100.0 / 240 = 3.25
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.00),
      (1L, ts("2024-01-01 10:01:00"), 2L, 4.00),
      (1L, ts("2024-01-01 10:04:00"), 3L, 9.99)
    ).toDF("u", "t", "id", "v")
    val got = TimeSeries.timeWeightedAvg(df, "u", "t", round(col("v") * 100), "id")
      .as[(Long, Long, Long, Double)].collect()
    got shouldBe Array((1L, 2L, 240L, 3.25))
  }

  test("timeWeightedAvg masks tw_avg to NULL when all intervals are zero-length") {
    // three samples on the SAME floor second: every interval is 0 s,
    // held_seconds = 0 -> tw_avg NULL, never Infinity/NaN
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 1.00),
      (1L, ts("2024-01-01 10:00:00"), 2L, 4.00),
      (1L, ts("2024-01-01 10:00:00"), 3L, 9.00)
    ).toDF("u", "t", "id", "v")
    val got = TimeSeries.timeWeightedAvg(df, "u", "t", round(col("v") * 100), "id")
      .collect()
    got.length shouldBe 1
    got.head.getLong(2) shouldBe 0L
    got.head.isNullAt(3) shouldBe true
  }

  test("weekOverWeek computes pct change with a null first period") {
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-02 10:00:00")),
      ("a", ts("2024-01-08 10:00:00")), ("a", ts("2024-01-09 10:00:00")),
      ("a", ts("2024-01-10 10:00:00"))
    ).toDF("k", "t")
    val got = TimeSeries.weekOverWeek(df, "k", "t")
      .orderBy("week").select("n", "prev_n", "pct_change")
      .as[(Long, Option[Long], Option[Double])].collect()
    got shouldBe Array((2L, None, None), (3L, Some(2L), Some(0.5)))
  }

  // ---- TextAnalysis.tokenDistributionShift ---------------------------

  test("tokenDistributionShift: uniform groups, zero KL when matching corpus") {
    // both groups have the same 50/50 {a,b} distribution -> corpus is
    // also 50/50 -> KL = 0 for both; entropy = ln 2
    val docs = Seq(("s1", "a b a b"), ("s2", "b a")).toDF("source", "text")
    val got = TextAnalysis.tokenDistributionShift(docs, "text", "source")
      .orderBy("source")
      .select("source", "n_tokens", "n_terms", "entropy", "kl_vs_corpus")
      .as[(String, Long, Long, Double, Double)].collect()
    got shouldBe Array(
      ("s1", 4L, 2L, BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0),
      ("s2", 2L, 2L, BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0))
  }

  test("tokenDistributionShift: divergence from the corpus mix is positive and ordered") {
    // corpus mix = 11a + 3b (a-heavy). The group NEAR the mix (9a,1b)
    // diverges less than the 50/50 group — KL is vs the corpus, not
    // vs uniform.
    val docs = Seq(("near", "a a a a a a a a a b"), ("far", "a b a b")).toDF("source", "text")
    val got = TextAnalysis.tokenDistributionShift(docs, "text", "source")
      .select("source", "kl_vs_corpus").as[(String, Double)].collect().toMap
    got("near") should be > 0.0
    got("far") should be > got("near")
  }

  // ---- Outliers.madOutliers / imputeMedian ---------------------------

  test("madOutliers flags by k*MAD around the discrete median") {
    // group: 1..9 plus a wild 100. n=10 -> median rank ceil(5)=5 -> 5.0
    // adevs sorted: 0,1,1,2,2,3,3,4,4,95 -> MAD rank 5 -> 2.0; cutoff 7.0
    val df = ((1 to 9).map(i => ("g", i.toLong, i.toDouble)) :+ ("g", 10L, 100.0))
      .toDF("g", "id", "v")
    val got = Outliers.madOutliers(df, "g", "id", "v")
      .select("id", "v", "med", "mad").as[(Long, Double, Double, Double)].collect()
    got shouldBe Array((10L, 100.0, 5.0, 2.0))
  }

  test("imputeMedian passes through groups whose values are ALL null") {
    val df = Seq(("g", 1L, Option.empty[Double]), ("g", 2L, Option.empty[Double]),
      ("h", 3L, Some(5.0))).toDF("g", "id", "v")
    val got = Outliers.imputeMedian(df, "g", "id", "v")
      .orderBy("id").select("id", "imputed").as[(Long, Option[Double])].collect()
    // g's rows survive with a null imputed value — a repair op must
    // never silently drop rows
    got shouldBe Array((1L, None), (2L, None), (3L, Some(5.0)))
  }

  test("imputeMedian passes through rows whose GROUP key is null, unrepaired") {
    val df = Seq((Some("g"), 1L, Some(1.0)), (Some("g"), 2L, None),
      (Option.empty[String], 3L, Some(7.0)), (Option.empty[String], 4L, None))
      .toDF("g", "id", "v")
    val got = Outliers.imputeMedian(df, "g", "id", "v")
      .orderBy("id").select("id", "imputed").as[(Long, Option[Double])].collect()
    // null-group rows survive: value kept as-is (no median frame to
    // match), null value stays null — never silently dropped
    got shouldBe Array((1L, Some(1.0)), (2L, Some(1.0)), (3L, Some(7.0)), (4L, None))
  }

  test("capPerGroup drops null keys instead of ranking them nondeterministically") {
    val df = Seq(("g", Some(1L)), ("g", None), ("g", Some(2L)), ("g", None))
      .toDF("g", "k")
    Sampling.capPerGroup(df, "g", "k", 3).count() shouldBe 2L
  }

  test("orderedStringAgg orders numerics naturally, not lexicographically") {
    val df = Seq(("g", 10L), ("g", 2L), ("g", -3L)).toDF("g", "n")
    Agg.orderedStringAgg(df, "g", "n")
      .select("joined").as[String].head() shouldBe "-3,2,10"
  }

  test("heavyHitters is fully lazy: the sketch lives IN the plan, not in baked literals") {
    var built = false
    val hh = Frequency.heavyHitters(
      Seq.fill(9)("a").toDF("v"), "v", 0.5)
    built = true // construction returned without running a job (no head())
    // the MG aggregate is part of the returned plan — candidates/total
    // come from the same execution as the verification counts, never
    // from driver-side literals frozen at build time
    val plan = hh.queryExecution.analyzed.toString.toLowerCase
    plan should include ("misragriesagg")
    hh.as[(String, Long, Double)].collect() shouldBe Array(("a", 9L, 1.0))
  }

  test("imputeMedian fills nulls with the group median, passes the rest") {
    val df = Seq(("g", 1L, Some(1.0)), ("g", 2L, Some(2.0)), ("g", 3L, Some(9.0)),
      ("g", 4L, None)).toDF("g", "id", "v")
    val got = Outliers.imputeMedian(df, "g", "id", "v")
      .orderBy("id").select("id", "imputed").as[(Long, Double)].collect()
    got shouldBe Array((1L, 1.0), (2L, 2.0), (3L, 9.0), (4L, 2.0))
  }

  // ---- TextAnalysis.buildVocab ---------------------------------------

  test("buildVocab ranks by doc_freq desc then term, with dense ids") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana apple")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.buildVocab(docs, "doc_id", "text", 2)
      .as[(Long, String, Long, Long)].collect()
    // banana df=3; apple df=2 tf=3; cherry df=1 cut by topN=2
    got shouldBe Array((0L, "banana", 3L, 3L), (1L, "apple", 2L, 3L))
  }
}
