package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Funnel, retention, gap-fill, SCD2, merge, outliers, histogram,
  * edit-distance: hand-computable fixtures pinning each operator's
  * semantics (the sf0.01 DuckDB oracle covers them at scale).
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel counts only in-order stage completions") {
    // u1 completes all 3 in order; u2 clicks BEFORE viewing (click must
    // not count); u3 views only.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .orderBy("stage").select("stage_name", "users").as[(String, Long)].collect()
    got shouldBe Array(("view", 3L), ("click", 1L), ("purchase", 1L))
  }

  test("funnel honors strict ordering within a stage chain") {
    // click exists but only before the first view → stage 2 zero
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.stageTimes(events, "user_id", "ts", "event_type",
      Seq("view", "click")).select("t1").as[Option[Timestamp]].collect()
    got shouldBe Array(None)
  }

  test("weeklyRetention: offsets are exact weeks from the cohort week") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Mon wk0
      (1L, ts("2024-01-10 10:00:00")), // wk1
      (2L, ts("2024-01-03 10:00:00")), // wk0 cohort
      (2L, ts("2024-01-17 10:00:00"))  // wk2
    ).toDF("user_id", "ts")
    val got = Funnel.weeklyRetention(events, "user_id", "ts")
      .orderBy("week_offset")
      .select("week_offset", "active_users", "cohort_users", "retention")
      .as[(Long, Long, Long, Double)].collect()
    got shouldBe Array((0L, 2L, 2L, 1.0), (1L, 1L, 2L, 0.5), (2L, 1L, 2L, 0.5))
  }

  test("gapFillDaily fills calendar holes with zero and carries last_active_day") {
    val events = Seq(
      (1L, ts("2024-03-01 05:00:00")),
      (1L, ts("2024-03-01 07:00:00")),
      (1L, ts("2024-03-04 09:00:00"))
    ).toDF("user_id", "ts")
    val got = TimeSeries.gapFillDaily(events, "user_id", "ts")
      .orderBy("day")
      .select(date_format(col("day"), "MM-dd"), col("n_events"),
        date_format(col("last_active_day"), "MM-dd"))
      .as[(String, Long, String)].collect()
    got shouldBe Array(
      ("03-01", 2L, "03-01"), ("03-02", 0L, "03-01"),
      ("03-03", 0L, "03-01"), ("03-04", 1L, "03-04"))
  }

  test("scd2 collapses runs and versions attribute changes") {
    val events = Seq(
      (1L, "free", ts("2024-01-01 00:00:00"), 1L),
      (1L, "free", ts("2024-01-02 00:00:00"), 2L), // same run — collapsed
      (1L, "pro", ts("2024-01-05 00:00:00"), 3L),
      (1L, "free", ts("2024-01-09 00:00:00"), 4L) // back to free = NEW version
    ).toDF("user_id", "plan", "ts", "event_id")
    val got = Cdc.scd2(events, "user_id", "plan", "ts", "event_id")
      .orderBy("valid_from")
      .select(col("attr"), date_format(col("valid_from"), "MM-dd"),
        date_format(col("valid_to"), "MM-dd"), col("is_current"))
      .as[(String, String, Option[String], Boolean)].collect()
    got shouldBe Array(
      ("free", "01-01", Some("01-05"), false),
      ("pro", "01-05", Some("01-09"), false),
      ("free", "01-09", None, true))
  }

  test("mergeUpsert applies U/I and drops D without touching other rows") {
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "v", "s")
    val changes = Seq(
      (2L, 99.0, "b2", "U"), (3L, 30.0, "c", "D"), (4L, 40.0, "d", "I"))
      .toDF("k", "v", "s", "op")
    val got = Cdc.mergeUpsert(base, changes, "k").orderBy("k")
      .as[(Long, Double, String)].collect()
    got shouldBe Array((1L, 10.0, "a"), (2L, 99.0, "b2"), (4L, 40.0, "d"))
  }

  test("iqrOutliers flags exactly the points beyond the discrete-quantile fences") {
    // group g: values 1..8 plus a wild 100 → p25 = v[ceil(9*.25)=3] = 3,
    // p75 = v[ceil(9*.75)=7] = 7, iqr 4 → fences [-3, 13] → only 100 out
    val df = ((1 to 8).map(i => ("g", i.toLong, i.toDouble)) :+ ("g", 9L, 100.0))
      .toDF("grp", "id", "v")
    val got = Outliers.iqrOutliers(df, "grp", "id", "v")
      .select("id", "v", "lo", "hi").as[(Long, Double, Double, Double)].collect()
    got shouldBe Array((9L, 100.0, -3.0, 13.0))
  }

  test("histogram buckets by fixed bounds and clamps the edges") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 250.0).toDF("v")
    val got = Profile.histogram(df, "v", lo = 0.0, hi = 100.0, buckets = 10)
      .orderBy("bucket").select("bucket", "n", "bucket_lo", "bucket_hi")
      .as[(Long, Long, Double, Double)].collect()
    got shouldBe Array(
      (0L, 3L, 0.0, 10.0),  // -5 clamps up; 0.0 and 9.9 in-bucket
      (1L, 1L, 10.0, 20.0),
      (5L, 1L, 50.0, 60.0),
      (9L, 2L, 90.0, 100.0)) // 99.9 in-bucket; 250 clamps down
  }

  test("editDistancePairs never crosses blocks and bounds the distance") {
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "sittin", "b1"),
      (4L, "kitten", "b2") // same text, other block — must NOT pair with 1
    ).toDF("id", "name", "blk")
    val got = Dedup.editDistancePairs(df, "id", "name", "blk", maxDist = 1)
      .orderBy("a_id", "b_id").as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 2L, 1L), (2L, 3L, 1L))
  }

  test("interEventRegularity: metronome flags bot, bursty human does not") {
    // bot: exactly every 60 s (cv2 = 0); human: gaps 10, 600, 30, 3600 s;
    // burst: 5 events in the same second (mean gap 0 -> NULL cv2, flagged)
    val bot = (0 until 6).map(i => (1L, ts(s"2024-01-01 10:0${i}:00")))
    val human = Seq(0, 10, 610, 640, 4240).map(s =>
      (2L, new Timestamp(ts("2024-01-01 10:00:00").getTime + s * 1000L)))
    val burst = (0 until 5).map(_ => (3L, ts("2024-01-01 10:00:00")))
    val df = (bot ++ human ++ burst).toDF("user_id", "ts")
    val got = TimeSeries.interEventRegularity(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(4)))).toMap
    got(1L)._1 shouldBe 6L
    got(1L)._2 shouldBe 60.0
    got(1L)._3 shouldBe true // cv2 exactly 0
    got(2L)._3 shouldBe false // bursty gaps, cv2 >> 0.09
    got(3L)._2 shouldBe 0.0
    got(3L)._3 shouldBe true // same-second dump
    // below-min-events actors are absent entirely
    val small = Seq((9L, ts("2024-01-01 10:00:00")), (9L, ts("2024-01-01 11:00:00")))
      .toDF("user_id", "ts")
    TimeSeries.interEventRegularity(small, "user_id", "ts").count() shouldBe 0L
  }

  test("templateDuplicateGroups: digit variants collapse, word order does not") {
    val df = Seq(
      (1L, "Order #123 shipped  on 2024-01-05"),
      (2L, "order #9 SHIPPED on 1999-12-31"),
      (3L, "shipped order #9 on 1999-12-31"), // reordered -> different template
      (4L, "unrelated text")
    ).toDF("doc_id", "text")
    val got = Dedup.templateDuplicateGroups(df, "doc_id", "text").collect()
    got.length shouldBe 1
    got(0).getLong(1) shouldBe 2L
    got(0).getLong(2) shouldBe 1L // canonical = smallest id
  }

  test("cusumDrift: level shift peaks at the shift's last day; flat series drifts 0") {
    // series "shift": 5 days at 10/day then 5 days at 30/day. n=10,
    // sx=200, contributions 10*x-200: -100 x5 then +100 x5; prefix
    // runs -100..-500 then -400..0; drift = p - min(p,0) peaks at the
    // final day with 500. Flat series: all contributions 0.
    val shift = (1 to 10).flatMap { d =>
      val n = if (d <= 5) 10 else 30
      (0 until n).map(_ => ("shift", ts(f"2024-01-$d%02d 09:00:00")))
    }
    val flat = (1 to 4).flatMap(d =>
      (0 until 7).map(_ => ("flat", ts(f"2024-02-$d%02d 09:00:00"))))
    val got = TimeSeries.cusumDrift((shift ++ flat).toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getTimestamp(3)))).toMap
    got("shift")._1 shouldBe 10L
    got("shift")._2 shouldBe 500L
    got("shift")._3 shouldBe ts("2024-01-10 00:00:00")
    got("flat")._2 shouldBe 0L
    got("flat")._3 shouldBe ts("2024-02-01 00:00:00") // first day on ties
  }

  test("weekdayProfile: shares sum to ~1e6 per series, peak flagged once") {
    // 2024-01-07 is a Sunday (dow 0); plant 3 Sundays, 1 Monday
    val rows = Seq(
      ("a", ts("2024-01-07 10:00:00")), ("a", ts("2024-01-14 10:00:00")),
      ("a", ts("2024-01-21 10:00:00")), ("a", ts("2024-01-08 10:00:00")))
    val got = TimeSeries.weekdayProfile(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    got(0) shouldBe ((3L, 750000L, true))
    got(1) shouldBe ((1L, 250000L, false))
  }

  test("markovEntropyRate is 0 for a deterministic chain") {
    // A->B->A->B: every state has exactly one successor
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 1L),
      (1L, ts("2024-01-01 10:01:00"), "B", 2L),
      (1L, ts("2024-01-01 10:02:00"), "A", 3L),
      (1L, ts("2024-01-01 10:03:00"), "B", 4L)
    ).toDF("u", "t", "e", "id")
    val got = Funnel.markovEntropyRate(df, "u", "t", "e", "id").collect().head
    got.getLong(0) shouldBe 3L
    got.getLong(1) shouldBe 2L
    got.getDouble(2) shouldBe 0.0
  }

  test("markovEntropyRate matches the hand-computed plug-in estimate") {
    // A,A,A,B: cells (A,A)=2 (A,B)=1, row total A=3, N=3
    // H = (2/3)ln(3/2) + (1/3)ln(3)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 1L),
      (1L, ts("2024-01-01 10:01:00"), "A", 2L),
      (1L, ts("2024-01-01 10:02:00"), "A", 3L),
      (1L, ts("2024-01-01 10:03:00"), "B", 4L)
    ).toDF("u", "t", "e", "id")
    val got = Funnel.markovEntropyRate(df, "u", "t", "e", "id").collect().head
    got.getLong(0) shouldBe 3L
    got.getLong(1) shouldBe 1L // only A has outgoing transitions
    val h = (2.0 / 3) * math.log(3.0 / 2) + (1.0 / 3) * math.log(3.0)
    got.getDouble(2) shouldBe BigDecimal(h)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("mannKendall computes exact S and tie-corrected z") {
    // s1 counts (1,2,3): S = 3, var18 = 66, z = 2/sqrt(66/18)
    // s2 constant (2,2): S = 0 -> NULL
    val rows =
      Seq.fill(1)(("s1", ts("2024-01-01 10:00:00"))) ++
        Seq.fill(2)(("s1", ts("2024-01-02 10:00:00"))) ++
        Seq.fill(3)(("s1", ts("2024-01-03 10:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-01 10:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-02 10:00:00")))
    val got = TimeSeries.mannKendall(rows.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    got("s1").getLong(2) shouldBe 3L
    got("s1").getDouble(3) shouldBe (3.0 - 1.0) / math.sqrt(66.0 / 18.0)
    got("s2").getLong(2) shouldBe 0L
    got("s2").isNullAt(3) shouldBe true
  }

  test("conversionWindows breaks conversions down by gap window") {
    // u1 converts in 30s; u2 never; u3 converts in 2h (pre-view
    // purchase ignored); u4 has no view -> not eligible
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:00:30"), "purchase", 2L),
      (2L, ts("2024-01-01 11:00:00"), "view", 3L),
      (3L, ts("2024-01-01 09:00:00"), "purchase", 4L),
      (3L, ts("2024-01-01 12:00:00"), "view", 5L),
      (3L, ts("2024-01-01 14:00:00"), "purchase", 6L),
      (4L, ts("2024-01-01 15:00:00"), "purchase", 7L)
    ).toDF("u", "t", "e", "id")
    val got = Funnel.conversionWindows(df, "u", "t", "e", "id",
      "view", "purchase").collect().head
    got.getLong(0) shouldBe 3L
    got.getLong(1) shouldBe 2L
    got.getLong(2) shouldBe 666666L
    got.getLong(3) shouldBe 333333L  // 1m: only u1
    got.getLong(4) shouldBe 333333L  // 1h: only u1
    got.getLong(5) shouldBe 666666L  // 1d: u1 + u3
  }

  test("seasonalNaiveError scores a pure weekly pattern as mase 0") {
    // 14 days of [5,1,1,1,1,1,1] twice: lag-7 errors all 0
    val rows = (0 until 14).flatMap { d =>
      val n = if (d % 7 == 0) 5 else 1
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      Seq.fill(n)(("s", ts(s"$day 10:00:00")))
    }
    val got = TimeSeries.seasonalNaiveError(rows.toDF("g", "t"), "g", "t")
      .collect().head
    got.getLong(1) shouldBe 14L
    got.getDouble(2) shouldBe 12.0 / 13.0 // mae_naive
    got.getDouble(3) shouldBe 0.0         // mae_seasonal
    got.getDouble(4) shouldBe 0.0         // mase
  }

  test("dowAnomalies flags only beyond-3-sigma days via integer cross-mult") {
    // 13 Sundays: twelve 5s and one 50 -> lhs 540²·12 = 3499200 >
    // rhs 9·315900 = 2843100 for the spike; 24300 < rhs for the rest
    val rows = (0 until 13).flatMap { k =>
      val n = if (k == 12) 50 else 5
      val day = java.time.LocalDate.of(2024, 1, 7).plusDays(7L * k)
      Seq.fill(n)(("s", ts(s"$day 10:00:00")))
    }
    val got = TimeSeries.dowAnomalies(rows.toDF("g", "t"), "g", "t").collect()
    got.length shouldBe 13
    val flagged = got.filter(_.getBoolean(7))
    flagged.map(_.getLong(3)).toSeq shouldBe Seq(50L)
    flagged.head.getDouble(6) shouldBe 3499200.0 / 2843100.0
    got.filter(!_.getBoolean(7)).foreach(_.getLong(3) shouldBe 5L)
  }

  test("runsTest computes the exact Wald-Wolfowitz z on a hand sequence") {
    // daily counts (1,9,2,8,3,7): median 3 (dropped), signs 0,1,0,1,1
    // -> runs 4, n1=3, n2=2, z = (4-3.4)/sqrt(84/100)
    val counts = Seq(1, 9, 2, 8, 3, 7)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      Seq.fill(n)(("s", ts(f"2024-01-0${d + 1}%d 10:00:00")))
    }
    val got = TimeSeries.runsTest(rows.toDF("g", "t"), "g", "t")
      .collect().head
    got.getLong(1) shouldBe 3L  // median
    got.getLong(2) shouldBe 3L  // above
    got.getLong(3) shouldBe 2L  // below
    got.getLong(4) shouldBe 4L  // runs
    got.getDouble(5) shouldBe (4.0 - (1.0 + 12.0 / 5.0)) /
      math.sqrt(84.0 / 100.0)
  }

  test("runsTest masks one-sided splits to NULL") {
    // (1,5,5): nearest-rank median is 5 (dropped) -> only the single
    // below-side day remains
    val rows = Seq.fill(1)(("s", ts("2024-01-01 10:00:00"))) ++
      Seq.fill(5)(("s", ts("2024-01-02 10:00:00"))) ++
      Seq.fill(5)(("s", ts("2024-01-03 10:00:00")))
    val got = TimeSeries.runsTest(rows.toDF("g", "t"), "g", "t")
      .collect().head
    got.getLong(1) shouldBe 5L
    got.getLong(2) shouldBe 0L
    got.getLong(3) shouldBe 1L
    got.isNullAt(5) shouldBe true
  }

  test("cohortLtv carries the age-0 cohort size and accumulates cents") {
    // u1 first active in week A (100c), again week A+1 (50c);
    // u2 first active in week A+1 (200c)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-09 10:00:00"), 50L),
      (2L, ts("2024-01-09 11:00:00"), 200L)
    ).toDF("u", "t", "c")
    val got = Funnel.cohortLtv(df, "u", "t", col("c"), periodDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val wA = ts("2024-01-01 10:00:00").getTime * 1000L / 604800000000L
    val a0 = got((wA, 0L)); val a1 = got((wA, 1L)); val b0 = got((wA + 1, 0L))
    a0.getLong(3) shouldBe 1L   // cohort_size
    a0.getLong(5) shouldBe 100L // cum_cents
    a1.getLong(5) shouldBe 150L
    a1.getLong(6) shouldBe 150L // ltv per user
    b0.getLong(3) shouldBe 1L
    b0.getLong(4) shouldBe 200L
  }

  test("changepoint finds the argmax between-SS split with exact stats") {
    // daily counts (1,1,1,5,5): scores k=1..4 are 16, 1.5, 96, 36
    val rows = (1 to 5).flatMap { d =>
      val n = if (d <= 3) 1 else 5
      Seq.fill(n)(("s", ts(f"2024-01-0$d%d 10:00:00")))
    }
    val got = TimeSeries.changepoint(rows.toDF("g", "t"), "g", "t")
      .collect().head
    got.getLong(1) shouldBe 5L
    got.getTimestamp(2) shouldBe ts("2024-01-03 00:00:00")
    got.getLong(3) shouldBe 3L
    got.getDouble(4) shouldBe 1.0
    got.getDouble(5) shouldBe 5.0
    got.getDouble(6) shouldBe 96.0
  }

  test("dispersion recovers Var/mean exactly and masks single-day series") {
    // s1 daily counts (1,3,2): T = 18, disp = 18/(3·2·6) = 0.5
    // s2 constant (2,2): exactly 0; s3 one day: NULL
    val rows =
      Seq.fill(1)(("s1", ts("2024-01-01 05:00:00"))) ++
        Seq.fill(3)(("s1", ts("2024-01-02 06:00:00"))) ++
        Seq.fill(2)(("s1", ts("2024-01-03 07:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-01 08:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-02 09:00:00"))) ++
        Seq.fill(4)(("s3", ts("2024-01-01 10:00:00")))
    val got = TimeSeries.dispersion(rows.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    got("s1").getDouble(2) shouldBe 0.5
    got("s2").getDouble(2) shouldBe 0.0
    got("s3").isNullAt(2) shouldBe true
  }

  test("freshness lags against the global max and flags stale series") {
    val df = Seq(
      ("a", ts("2024-01-03 00:00:00")), ("a", ts("2024-01-01 00:00:00")),
      ("b", ts("2024-01-01 00:00:00"))
    ).toDF("g", "t")
    val got = TimeSeries.freshness(df, "g", "t", staleAfterS = 86400L)
      .collect().map(r => r.getString(0) -> r).toMap
    got("a").getLong(1) shouldBe 2L
    got("a").getLong(3) shouldBe 0L
    got("a").getBoolean(4) shouldBe false
    got("b").getLong(3) shouldBe 172800L
    got("b").getBoolean(4) shouldBe true
    got("b").getTimestamp(2) shouldBe ts("2024-01-01 00:00:00")
  }

  test("sequentialPatterns counts adjacent triples with deterministic rank") {
    // u1: A B C D -> ABC, BCD; u2: A B C -> ABC; u3: X Y (too short)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", 1L),
      (1L, ts("2024-01-01 10:01:00"), "B", 2L),
      (1L, ts("2024-01-01 10:02:00"), "C", 3L),
      (1L, ts("2024-01-01 10:03:00"), "D", 4L),
      (2L, ts("2024-01-01 11:00:00"), "A", 5L),
      (2L, ts("2024-01-01 11:01:00"), "B", 6L),
      (2L, ts("2024-01-01 11:02:00"), "C", 7L),
      (3L, ts("2024-01-01 12:00:00"), "X", 8L),
      (3L, ts("2024-01-01 12:01:00"), "Y", 9L)
    ).toDF("u", "t", "e", "id")
    val got = Funnel.sequentialPatterns(df, "u", "t", "e", "id", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    got shouldBe Array(("A", "B", "C", 2L, 1L), ("B", "C", "D", 1L, 2L))
  }

  test("stageLatency takes first-to-after-first-from, nearest-rank p50/p90") {
    // u1: view@0, purchase@10s, purchase@20s -> gap 10
    // u2: purchase@5s (before any view), view@10s, purchase@40s -> gap 30
    // u3: view only -> excluded; u4: view@0, purchase@0 -> gap 0
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view", 1L),
      (1L, ts("2024-01-01 10:00:10"), "purchase", 2L),
      (1L, ts("2024-01-01 10:00:20"), "purchase", 3L),
      (2L, ts("2024-01-01 11:00:05"), "purchase", 4L),
      (2L, ts("2024-01-01 11:00:10"), "view", 5L),
      (2L, ts("2024-01-01 11:00:40"), "purchase", 6L),
      (3L, ts("2024-01-01 12:00:00"), "view", 7L),
      (4L, ts("2024-01-01 13:00:00"), "view", 8L),
      (4L, ts("2024-01-01 13:00:00"), "purchase", 9L)
    ).toDF("u", "t", "e", "id")
    val got = Funnel.stageLatency(df, "u", "t", "e", "id", "view", "purchase")
      .collect().head
    got.getLong(0) shouldBe 3L
    // gaps multiset {0, 10, 30}: p50 -> cum*100 >= 150 first at 10;
    // p90 -> cum*100 >= 270 first at 30
    got.getLong(1) shouldBe 10L
    got.getLong(2) shouldBe 30L
  }

  test("seasonalStrength is 1 on a pure weekday pattern, NULL on constants") {
    // s1: Sundays always 5, Mondays always 1 -> dow explains everything
    // s2: constant 2 every day -> T = 0 -> NULL
    val rows =
      Seq.fill(5)(("s1", ts("2024-01-07 10:00:00"))) ++
        Seq.fill(5)(("s1", ts("2024-01-14 10:00:00"))) ++
        Seq.fill(1)(("s1", ts("2024-01-08 10:00:00"))) ++
        Seq.fill(1)(("s1", ts("2024-01-15 10:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-07 10:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-08 10:00:00")))
    val got = TimeSeries.seasonalStrength(rows.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    got("s1").getLong(1) shouldBe 4L
    got("s1").getLong(2) shouldBe 2L
    got("s1").getDouble(3) shouldBe 1.0
    got("s2").isNullAt(3) shouldBe true
  }

  test("seasonalStrength matches the hand-computed partial decomposition") {
    // Sundays 5 and 3 (R_sun = 8, n_d = 2), Mondays 1 and 1 (R_mon = 0)
    // n = 4, S = 10, T = 176 -> 1 - (8/4 * 16) / 176
    val rows =
      Seq.fill(5)(("s1", ts("2024-01-07 10:00:00"))) ++
        Seq.fill(3)(("s1", ts("2024-01-14 10:00:00"))) ++
        Seq.fill(1)(("s1", ts("2024-01-08 10:00:00"))) ++
        Seq.fill(1)(("s1", ts("2024-01-15 10:00:00")))
    val got = TimeSeries.seasonalStrength(rows.toDF("g", "t"), "g", "t")
      .collect().head
    got.getDouble(3) shouldBe (1.0 - ((8.0 / 4.0 + 0.0 / 4.0) * 16.0) / 176.0)
  }

  test("lag1Autocorr recovers the exact hand value and masks constants") {
    // series s1 daily counts (1,3,2): u = (-3,3,0), num=-9, den=18 -> -0.5
    // series s2 constant (2,2): min=max -> NULL
    val rows =
      Seq.fill(1)(("s1", ts("2024-01-01 05:00:00"))) ++
        Seq.fill(3)(("s1", ts("2024-01-02 06:00:00"))) ++
        Seq.fill(2)(("s1", ts("2024-01-03 07:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-01 08:00:00"))) ++
        Seq.fill(2)(("s2", ts("2024-01-02 09:00:00")))
    val got = TimeSeries.lag1Autocorr(rows.toDF("g", "t"), "g", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    got("s1").getLong(1) shouldBe 3L
    got("s1").getDouble(2) shouldBe -0.5
    got("s2").getLong(1) shouldBe 2L
    got("s2").isNullAt(2) shouldBe true
  }
}
