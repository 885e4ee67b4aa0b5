package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 pins: deterministic release of superseded `localCheckpoint`
  * blocks in the iterative operators (the round-6 in-suite bench
  * regression: `clearCache()` cannot reach checkpoint RDDs, so every
  * iteration stranded one materialized frame in the block manager).
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  /** Persistent-RDD count, after nudging the ContextCleaner's async
    * unpersists to settle (free() is non-blocking). */
  private def persistedCount(): Int = {
    Thread.sleep(50)
    spark.sparkContext.getPersistentRDDs.size
  }

  test("nearDupClusters frees superseded iteration checkpoints") {
    // a path graph a-b-c-d-e: diameter 4 forces several propagation
    // rounds, so without per-round freeing >1 checkpoint would survive
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("a_id", "b_id")
    val before = persistedCount()
    val out = Dedup.nearDupClusters(pairs)
    val got = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSet == Set("a"), "one component labeled by its min id")
    val leaked = persistedCount() - before
    // exactly the RETURNED frame's final checkpoint may remain
    assert(leaked <= 1, s"clusters stranded $leaked persistent RDDs (want <=1)")
    Checkpoints.free(out)
  }

  test("pageRank frees superseded rank frames and its shared inputs") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val before = persistedCount()
    val out = Graph.pageRank(edges, "src", "dst", iters = 5)
    assert(out.count() == 3)
    val leaked = persistedCount() - before
    assert(leaked <= 1, s"pageRank stranded $leaked persistent RDDs (want <=1)")
    Checkpoints.free(out)
  }

  test("Checkpoints.free is a no-op on a non-checkpointed frame") {
    val df = Seq(1, 2, 3).toDF("x").filter(col("x") > 1)
    Checkpoints.free(df) // must not throw
    assert(df.count() == 2)
  }

  // ---- TimeSeries.rollingDistinct / firstSeenGrowth -------------------

  private def ts(day: Int, h: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("rollingDistinct counts each actor once per trailing window") {
    // u1 active days 1 and 2 (overlapping 3-day windows must not
    // double-count it); u2 only day 1; day 4 sees only u3
    val df = Seq(("u1", ts(1)), ("u1", ts(1, 5)), ("u1", ts(2)),
      ("u2", ts(1)), ("u3", ts(4))).toDF("u", "t")
    val got = TimeSeries.rollingDistinct(df, "t", "u", days = 3)
      .collect().map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(1)).toMap
    assert(got == Map(
      "2024-01-01" -> 2, // u1, u2
      "2024-01-02" -> 2, // u1 (days 1+2, counted once), u2
      "2024-01-03" -> 2, // window [1,3]: u1, u2
      "2024-01-04" -> 2  // window [2,4]: u1 (day 2), u3
    ))
  }

  test("rollingDistinct clips phantom days past the last active day") {
    val df = Seq(("u1", ts(1))).toDF("u", "t")
    val days = TimeSeries.rollingDistinct(df, "t", "u", days = 7)
      .collect().map(_.getTimestamp(0).toString.take(10)).toSet
    assert(days == Set("2024-01-01"), "no coverage rows after max active day")
  }

  test("firstSeenGrowth: new vs cumulative actors per first-seen day") {
    val df = Seq(("a", ts(1)), ("a", ts(3)), ("b", ts(1)), ("c", ts(2)),
      ("c", ts(9))).toDF("u", "t")
    val got = TimeSeries.firstSeenGrowth(df, "t", "u")
      .collect().map(r => (r.getTimestamp(0).toString.take(10),
        r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("2024-01-01", 2L, 2L), ("2024-01-02", 1L, 3L)))
  }

  // ---- TimeSeries.dailyAnomalies / Sampling.temporalSplit ------------

  test("dailyAnomalies z-scores against strictly-prior history and flags spikes") {
    // key "x": 3 baseline days of 2 events, then a 20-event spike
    val rows = Seq.tabulate(3)(d => Seq(("x", ts(d + 1, 1)), ("x", ts(d + 1, 2)))).flatten ++
      Seq.tabulate(20)(h => ("x", ts(4, h % 24)))
    val got = TimeSeries.dailyAnomalies(rows.toDF("k", "t"), "k", "t",
      days = 7, zThresh = 3.0, minHistory = 3)
      .collect().map(r => r.getTimestamp(1).toString.take(10) ->
        (r.getLong(3), Option(r.get(4)), r.getBoolean(5))).toMap
    // days 1-3 are cold start (suppressed); day 4 has 3 baseline days
    assert(got.keySet == Set("2024-01-04"))
    val (baseline, z, anom) = got("2024-01-04")
    assert(baseline == 3L)
    // constant baseline (2,2,2): zero variance -> null z, but the spike
    // deviates from the constant -> flagged via the exact integer branch
    assert(z.isEmpty && anom)
  }

  test("dailyAnomalies: quiet day within a noisy baseline is not flagged") {
    val rows = Seq(("x", 1, 2), ("x", 2, 4), ("x", 3, 2), ("x", 4, 4), ("x", 5, 3))
      .flatMap { case (k, d, n) => Seq.fill(n)((k, ts(d, 1))) }
    val got = TimeSeries.dailyAnomalies(rows.toDF("k", "t"), "k", "t",
      days = 7, zThresh = 3.0, minHistory = 3)
      .collect().map(r => r.getTimestamp(1).toString.take(10) -> r.getBoolean(5)).toMap
    assert(got.get("2024-01-05").contains(false), "3 within mean(2,4,2,4)±z·std passes")
  }

  test("temporalSplit: boundary rows and embargo gap land exactly") {
    val df = Seq(
      (1L, ts(10, 0)),  // before cutoff -> train
      (2L, ts(20, 0)),  // AT cutoff -> train (inclusive)
      (3L, ts(21, 12)), // inside 2-day embargo -> embargo
      (4L, ts(22, 0)),  // AT embargo end -> embargo (inclusive)
      (5L, ts(23, 0))   // past embargo -> test
    ).toDF("event_id", "t")
    val got = Sampling.temporalSplit(df, "t", "event_id",
      "2024-01-20 00:00:00", "2 days")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test"))
  }

  // ---- SkewJoin.joinPreflight ----------------------------------------

  test("joinPreflight predicts per-key join output and ranks hot keys") {
    val left = Seq("a", "a", "a", "b", "c").toDF("k")           // a:3 b:1 c:1
    val right = Seq("a", "a", "b", "b", "b", "d").toDF("k")     // a:2 b:3 d:1
    val got = SkewJoin.joinPreflight(left, right, "k", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // a: 3*2=6, b: 1*3=3, then the 0-contribution keys c/d tie -> c by key order
    assert(got.toSeq == Seq(("a", 3L, 2L, 6L), ("b", 1L, 3L, 3L), ("c", 1L, 0L, 0L)))
  }

  // ---- Funnel.labeledSequences ---------------------------------------

  test("labeledSequences renders strictly-preceding bounded context") {
    val df = Seq(
      (1L, "u1", ts(1, 1), "view"),
      (2L, "u1", ts(1, 2), "click"),
      (3L, "u1", ts(1, 3), "view"),
      (4L, "u1", ts(1, 4), "purchase"),  // context = last 2: click>view
      (5L, "u1", ts(1, 5), "purchase"),  // context = view>purchase
      (6L, "u2", ts(1, 1), "purchase")   // first event: empty context
    ).toDF("event_id", "u", "t", "et")
    val got = Funnel.labeledSequences(df, "u", "t", "et", "event_id",
      labelType = "purchase", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(got == Map(
      4L -> ("click>view", 2L),
      5L -> ("view>purchase", 2L),
      6L -> ("", 0L)))
  }

  // ---- Dedup.keepBestPerExactGroup / Agg.targetEncodeExpanding -------

  test("keepBestPerExactGroup keeps highest score, min-id on ties, singletons pass") {
    val df = Seq(
      (1L, "alpha beta gamma", 10L),  // dup group (token-canonical)
      (2L, "beta alpha gamma", 30L),  // same fingerprint, best score
      (3L, "gamma beta alpha", 30L),  // tie with 2 -> loses on id
      (4L, "delta epsilon", 5L)       // singleton
    ).toDF("doc_id", "text", "quality")
    val got = Dedup.keepBestPerExactGroup(df, "doc_id", "text", "quality")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(2L -> (3L, 30L), 4L -> (1L, 5L)))
  }

  test("targetEncodeExpanding encodes strictly-prior means, null cold start") {
    val df = Seq(
      (1L, "a", ts(1, 1), 1.00),
      (2L, "a", ts(1, 2), 3.00),
      (3L, "a", ts(1, 3), 5.00),
      (4L, "b", ts(1, 1), 9.00)
    ).toDF("event_id", "cat", "t", "v")
    val got = Agg.targetEncodeExpanding(df, "cat", "t", "event_id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(got == Map(
      1L -> (0L, None),           // cold start: no prior rows
      2L -> (1L, Some(1.0)),      // saw only event 1
      3L -> (2L, Some(2.0)),      // mean(1, 3) — never its own 5.0
      4L -> (0L, None)))          // other category's first row
  }

  test("labeledSequences never leaks the label row or later events into context") {
    val df = Seq(
      (1L, "u", ts(1, 1), "purchase"),
      (2L, "u", ts(1, 2), "error"),
      (3L, "u", ts(1, 3), "purchase")
    ).toDF("event_id", "u", "t", "et")
    val got = Funnel.labeledSequences(df, "u", "t", "et", "event_id",
      "purchase", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // event 1 sees nothing before it; event 3 sees 1 and 2, not itself
    assert(got == Map(1L -> "", 3L -> "purchase>error"))
  }
}
