package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class PiiRow(city: String, age_band: String, person_id: Long)

final case class PiiTsRow(ts: java.sql.Timestamp, city: String,
                          age_band: String, person_id: Long)

final case class VoteRow(ts: java.sql.Timestamp, unit: Long, cat: String)

class StreamingPrivacySpec extends SparkSpec {
  import spark.implicits._

  /** Absolute-instant timestamps (TZ-independent: the session runs UTC,
    * so windows align to UTC midnight regardless of the JVM default).
    */
  private def utc(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))
  private def epochSec(s: String): Long =
    java.time.Instant.parse(s).getEpochSecond

  /** Independent JVM re-derivation of the seeded Laplace noise. */
  private def lap(key: String, scale: Double): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(13)
    val h = java.lang.Long.parseLong(hex, 16)
    val u = (h + 0.5) / 4503599627370496.0
    -scale * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
  }
  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The stream's noise key: (category, seed, window-start epoch-sec). */
  private def nKey(cat: String, seed: Long, winStart: Long) =
    s"$cat\u0001$seed\u0001$winStart"

  /** stableHistogramStream's vote gate is a `transformWithState`
    * processor, which requires the RocksDB state store provider; scope
    * the provider switch to the test so other suites keep the default.
    */
  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("stableHistogramStream: vote-once counts, per-window noise, late-data " +
    "drop, and per-window bit-for-bit convergence with the salted batch release") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[VoteRow]
    val q = StreamingPrivacy.stableHistogramStream(
        mem.toDF(), "unit", "cat", "ts", maxCatsPerUnit = 1, epsilon = 1.0,
        tau = 3.0, windowDur = "1 day", watermark = "2 hours")
      .writeStream.format("memory").queryName("shist")
      .outputMode(OutputMode.Append()).start()

    // day 1: 8 units vote "big" (unit 1 votes it TWICE — must count
    // once); one unit votes "rare"
    val day1 = (1L to 8L).map(u => VoteRow(utc("2024-06-25T09:00:00Z"), u, "big")) ++
      Seq(VoteRow(utc("2024-06-25T09:30:00Z"), 1L, "big"),
        VoteRow(utc("2024-06-25T10:00:00Z"), 99L, "rare"))
    mem.addData(day1: _*)
    q.processAllAvailable()

    // day 2: 6 FRESH units vote "big" — advances the watermark past the
    // day-1 window end, releasing day 1 with day-1-salted noise
    val day2 = (11L to 16L).map(u => VoteRow(utc("2024-06-26T09:00:00Z"), u, "big"))
    mem.addData(day2: _*)
    q.processAllAvailable()

    // LATE vote for day 1, far behind the watermark (now 2024-06-26
    // 07:00): the closed window's agg state is gone, the row must be
    // DROPPED — a released window is never silently re-opened
    mem.addData(VoteRow(utc("2024-06-25T12:00:00Z"), 77L, "big"))
    q.processAllAvailable()

    // day-3 event advances the watermark past the day-2 window end
    mem.addData(VoteRow(utc("2024-06-27T09:00:00Z"), 500L, "flush"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("shist")
      .select(col("window_start").cast("long"), col("cat"), col("noisy_count"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    val w1 = epochSec("2024-06-25T00:00:00Z")
    val w2 = epochSec("2024-06-26T00:00:00Z")
    val expBig1 = r6(8.0 + lap(nKey("big", 7L, w1), 1.0))
    val expBig2 = r6(6.0 + lap(nKey("big", 7L, w2), 1.0)) // 6, NOT 7: late drop
    val expRare = r6(1.0 + lap(nKey("rare", 7L, w1), 1.0))
    expBig1 should be >= 3.0 // fixture sanity
    expBig2 should be >= 3.0
    got((w1, "big")) shouldBe expBig1
    got((w2, "big")) shouldBe expBig2
    if (expRare >= 3.0) got.contains((w1, "rare")) shouldBe true
    else got.contains((w1, "rare")) shouldBe false
    // two windows of one category draw DIFFERENT noise (the r11 advice
    // defect: un-salted windows leaked exact count deltas)
    (got((w1, "big")) - 8.0) should not equal (got((w2, "big")) - 6.0)
    // day-3 window never closed -> "flush" must not have been released
    got.keys.map(_._2) should not contain "flush"

    // per-window convergence: the batch release over each day's ON-TIME
    // votes, salted with that window's start, equals the streamed rows
    // exactly (each unit votes one category, so the L0 cap is the
    // identity on this fixture)
    for ((winStart, votes) <- Seq(w1 -> day1, w2 -> day2)) {
      val batch = graft.ops.Privacy.stableHistogram(
        votes.toDF(), "unit", "cat", maxCatsPerUnit = 1, epsilon = 1.0,
        tau = 3.0, releaseSalt = winStart.toString)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val streamed = got.collect { case ((w, c), v) if w == winStart => c -> v }
      streamed shouldBe batch
    }
  } }

  test("stableHistogramStream enforces the cross-category L0 cap in stream state") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[VoteRow]
    // epsilon high so the Laplace(cap/eps) noise stays well under 0.5
    // and exact counts are recoverable by subtracting the known noise
    val q = StreamingPrivacy.stableHistogramStream(
        mem.toDF(), "unit", "cat", "ts", maxCatsPerUnit = 2, epsilon = 10.0,
        tau = 1.0, windowDur = "1 day", watermark = "2 hours")
      .writeStream.format("memory").queryName("shist_cap")
      .outputMode(OutputMode.Append()).start()

    // base load, all within the cap: units 1-5 vote c1+c2, units 6-10 c3
    val base = (1L to 5L).flatMap(u => Seq(
        VoteRow(utc("2024-06-25T09:00:00Z"), u, "c1"),
        VoteRow(utc("2024-06-25T09:00:00Z"), u, "c2"))) ++
      (6L to 10L).map(u => VoteRow(utc("2024-06-25T09:00:00Z"), u, "c3"))
    // unit 50 over-votes: 3 categories under cap 2 -> exactly ONE of its
    // votes must be dropped at ingest (which one follows arrival order)
    val over = Seq("c1", "c2", "c3").map(c =>
      VoteRow(utc("2024-06-25T10:00:00Z"), 50L, c))
    mem.addData(base ++ over: _*)
    q.processAllAvailable()
    mem.addData(VoteRow(utc("2024-06-26T12:00:00Z"), 500L, "flushcat"))
    q.processAllAvailable()
    q.stop()

    val w1 = epochSec("2024-06-25T00:00:00Z")
    val got = spark.table("shist_cap")
      .filter(col("window_start").cast("long") === w1)
      .select(col("cat"), col("noisy_count"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe Set("c1", "c2", "c3")
    // recover exact counts by subtracting the deterministic noise
    val exact = got.map { case (c, noisy) =>
      c -> math.round(noisy - lap(nKey(c, 7L, w1), 2.0 / 10.0))
    }
    exact.values.foreach(n => n should (be(5L) or be(6L)))
    // 15 base votes + exactly 2 of unit 50's 3 (the cap): never 18
    exact.values.sum shouldBe 17L
  } }

  test("kAnonymityGate withholds sub-k cohorts, flushes at k, then passes through") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGateUnbounded(mem.toDF(), Seq("city", "age_band"), k = 3)
      .writeStream.format("memory").queryName("kanon")
      .outputMode(OutputMode.Append()).start()

    def released(): Set[Long] = spark.table("kanon")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

    // batch 1: NYC cohort has only 2 members -> everything withheld
    mem.addData(PiiRow("NYC", "20s", 1L), PiiRow("NYC", "20s", 2L),
      PiiRow("LAX", "40s", 9L))
    q.processAllAvailable()
    released() shouldBe Set.empty

    // batch 2: third NYC member arrives -> the whole buffered cohort flushes
    mem.addData(PiiRow("NYC", "20s", 3L))
    q.processAllAvailable()
    released() shouldBe Set(1L, 2L, 3L)

    // batch 3: released cohorts pass straight through; LAX stays withheld
    mem.addData(PiiRow("NYC", "20s", 4L), PiiRow("LAX", "40s", 10L))
    q.processAllAvailable()
    released() shouldBe Set(1L, 2L, 3L, 4L)
    q.stop()

    // convergence: the stream's released set equals the batch audit's
    // safe-cohort rows over the same data
    val all = Seq(
      PiiRow("NYC", "20s", 1L), PiiRow("NYC", "20s", 2L), PiiRow("LAX", "40s", 9L),
      PiiRow("NYC", "20s", 3L), PiiRow("NYC", "20s", 4L), PiiRow("LAX", "40s", 10L)
    ).toDF()
    val safe = graft.ops.Privacy.kAnonymity(all, Seq("city", "age_band"), k = 3)
      .filter(!col("at_risk")).select("city", "age_band")
    val batchKept = all.join(safe, Seq("city", "age_band"), "left_semi")
      .select("person_id").collect().map(_.getLong(0)).toSet
    batchKept shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("kAnonymityGate retention horizon: idle sub-k cohorts expire, their " +
    "rows are suppressed, and the cohort re-accumulates from zero") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiTsRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(),
        Seq("city", "age_band"), k = 3,
        tsCol = "ts", lateness = "1 hour", horizon = "1 day")
      .writeStream.format("memory").queryName("kanon_ttl")
      .outputMode(OutputMode.Append()).start()

    def released(): Set[Long] = spark.table("kanon_ttl")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

    // two NYC members, then silence past the horizon
    mem.addData(PiiTsRow(utc("2024-06-25T09:00:00Z"), "NYC", "20s", 1L),
      PiiTsRow(utc("2024-06-25T09:00:00Z"), "NYC", "20s", 2L))
    q.processAllAvailable()
    // unrelated traffic advances the watermark past 09:00 + 1 day
    mem.addData(PiiTsRow(utc("2024-06-27T00:00:00Z"), "LAX", "40s", 9L))
    q.processAllAvailable()
    mem.addData(PiiTsRow(utc("2024-06-27T01:00:00Z"), "LAX", "40s", 10L))
    q.processAllAvailable()
    released() shouldBe Set.empty // rows 1,2 are now suppressed for good

    // post-expiry NYC arrivals re-accumulate from ZERO: two more rows
    // (total 4 ever seen) must still release nothing…
    mem.addData(PiiTsRow(utc("2024-06-27T02:00:00Z"), "NYC", "20s", 3L),
      PiiTsRow(utc("2024-06-27T02:10:00Z"), "NYC", "20s", 4L))
    q.processAllAvailable()
    released() shouldBe Set.empty
    // …and the third post-expiry row flushes exactly the post-expiry
    // cohort — the pre-expiry rows 1,2 are gone forever
    mem.addData(PiiTsRow(utc("2024-06-27T02:20:00Z"), "NYC", "20s", 5L))
    q.processAllAvailable()
    released() shouldBe Set(3L, 4L, 5L)
    q.stop()
  }

  test("kAnonymityGate retention: null event-time rows are dropped up front, " +
    "never buffered into timeout-less state (r12 advice leak)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiTsRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(),
        Seq("city", "age_band"), k = 2,
        tsCol = "ts", lateness = "1 hour", horizon = "1 day")
      .writeStream.format("memory").queryName("kanon_nullts")
      .outputMode(OutputMode.Append()).start()

    def released(): Set[Long] = spark.table("kanon_nullts")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

    // k null-ts rows of one cohort: with the old behavior these would
    // buffer (and at k release) in state that can NEVER time out; the
    // fixed gate drops them before grouping, so nothing releases and
    // nothing is retained for them
    mem.addData(PiiTsRow(null, "NYC", "20s", 1L),
      PiiTsRow(null, "NYC", "20s", 2L))
    q.processAllAvailable()
    released() shouldBe Set.empty

    // timestamped rows of the same cohort accumulate from ZERO — the
    // null-ts rows contributed nothing to the count
    mem.addData(PiiTsRow(utc("2024-06-25T09:00:00Z"), "NYC", "20s", 3L))
    q.processAllAvailable()
    released() shouldBe Set.empty
    mem.addData(PiiTsRow(utc("2024-06-25T09:05:00Z"), "NYC", "20s", 4L))
    q.processAllAvailable()
    released() shouldBe Set(3L, 4L)
    q.stop()
  }

  test("kAnonymityGate: distinct cohorts never merge via separator or null tricks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGateUnbounded(mem.toDF(), Seq("city", "age_band"), k = 2)
      .writeStream.format("memory").queryName("kanon2")
      .outputMode(OutputMode.Append()).start()
    // ("ab","c") vs ("a","bc") and null vs literal-null string: four
    // DISTINCT singleton cohorts -> nothing may release
    mem.addData(PiiRow("ab", "c", 1L), PiiRow("a", "bc", 2L),
      PiiRow(null, "x", 3L), PiiRow("null", "x", 4L))
    q.processAllAvailable()
    spark.table("kanon2").count() shouldBe 0L
    // a true twin arrives for the null cohort only
    mem.addData(PiiRow(null, "x", 5L))
    q.processAllAvailable()
    val got = spark.table("kanon2")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    got shouldBe Set(3L, 5L)
    q.stop()
  }

  test("durationMs parses watermark-style duration strings") {
    StreamingPrivacy.durationMs("30 days") shouldBe 30L * 86400000L
    StreamingPrivacy.durationMs("2 hours") shouldBe 7200000L
    StreamingPrivacy.durationMs("1 minute") shouldBe 60000L
    StreamingPrivacy.durationMs("500 milliseconds") shouldBe 500L
    an[IllegalArgumentException] should be thrownBy
      StreamingPrivacy.durationMs("fortnight")
  }
}
