package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class PiiRow(city: String, age_band: String, person_id: Long)

final case class VoteRow(ts: java.sql.Timestamp, unit: Long, cat: String)

class StreamingPrivacySpec extends SparkSpec {
  import spark.implicits._

  private def vt(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-06-25 $h%02d:$m%02d:00")

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

  test("stableHistogramStream: vote-once counts, seeded noise, threshold, " +
    "and bit-for-bit convergence with the batch release") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[VoteRow]
    val q = StreamingPrivacy.stableHistogramStream(
        mem.toDF(), "unit", "cat", "ts", epsilon = 1.0, tau = 3.0,
        windowDur = "1 day", watermark = "2 hours")
      .writeStream.format("memory").queryName("shist")
      .outputMode(OutputMode.Append()).start()

    // 8 units vote "big" (unit 1 votes it TWICE — must count once);
    // one unit votes "rare"
    val votes = (1L to 8L).map(u => VoteRow(vt(9), u, "big")) ++
      Seq(VoteRow(vt(9, 30), 1L, "big"), VoteRow(vt(10), 99L, "rare"))
    mem.addData(votes: _*)
    q.processAllAvailable()
    // next-day event advances the watermark past the window end
    mem.addData(VoteRow(java.sql.Timestamp.valueOf("2024-06-26 09:00:00"),
      500L, "flush"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("shist")
      .select(col("cat"), col("noisy_count"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val expBig = r6(8.0 + lap("big7", 1.0))
    val expRare = r6(1.0 + lap("rare7", 1.0))
    expBig should be >= 3.0 // fixture sanity
    got("big") shouldBe expBig
    if (expRare >= 3.0) got.contains("rare") shouldBe true
    else got.contains("rare") shouldBe false

    // convergence: the batch release over the same day's votes (each
    // unit votes one category, so the L0 cap is the identity) equals
    // the streamed rows exactly
    val batch = graft.ops.Privacy.stableHistogram(
      votes.toDF(), "unit", "cat", maxCatsPerUnit = 1, epsilon = 1.0,
      tau = 3.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got shouldBe batch
  }

  test("kAnonymityGate withholds sub-k cohorts, flushes at k, then passes through") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(), Seq("city", "age_band"), k = 3)
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

  test("kAnonymityGate: distinct cohorts never merge via separator or null tricks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(), Seq("city", "age_band"), k = 2)
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
}
