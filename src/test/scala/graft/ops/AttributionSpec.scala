package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:$m%02d:00")

  // u1 converts on day 8 noon with 3 prior touches inside the 7-day
  // window (click d2, view d5, click d8 09:00) and 1 outside (d1 11:00,
  // 7d1h before); u2 converts with no touches; u3 touches but never
  // converts
  private def log = Seq(
    (1L, 10L, ts(1, 11), "click"),
    (1L, 11L, ts(2, 12), "click"),
    (1L, 12L, ts(5, 12), "view"),
    (1L, 13L, ts(8, 9), "click"),
    (1L, 14L, ts(8, 12), "purchase"),
    (2L, 20L, ts(9, 12), "purchase"),
    (3L, 30L, ts(9, 12), "view")
  ).toDF("user_id", "event_id", "ts", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Attribution.linearTouch(df, "user_id", "ts", "event_type", "event_id",
      "purchase", windowDays = 7)

  test("linear split with remainder-to-last, window and cross-user exclusion") {
    val got = run(log).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 3 touches: each gets 333333, last (click d8 09:00) +1 remainder
    got("click") shouldBe ((333333L + 333334L, 2L, 1L))
    got("view") shouldBe ((333333L, 1L, 1L))
    got.values.map(_._1).sum shouldBe 1000000L
  }

  test("touch at the exact conversion instant or after gets no credit") {
    val df = Seq(
      (1L, 1L, ts(8, 12), "click"),  // same instant as conversion
      (1L, 2L, ts(8, 13), "view"),   // after
      (1L, 3L, ts(8, 11), "click"),  // before -> sole credited touch
      (1L, 4L, ts(8, 12), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = run(df).collect()
    got.length shouldBe 1
    got(0).getString(0) shouldBe "click"
    got(0).getLong(1) shouldBe 1000000L
    got(0).getLong(2) shouldBe 1L
  }

  test("two conversions can credit the same touch (per-conversion windows)") {
    val df = Seq(
      (1L, 1L, ts(3, 10), "view"),
      (1L, 2L, ts(4, 10), "purchase"),
      (1L, 3L, ts(5, 10), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = run(df).collect()
    got(0).getLong(1) shouldBe 2000000L // full credit from each conversion
    got(0).getLong(3) shouldBe 2L
  }

  test("credit conservation on a larger deterministic log") {
    val df = (0 until 50).flatMap { u =>
      (0 until 20).map { i =>
        val t = ts(1 + (u + i) % 27, (i * 5) % 24, (u * 7) % 60)
        val kind = if (i % 5 == 4) "purchase"
                   else Seq("click", "view", "signup")(i % 3)
        (u.toLong, (u * 100 + i).toLong, t, kind)
      }
    }.toDF("user_id", "event_id", "ts", "event_type")
    val got = run(df)
    val total = got.agg(org.apache.spark.sql.functions.sum("credit_ppm"))
      .collect()(0).getLong(0)
    // every attributed conversion distributes exactly 1e6
    (total % 1000000L) shouldBe 0L
    total should be > 0L
  }
}
