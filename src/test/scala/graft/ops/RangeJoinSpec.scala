package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(df: org.apache.spark.sql.DataFrame, c: String) =
    df.withColumn(c, to_timestamp(col(c)))

  test("point-in-interval: inclusive bounds, bucket-straddling matches, key isolation") {
    val intervals = t(Seq(
      ("u1", 100L, "2024-06-25 10:30:00"), // 1h window ending 11:30, straddles 11:00 bucket edge
      ("u2", 200L, "2024-06-25 10:00:00")
    ).toDF("user_id", "iv_id", "start"), "start")
    val points = t(Seq(
      ("u1", 1L, "2024-06-25 10:30:00"), // exactly at start → in
      ("u1", 2L, "2024-06-25 11:30:00"), // exactly at end (start+1h) → in
      ("u1", 3L, "2024-06-25 11:30:01"), // one second past → out
      ("u1", 4L, "2024-06-25 11:15:00"), // in the NEXT hour-bucket, still inside
      ("u2", 5L, "2024-06-25 10:30:00"), // other key's window
      ("u1", 6L, "2024-06-25 10:15:00")  // before start → out
    ).toDF("user_id", "pt_id", "ts"), "ts")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
      "ts", "start", lengthSeconds = 3600L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 100L), (2L, 100L), (4L, 100L), (5L, 200L))
  }

  test("matches a plain inequality join exactly on real events (sf0.001)") {
    val ev = graft.TestTables.events(spark, "/root/testdata/sf0.001")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("ets"))
    val pts = ev.filter(col("event_type") =!= "error")
      .select("user_id", "event_id", "ts")
    val bucketed = RangeJoin.pointInInterval(pts, errors, Seq("user_id"),
      "ts", "ets", 3600L)
      .select("event_id", "error_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.join(errors, Seq("user_id"))
      .filter(unix_timestamp(col("ts")) >= unix_timestamp(col("ets")) &&
        unix_timestamp(col("ts")) <= unix_timestamp(col("ets")) + 3600)
      .select("event_id", "error_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bucketed shouldBe naive
    bucketed.size should be > 0
  }

  test("rejects colliding non-key column names") {
    val a = Seq(("u1", 1L, "2024-06-25 10:00:00")).toDF("user_id", "event_id", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(t(a, "ts"), t(a, "ts"), Seq("user_id"), "ts", "ts", 60L)
    }
  }
}
