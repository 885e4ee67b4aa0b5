package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join attributes purchases to in-horizon clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamingKpis.Click]
    val purchases = MemoryStream[StreamingKpis.Purchase]
    val q = StreamingKpis.attributedPurchases(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()

    clicks.addData(
      StreamingKpis.Click("a", 1, ts("2024-06-25 10:00:00")),
      StreamingKpis.Click("a", 2, ts("2024-06-25 10:30:00")),
      StreamingKpis.Click("a", 3, ts("2024-06-25 08:00:00")), // out of horizon
      StreamingKpis.Click("b", 4, ts("2024-06-25 10:40:00"))) // other user
    purchases.addData(
      StreamingKpis.Purchase("a", 100, ts("2024-06-25 10:45:00")),
      StreamingKpis.Purchase("c", 101, ts("2024-06-25 10:45:00"))) // no clicks
    q.processAllAvailable(); q.stop()

    val got = spark.table("attr")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((100L, 1L), (100L, 2L))
  }

  test("interval join agrees with the equivalent batch join") {
    implicit val sqlCtx = spark.sqlContext
    val cs = Seq(
      StreamingKpis.Click("a", 1, ts("2024-06-25 10:00:00")),
      StreamingKpis.Click("a", 2, ts("2024-06-25 09:50:00")),
      StreamingKpis.Click("b", 3, ts("2024-06-25 10:10:00")))
    val ps = Seq(
      StreamingKpis.Purchase("a", 10, ts("2024-06-25 10:30:00")),
      StreamingKpis.Purchase("b", 11, ts("2024-06-25 12:00:00")))

    val clicks = MemoryStream[StreamingKpis.Click]
    val purchases = MemoryStream[StreamingKpis.Purchase]
    val q = StreamingKpis.attributedPurchases(clicks.toDS(), purchases.toDS())
      .writeStream.format("memory").queryName("attr_parity")
      .outputMode(OutputMode.Append()).start()
    clicks.addData(cs: _*); purchases.addData(ps: _*)
    q.processAllAvailable(); q.stop()

    val batch = cs.toDF().alias("c").join(ps.toDF().alias("p"),
      expr("c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 1 hour AND c.ts <= p.ts"))
      .select(col("p.purchase_id"), col("c.click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = spark.table("attr_parity").select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    streamed shouldBe batch
    batch.nonEmpty shouldBe true
  }

  test("dropDuplicatesWithinWatermark dedups replayed events across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDS().toDF("event_id", "ts")
    val q = StreamingKpis.dedupWithinWatermark(events, "event_id", "ts")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()

    mem.addData((1L, ts("2024-06-25 10:00:00")), (1L, ts("2024-06-25 10:00:05")),
      (2L, ts("2024-06-25 10:01:00")))
    q.processAllAvailable()
    // replay of id 1 in a LATER micro-batch, still inside the watermark
    mem.addData((1L, ts("2024-06-25 10:02:00")), (3L, ts("2024-06-25 10:03:00")))
    q.processAllAvailable(); q.stop()

    val ids = spark.table("dedup_wm").select("event_id")
      .collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 2L, 3L)
  }

  test("latestSnapshot converges to the batch compaction across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val changes = MemoryStream[(Long, Timestamp, Long, String)]
    val snap = StreamingKpis.latestSnapshot(
      changes.toDS().toDF("k", "t", "tie", "v"), "k", "t", "tie")
    val store = new graft.serve.KpiSink.InMemoryKvStore()
    val items = snap.select(concat(lit("K_"), col("k")).as("id"),
      lit("latest").as("timestamp"), col("v"))
    val ck = java.nio.file.Files.createTempDirectory("snapck").toString
    def drain(): Unit = {
      val q = items.writeStream
        .option("checkpointLocation", ck)
        .outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.serve.KpiSink.write(b, store)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    changes.addData((1L, ts("2024-06-25 10:00:00"), 1L, "a1"),
      (2L, ts("2024-06-25 10:00:00"), 2L, "b1"))
    drain()
    store.getItem("K_1", "latest").get("v") shouldBe "a1"

    // batch 2: key 1 advances; key 2 gets a LATE row (older ts) that
    // must NOT win; key 3 appears; equal-ts tie on key 3 resolves by tie
    changes.addData(
      (1L, ts("2024-06-25 11:00:00"), 3L, "a2"),
      (2L, ts("2024-06-25 09:00:00"), 4L, "b0-late"),
      (3L, ts("2024-06-25 10:00:00"), 5L, "c-low"),
      (3L, ts("2024-06-25 10:00:00"), 6L, "c-high"))
    drain()
    store.getItem("K_1", "latest").get("v") shouldBe "a2"
    store.getItem("K_2", "latest").get("v") shouldBe "b1" // late row lost
    store.getItem("K_3", "latest").get("v") shouldBe "c-high" // tie by tie col
    store.size shouldBe 3
  }
}
