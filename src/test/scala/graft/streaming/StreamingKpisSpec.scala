package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.kpi.KpiQueries

class StreamingKpisSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dailyGenreMetrics matches the batch KPI on a drained file source") {
    val base = tmpDir("skpi")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.writeString(Paths.get(s"$in/s1.csv"),
      """user_id,track_id,listen_time
        |u1,t1,2024-06-25 01:00:00
        |u2,t1,2024-06-25 02:00:00
        |u1,t2,2024-06-26 03:00:00
        |""".stripMargin)
    val songs = Seq(("t1", "T1", "A", "rock", 60000L), ("t2", "T2", "A", "pop", 120000L))
      .toDF("track_id", "track_name", "artists", "track_genre", "duration_ms")
    val users = Seq(("u1", "U1", "US"), ("u2", "U2", "DE"))
      .toDF("user_id", "user_name", "user_country")

    val stream = IncrementalIngest.streamsSource(spark, in)
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val enrichedStream = KpiQueries.prepareStreamingData(stream, songs, users)
    val q = StreamingKpis.dailyGenreMetrics(enrichedStream)
      .writeStream.format("memory").queryName("genre_metrics")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("genre_metrics")
      .select("date", "track_genre", "listen_count")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getString(1), r.getLong(2)))
      .toSet
    got shouldBe Set(
      ("2024-06-25", "rock", 2L),
      ("2024-06-26", "pop", 1L))
  }

  test("sliding-window trending counts match the equivalent batch window agg") {
    val base = tmpDir("strend")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.writeString(Paths.get(s"$in/s1.csv"),
      """user_id,track_id,listen_time
        |u1,t1,2024-06-25 00:10:00
        |u2,t1,2024-06-25 05:30:00
        |u3,t1,2024-06-25 23:50:00
        |u1,t2,2024-06-25 12:00:00
        |""".stripMargin)
    val stream = IncrementalIngest.streamsSource(spark, in)
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .drop("_corrupt_record")
      .withColumnRenamed("listen_time", "timestamp")
    val q = StreamingKpis.trendingPlayCounts(stream, "24 hours", "6 hours", "25 hours")
      .writeStream.format("memory").queryName("trend_counts")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$base/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("trend_counts")
      .collect().map(r => (r.getTimestamp(0).toString.take(16), r.getString(2), r.getLong(3))).toSet

    // batch equivalent of the same sliding-window semantics
    import org.apache.spark.sql.functions._
    val batch = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .schema(graft.model.Schemas.streams).csv(s"$in/s1.csv")
      .withColumnRenamed("listen_time", "timestamp")
      .groupBy(window(col("timestamp"), "24 hours", "6 hours").as("w"), col("track_id"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0).toString.take(16),
        r.getString(1), r.getLong(2))).toSet
    got shouldBe batch
    // the 24h/6h slide puts each event in 4 windows; the 00:00-aligned
    // window contains all three t1 plays (00:10, 05:30, 23:50)
    got.filter(_._2 == "t1").map(_._3).max shouldBe 3L
  }

  test("streaming sessionize agrees with the batch ground truth EXACTLY once the watermark passes the gap") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val plays = Seq(
      StreamingKpis.Play("a", ts("2024-06-25 08:00:00")),
      StreamingKpis.Play("a", ts("2024-06-25 08:20:00")),
      StreamingKpis.Play("a", ts("2024-06-25 11:00:00")), // closes session 1; then abandoned
      StreamingKpis.Play("b", ts("2024-06-25 09:00:00")),
      StreamingKpis.Play("b", ts("2024-06-25 12:00:00")), // closes b's session 1
      StreamingKpis.Play("b", ts("2024-06-25 12:10:00"))) // abandoned
    val mem = MemoryStream[StreamingKpis.Play]
    val q = StreamingKpis.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_agree")
      .outputMode(OutputMode.Append()).start()
    mem.addData(plays: _*)
    q.processAllAvailable()
    // a later event from an unrelated user pushes the watermark past
    // every a/b session's (end + gap): abandoned sessions must flush
    // via event-time timeout, with no successor event
    mem.addData(StreamingKpis.Play("z", ts("2024-06-25 14:00:00")))
    q.processAllAvailable(); q.stop()
    val streamingClosed = spark.table("sessions_agree")
      .filter(col("user_id") =!= "z")
      .select("user_id", "session_start", "session_end", "plays")
      .collect().map(_.toSeq).toSet

    // ALL batch sessions, open ones included — the timeout flush makes
    // the streaming output converge to the full batch ground truth
    val batchAll = graft.ops.Sessionize.sessions(
      plays.toDF(), "user_id", "ts", gapMinutes = 30)
      .select(col("user_id"), col("session_start"), col("session_end"), col("plays"))
      .collect().map(_.toSeq).toSet
    streamingClosed shouldBe batchAll
    streamingClosed.size shouldBe 4
  }

  test("streaming KPIs serve to the KV store; update-mode re-emits overwrite by pkeys") {
    import org.apache.spark.sql.functions._
    val base = tmpDir("sserve")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    Files.writeString(Paths.get(s"$in/s1.csv"),
      """user_id,track_id,listen_time
        |u1,t1,2024-06-25 01:00:00
        |u2,t1,2024-06-25 02:00:00
        |""".stripMargin)
    val store = new graft.serve.KpiSink.InMemoryKvStore()
    def run(): Unit = {
      val stream = IncrementalIngest.streamsSource(spark, in)
        .filter(col("_corrupt_record").isNull).drop("_corrupt_record")
        .withColumnRenamed("listen_time", "timestamp")
      val items = StreamingKpis.dailyGenreMetrics(
        stream.withColumn("track_genre", lit("rock"))
          .withColumn("track_id", col("track_id"))
          .withColumn("duration_ms", lit(60000L)))
        .select(
          concat(lit("GENRE_DAILY_"), col("track_genre"), lit("_"),
            date_format(col("date"), "yyyy-MM-dd")).as("id"),
          lit("2024-07-01T00:00:00").as("timestamp"),
          col("listen_count"))
      // fresh checkpoint per run: the store, not the sink log, is the
      // idempotency boundary (overwrite-by-pkeys)
      StreamingKpis.serveToStore(items, store, s"$base/ck${System.nanoTime()}")
    }
    run()
    store.size shouldBe 1
    store.getItem("GENRE_DAILY_rock_2024-06-25", "2024-07-01T00:00:00")
      .get("listen_count") shouldBe 2L

    // a third play lands; the re-run re-emits the updated group and the
    // store overwrites the same key with the refined count
    Files.writeString(Paths.get(s"$in/s2.csv"),
      """user_id,track_id,listen_time
        |u3,t1,2024-06-25 03:00:00
        |""".stripMargin)
    run()
    store.size shouldBe 1
    store.getItem("GENRE_DAILY_rock_2024-06-25", "2024-07-01T00:00:00")
      .get("listen_count") shouldBe 3L
  }

  test("sessionize groups plays by gap and emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingKpis.Play]
    val q = StreamingKpis.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: u1 has two plays 10 min apart (one session, still open)
    mem.addData(StreamingKpis.Play("u1", ts("2024-06-25 10:00:00")),
      StreamingKpis.Play("u1", ts("2024-06-25 10:10:00")))
    q.processAllAvailable()
    // batch 2: a play 2 hours later closes the first session
    mem.addData(StreamingKpis.Play("u1", ts("2024-06-25 12:30:00")))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[StreamingKpis.UserSession].collect()
    closed.length shouldBe 1
    closed.head.plays shouldBe 2
    closed.head.duration_min shouldBe 10.0
    q.stop()
  }
}
