package graft.serve

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.kpi.KpiQueries

object DelayCapture {
  val delays = new java.util.concurrent.CopyOnWriteArrayList[Long]()
}

class ServeSpec extends SparkSpec {
  import spark.implicits._

  private val runTs = "2024-07-01T00:00:00"

  private lazy val enriched = KpiQueries.prepareStreamingData(
    Seq(("u1", "t1", "2024-06-25 10:00:00"), ("u2", "t9", "2024-06-25 11:00:00"))
      .toDF("user_id", "track_id", "listen_time")
      .withColumn("listen_time", to_timestamp(col("listen_time"))),
    Seq(("t1", "T", "A", "rock", 60000L)).toDF("track_id", "track_name", "artists", "track_genre", "duration_ms"),
    Seq(("u1", "Alice", "US")).toDF("user_id", "user_name", "user_country"))

  test("key synthesis formats: space date in ids, T date in attributes, None for null genre") {
    val items = KpiItems.genreDailyItems(KpiQueries.genreDailyMetrics(enriched), runTs)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    items.keySet shouldBe Set(
      "GENRE_DAILY_rock_2024-06-25 00:00:00",
      "GENRE_DAILY_None_2024-06-25 00:00:00")
    val rock = items("GENRE_DAILY_rock_2024-06-25 00:00:00")
    rock.getAs[String]("date") shouldBe "2024-06-25T00:00:00"
    rock.getAs[String]("timestamp") shouldBe runTs
    // null-genre group: total_time sums nothing -> coalesced to 0.0
    items("GENRE_DAILY_None_2024-06-25 00:00:00").getAs[Double]("total_time") shouldBe 0.0
  }

  test("user items coalesce null aggregates and synthesize USER_ keys") {
    val items = KpiItems.userItems(KpiQueries.userKpis(enriched), runTs)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    items.keySet shouldBe Set("USER_u1", "USER_u2")
    items("USER_u2").getAs[Double]("total_time") shouldBe 0.0 // t9 misses the dim
    items("USER_u1").getAs[Double]("total_time") shouldBe 1.0
  }

  test("toItem: floats to BigDecimal(str), nulls omitted, scalars passed") {
    val row = Seq((1.5, "x", null.asInstanceOf[String], 3L))
      .toDF("d", "s", "n", "l").collect().head
    val item = KpiSink.toItem(row)
    item("d") shouldBe BigDecimal("1.5")
    item("s") shouldBe "x"
    item("l") shouldBe 3L
    item.contains("n") shouldBe false
  }

  test("sink batches at 25 and applies overwrite-by-pkeys") {
    val store = new KpiSink.InMemoryKvStore()
    val items = (1 to 60).map(i => (s"ID_$i", runTs, i)).toDF("id", "timestamp", "v")
      .coalesce(1)
    KpiSink.write(items, store)
    store.size shouldBe 60
    store.batchSizeHistogram shouldBe Map(25 -> 2, 10 -> 1)
    // overwrite on the same (id, timestamp)
    KpiSink.write(items.withColumn("v", col("v") * 10), store)
    store.size shouldBe 60
    store.get("ID_1", runTs).get("v") shouldBe 10
  }

  test("sink retries throttled batches with exponential backoff then succeeds") {
    val store = new KpiSink.InMemoryKvStore(throttleFirstN = 3)
    DelayCapture.delays.clear()
    val items = (1 to 5).map(i => (s"ID_$i", runTs)).toDF("id", "timestamp").coalesce(1)
    // the sleep closure runs on executors; DelayCapture is a JVM singleton
    // so local-mode executors and the test thread see the same list
    KpiSink.write(items, store, sleep = d => DelayCapture.delays.add(d))
    store.size shouldBe 5
    import scala.jdk.CollectionConverters._
    DelayCapture.delays.asScala.toSeq shouldBe Seq(1000L, 2000L, 4000L)
  }

  test("sink gives up after maxRetries") {
    val store = new KpiSink.InMemoryKvStore(throttleFirstN = 100)
    val items = Seq(("A", runTs)).toDF("id", "timestamp").coalesce(1)
    val e = intercept[Exception] {
      KpiSink.write(items, store, maxRetries = 2, sleep = _ => ())
    }
    e.getMessage should include("throttled")
  }

  test("DataSource V2 path: df.write.format(graft.serve.kv) batches into the store") {
    val store = new KpiSink.InMemoryKvStore()
    val items = (1 to 60).map(i => (s"V2_$i", runTs, i.toDouble))
      .toDF("id", "timestamp", "score").coalesce(1)
    items.write.format("graft.serve.KvDataSource")
      .option("store", store.id).mode("append").save()
    store.size shouldBe 60
    store.batchSizeHistogram shouldBe Map(25 -> 2, 10 -> 1)
    // float coercion flows through the same toItem path
    store.get("V2_1", runTs).get("score") shouldBe BigDecimal("1.0")
  }

  test("trending and top-songs items carry reference id shapes") {
    val tr = KpiItems.trendingItems(KpiQueries.trendingKpis(enriched), runTs)
      .select("id").collect().map(_.getString(0)).toSet
    tr shouldBe Set("TRENDING_t1", "TRENDING_t9")
    val ts = KpiItems.topSongsItems(KpiQueries.genreTopSongs(enriched), runTs)
      .select("id").collect().map(_.getString(0)).toSet
    ts shouldBe Set(
      "GENRE_TOP_SONGS_rock_2024-06-25 00:00:00_t1",
      "GENRE_TOP_SONGS_None_2024-06-25 00:00:00_t9")
  }
}
