package graft.kpi

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.validate.Validator

/** Parity run on the reference's SHIPPED sample data — the engine's
  * ingest + KPI path over the actual `data/streams/streams{1,2,3}.csv`
  * (3 × 11,346 rows) and `data/users/users.csv` (50,000 rows) the
  * reference processes. Its songs.csv is absent from the snapshot
  * (`.MISSING_LARGE_BLOBS`), so song-side enrichment is exercised with
  * every join missing (null genre/duration) — exactly what the
  * reference would produce on these inputs without its dim.
  */
class GoldenReferenceDataSpec extends SparkSpec {

  private val refData = "/root/reference/data"

  private lazy val streams = Validator.processStreams(spark,
    Seq(s"$refData/streams/streams1.csv", s"$refData/streams/streams2.csv",
      s"$refData/streams/streams3.csv"))
  private lazy val users = Validator.processReferenceData(spark, s"$refData/users/users.csv")
    .select(col("user_id").cast("string").as("user_id"), col("user_name"), col("user_country"))
  private lazy val emptySongs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("track_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("track_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("artists", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("track_genre", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("duration_ms", org.apache.spark.sql.types.LongType))))
  private lazy val enriched = KpiQueries.persistEnriched(
    KpiQueries.prepareStreamingData(streams, emptySongs, users))

  test("ingest: all 34,038 shipped stream rows validate clean, all on 2024-06-25") {
    streams.count() shouldBe 3 * 11346
    val days = streams.select(date_trunc("day", col("listen_time")).as("d"))
      .distinct().collect().map(_.getTimestamp(0).toString.take(10))
    days.toSet shouldBe Set("2024-06-25")
  }

  test("users dim: 50,000 rows, ids join the stream fact") {
    users.count() shouldBe 50000
    // every stream user id resolves in the dim (reference generated them so)
    enriched.filter(col("user_name").isNull).count() shouldBe 0
  }

  test("user KPIs on shipped data: totals add up, null listening time throughout") {
    val kpis = KpiQueries.userKpis(enriched).cache()
    kpis.agg(sum("total_songs_played")).collect().head.getLong(0) shouldBe 34038
    // no songs dim -> duration_ms null everywhere -> sums/avgs all null
    kpis.filter(col("total_listening_time_minutes").isNotNull).count() shouldBe 0
    kpis.unpersist()
  }

  test("genre KPIs on shipped data: single null-genre group per day") {
    val daily = KpiQueries.genreDailyMetrics(enriched).collect()
    daily.length shouldBe 1
    daily.head.getString(1) shouldBe null          // track_genre
    daily.head.getLong(2) shouldBe 34038           // listen_count
  }

  test("trending on shipped data: every track ranked, plays bounded by corpus") {
    val trending = KpiQueries.trendingKpis(enriched).cache()
    trending.count() shouldBe
      streams.select("track_id").distinct().count()
    val top = trending.limit(1).collect().head
    top.getLong(2) should be >= 1L
    trending.unpersist()
  }
}
