package graft.kpi

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style tests over ScalaCheck-generated corpora. The
  * scalatestplus bridge isn't available offline, so generators are drawn
  * directly with fixed seeds — same coverage, fully deterministic.
  */
class KpiPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genStream = for {
    u <- Gen.choose(1, 20)
    t <- Gen.choose(1, 15)
    h <- Gen.choose(0, 72)
  } yield (s"u$u", s"t$t", f"2024-06-${25 + h / 24}%02d ${h % 24}%02d:00:00")

  private def corpus(seed: Long): List[(String, String, String)] =
    Gen.listOfN(60, genStream)(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val Seeds = Seq(1L, 2L, 3L, 4L, 5L)

  private def mkStreams(rows: List[(String, String, String)]) =
    rows.toDF("user_id", "track_id", "listen_time")
      .withColumn("listen_time", to_timestamp(col("listen_time")))

  // 15 possible tracks but only 10 in the dim, 20 users but 15 in the dim:
  // every generated corpus exercises join misses.
  private lazy val songsDim = (1 to 10).map(i =>
    (s"t$i", s"name$i", s"artist$i", s"g${i % 3}", i * 60000L))
    .toDF("track_id", "track_name", "artists", "track_genre", "duration_ms")
  private lazy val usersDim = (1 to 15).map(i => (s"u$i", s"n$i", s"c${i % 4}"))
    .toDF("user_id", "user_name", "user_country")

  test("left-join enrichment preserves fact cardinality exactly") {
    Seeds.foreach { s =>
      val rows = corpus(s)
      val e = KpiQueries.prepareStreamingData(mkStreams(rows), songsDim, usersDim)
      withClue(s"seed=$s") { e.count() shouldBe rows.size }
    }
  }

  test("user KPI total_songs_played sums to the corpus size") {
    Seeds.foreach { s =>
      val rows = corpus(s)
      val e = KpiQueries.prepareStreamingData(mkStreams(rows), songsDim, usersDim)
      withClue(s"seed=$s") {
        KpiQueries.userKpis(e).agg(sum("total_songs_played"))
          .collect().head.getLong(0) shouldBe rows.size
      }
    }
  }

  test("genreTopSongs: every rank <= k and rank-1 rows carry the group max") {
    Seeds.take(3).foreach { s =>
      val e = KpiQueries.prepareStreamingData(mkStreams(corpus(s)), songsDim, usersDim)
      val top = KpiQueries.genreTopSongs(e).cache()
      withClue(s"seed=$s") {
        top.filter(col("rank") > KpiQueries.TopSongsPerGenre).count() shouldBe 0
        val viol = top.filter(col("rank") === 1)
          .groupBy("date", "track_genre").agg(max("play_count").as("r1"))
          .join(
            e.withColumn("date", date_trunc("day", col("timestamp")))
              .groupBy("date", "track_genre", "track_id").agg(count(lit(1)).as("pc"))
              .groupBy("date", "track_genre").agg(max("pc").as("mx")),
            Seq("date", "track_genre"))
          .filter(col("r1") =!= col("mx"))
        viol.count() shouldBe 0
      }
      top.unpersist()
    }
  }

  test("unionAll cardinality is additive") {
    val (a, b) = (corpus(10), corpus(11))
    mkStreams(a).unionAll(mkStreams(b)).count() shouldBe (a.size + b.size)
  }

  test("dense_rank ties: equal play counts share rank 1 within a genre") {
    // t3 and t6 both map to genre g0 in songsDim, one play each
    val streams = mkStreams(List(
      ("u1", "t3", "2024-06-25 01:00:00"),
      ("u2", "t6", "2024-06-25 02:00:00")))
    val e = KpiQueries.prepareStreamingData(streams, songsDim, usersDim)
    val ranks = KpiQueries.genreTopSongs(e)
      .filter(col("track_genre") === "g0").select("rank")
      .collect().map(_.getInt(0)).toSeq
    ranks shouldBe Seq(1, 1)
  }

  test("trending window: per-track max is monotone under event addition") {
    val base = List(("u1", "t1", "2024-06-25 01:00:00"),
      ("u2", "t1", "2024-06-25 05:00:00"))
    val more = ("u3", "t1", "2024-06-25 03:00:00") :: base
    def maxPlays(rows: List[(String, String, String)]): Long =
      KpiQueries.trendingKpis(
        KpiQueries.prepareStreamingData(mkStreams(rows), songsDim, usersDim))
        .filter(col("track_id") === "t1")
        .collect().head.getLong(2)
    maxPlays(base) shouldBe 2L
    maxPlays(more) shouldBe 3L
  }
}
