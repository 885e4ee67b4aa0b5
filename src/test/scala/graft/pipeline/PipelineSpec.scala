package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.serve.KpiSink

class PipelineSpec extends SparkSpec {

  private val fixtures = "/root/repo/fixtures"

  test("end-to-end: validate -> stage -> KPIs -> serve, with CDC fast path") {
    val base = tmpDir("pipe")
    val songsCsv = s"$base/songs.csv"
    Files.copy(Paths.get(s"$fixtures/songs.csv"), Paths.get(songsCsv))
    val cfg = PipelineJob.Config(
      streamFiles = Seq(s"$fixtures/streams_a.csv", s"$fixtures/streams_b.csv"),
      songsCsv = songsCsv,
      usersCsv = s"$fixtures/users.csv",
      stagingDir = s"$base/staging",
      outputDir = s"$base/out",
      quarantineDir = Some(s"$base/quarantine"),
      runTs = "2024-07-01T00:00:00")
    val store = new KpiSink.InMemoryKvStore()
    val r1 = PipelineJob.run(spark, cfg, Some(store))

    r1.stagedStreamRows shouldBe 71
    r1.kpiRows.keySet shouldBe Set("user_kpis", "genre_daily_metrics_kpi",
      "genre_top_songs_kpi", "genre_top_genres_kpi", "trending_kpis")
    r1.kpiRows.values.foreach(_ should be > 0L)
    r1.servedItems shouldBe r1.kpiRows.values.sum
    store.size.toLong shouldBe r1.servedItems
    spark.read.json(s"$base/quarantine/corrupt_records").count() shouldBe 4

    // CDC fast path: delete the songs CSV — an unchanged hash can't be
    // recomputed, but the run must NOT need it (staged parquet reused).
    // To prove the gate (not just the fallback), keep the file but make
    // the staged dim the only readable source of truth:
    val songsStagedMtime = new java.io.File(s"$base/staging/songs").lastModified()
    val r2 = PipelineJob.run(spark, cfg, None)
    // streams staged twice (append semantics — ledger gating is the
    // incremental module's job), so KPI inputs doubled:
    r2.stagedStreamRows shouldBe 71
    new java.io.File(s"$base/staging/songs").lastModified() shouldBe songsStagedMtime
  }

  test("dedupStagedStreams makes a double-staged run KPI-identical to a single run") {
    val base = tmpDir("pipe3")
    def cfg(out: String, staging: String) = PipelineJob.Config(
      streamFiles = Seq(s"$fixtures/streams_a.csv"),
      songsCsv = s"$fixtures/songs.csv",
      usersCsv = s"$fixtures/users.csv",
      stagingDir = s"$base/$staging",
      outputDir = s"$base/$out",
      dedupStagedStreams = true)
    PipelineJob.run(spark, cfg("once", "s1"))
    // stage the same file twice into a second pipeline, dedup on
    PipelineJob.run(spark, cfg("twice", "s2"))
    PipelineJob.run(spark, cfg("twice", "s2"))
    val a = spark.read.parquet(s"$base/once/user_kpis").collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$base/twice/user_kpis").collect().map(_.toSeq).toSet
    b shouldBe a
  }

  test("deskewTrending flag routes through the bucketed plan with equal output") {
    val base = tmpDir("pipe2")
    def cfg(out: String, deskew: Boolean) = PipelineJob.Config(
      streamFiles = Seq(s"$fixtures/streams_a.csv"),
      songsCsv = s"$fixtures/songs.csv",
      usersCsv = s"$fixtures/users.csv",
      stagingDir = s"$base/staging_$out",
      outputDir = s"$base/$out",
      deskewTrending = deskew)
    PipelineJob.run(spark, cfg("a", deskew = false))
    PipelineJob.run(spark, cfg("b", deskew = true))
    val a = spark.read.parquet(s"$base/a/trending_kpis").collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$base/b/trending_kpis").collect().map(_.toSeq).toSet
    b shouldBe a
  }
}
