package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** End-to-end test of the packaged curation job over the SAME synthetic
  * fetch corpus `CurationPipelineSpec` hand-checks stage by stage — the
  * job must reproduce those exact survivor counts through its
  * `observe()`-riding metrics, write the curated docs + manifest
  * parquet, and be deterministic under input repartitioning.
  */
class CurationJobSpec extends SparkSpec {
  import spark.implicits._

  private def fetches: DataFrame = (1 to 200).map { i =>
    val page = i % 100
    val dom = s"site${i % 5}.com"
    val url =
      if (i < 100) s"https://WWW.$dom:443/p/$page?utm_source=x"
      else s"https://$dom/p/$page/"
    val body =
      if (page < 10) "<p>common boilerplate body shared by many pages</p>"
      else s"<p>unique content for page $page with enough words to keep</p>"
    val raw =
      if (i % 10 == 9) "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"
      else s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html><body>$body<script>x()</script></body></html>"
    (i.toLong, url, raw)
  }.toDF("doc_id", "url", "raw")

  private def runJob(in: DataFrame, dir: String): CurationJob.Result = {
    val base = Files.createTempDirectory("curation_job").toString
    in.write.parquet(s"$base/fetches")
    Seq("site4.com").toDF("domain").write.parquet(s"$base/blocklist")
    CurationJob.run(spark, CurationJob.Config(
      fetchesPath = s"$base/fetches",
      outputDir = s"$base/$dir",
      blocklistPath = Some(s"$base/blocklist"),
      budget = 40L,
      qualityFloorTokens = 5,
      shards = 4))
  }

  test("curation job reproduces the hand-checked stage counts end to end") {
    val r = runJob(fetches, "out")
    r.stageCounts("parsed") shouldBe 180L
    r.stageCounts("canonical") shouldBe 90L
    r.stageCounts("unblocked") shouldBe 80L
    r.stageCounts("text_deduped") shouldBe 73L
    r.stageCounts("quality") shouldBe 73L
    r.stageCounts("mixed") should be <= 40L
    r.stageCounts("mixed") should be >= 36L
    r.manifestRows shouldBe r.stageCounts("mixed")
  }

  test("curation job output parquet is complete and deterministic under repartitioning") {
    val base = Files.createTempDirectory("curation_det").toString
    fetches.write.parquet(s"$base/f1")
    fetches.repartition(13).write.parquet(s"$base/f2")
    Seq("site4.com").toDF("domain").write.parquet(s"$base/bl")
    def go(f: String, o: String): (CurationJob.Result, Set[(Long, Long, Long)], Set[Long]) = {
      val r = CurationJob.run(spark, CurationJob.Config(
        fetchesPath = s"$base/$f", outputDir = s"$base/$o",
        blocklistPath = Some(s"$base/bl"), budget = 40L,
        qualityFloorTokens = 5, shards = 4))
      val manifest = spark.read.parquet(s"$base/$o/manifest")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val docs = spark.read.parquet(s"$base/$o/docs")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      (r, manifest, docs)
    }
    val (r1, m1, d1) = go("f1", "o1")
    val (r2, m2, d2) = go("f2", "o2")
    r1.stageCounts shouldBe r2.stageCounts
    m1 shouldBe m2
    d1 shouldBe d2
    // manifest covers exactly the written docs, positions are 1..n per shard
    m1.map(_._1) shouldBe d1
    m1.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).toSeq.sorted shouldBe (1L to rows.size).toSeq
    }
    // the docs parquet carries the curated text columns
    spark.read.parquet(s"$base/o1/docs").columns.toSet shouldBe
      Set("doc_id", "url", "url_canon", "domain", "text")
  }
}
