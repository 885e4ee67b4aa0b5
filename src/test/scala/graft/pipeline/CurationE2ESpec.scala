package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StreamingCuration

final case class E2eFetch(doc_id: Long, url: String, raw: String, ts: Timestamp)

/** The reference's pipeline-of-jobs shape (an orchestrated DAG of
  * ingest job → transform job → serve job,
  * `dags/music_streaming_pipeline.py:888-937`) re-expressed over the
  * curation surface as TWO runnable engine jobs composed end to end:
  *
  *   job 1 (streaming, `Trigger.AvailableNow`): the ingest-time
  *     blocklist gate — blocked domains never reach the corpus store
  *     (the compliance posture: filtered at the edge, not at use time);
  *   job 2 (batch): [[CurationJob.run]] — the full curation chain +
  *     shard manifest over whatever the gate admitted.
  *
  * The spec's claim is CONVERGENCE: running job 1 then job 2 produces
  * byte-identical docs/ + manifest/ to running job 2 alone over the raw
  * deliveries. That holds because the streamed pre-gate only removes
  * rows the batch chain's own blocklist stage would remove, and the
  * removal COMMUTES with the URL-canonical cap: `url_canon` preserves
  * the host, so every member of a cap group shares one domain and one
  * blocklist verdict — dropping blocked rows early can never promote a
  * different cap-group winner. (A blocklist keyed on anything that can
  * differ WITHIN a canon group — e.g. full URL path patterns — would
  * not commute; the gate is domain-suffix-only by contract.)
  */
class CurationE2ESpec extends SparkSpec {
  import spark.implicits._

  private def t(i: Int) = Timestamp.valueOf(f"2024-06-25 08:${i / 60}%02d:${i % 60}%02d")

  private def fetches: Seq[E2eFetch] = (1 to 200).map { i =>
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
    E2eFetch(i.toLong, url, raw, t(i))
  }

  private def manifestSet(dir: String): Set[(Long, Int, Long)] =
    spark.read.parquet(s"$dir/manifest")
      .select(col("doc_id").cast("long"), col("shard").cast("int"),
        col("pos").cast("long"))
      .as[(Long, Int, Long)].collect().toSet

  private def docsSet(dir: String): Set[(Long, String, String)] =
    spark.read.parquet(s"$dir/docs")
      .select(col("doc_id").cast("long"), col("url_canon"), col("text"))
      .as[(Long, String, String)].collect().toSet

  test("pipeline of jobs: streaming ingest gate -> batch CurationJob -> manifest " +
    "converges to the pure-batch CurationJob over the raw deliveries") {
    val base = java.nio.file.Files.createTempDirectory("curation_jobs_e2e").toString
    val all = fetches

    // three crawl deliveries land as separate parquet files
    all.take(70).toDF().coalesce(1).write.mode("append").parquet(s"$base/src")
    all.slice(70, 150).toDF().coalesce(1).write.mode("append").parquet(s"$base/src")
    all.drop(150).toDF().coalesce(1).write.mode("append").parquet(s"$base/src")

    val blocklist = Seq("site4.com").toDF("domain")
    blocklist.write.parquet(s"$base/blocklist")

    // job 1: streaming blocklist gate, raw rows preserved, drain-and-stop
    val stream = spark.readStream
      .schema(all.take(1).toDF().schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/src")
    val q = StreamingCuration.filterBlockedDomainsStream(
        stream, "url", blocklist, "domain")
      .writeStream.format("parquet")
      .option("path", s"$base/gated")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true

    // the gate actually removed the blocked domain's rows at ingest
    val gatedRows = spark.read.parquet(s"$base/gated")
    gatedRows.count() shouldBe 160L // 200 - site4.com's 40
    gatedRows.filter(col("url").contains("site4.com")).count() shouldBe 0L

    def cfg(in: String, out: String) = CurationJob.Config(
      fetchesPath = in, outputDir = out,
      blocklistPath = Some(s"$base/blocklist"),
      budget = 40L, qualityFloorTokens = 5, shards = 4)

    // job 2 over the gated store; reference run over the raw deliveries
    val viaGate = CurationJob.run(spark, cfg(s"$base/gated", s"$base/out_gated"))
    val pureBatch = CurationJob.run(spark, cfg(s"$base/src", s"$base/out_batch"))

    // upstream counts differ (the gate already shaved the blocked rows)…
    viaGate.stageCounts("parsed") should be < pureBatch.stageCounts("parsed")
    // …but from the blocklist stage on, the chains are row-identical
    viaGate.stageCounts("unblocked") shouldBe pureBatch.stageCounts("unblocked")
    viaGate.stageCounts("text_deduped") shouldBe pureBatch.stageCounts("text_deduped")
    viaGate.stageCounts("quality") shouldBe pureBatch.stageCounts("quality")
    viaGate.stageCounts("mixed") shouldBe pureBatch.stageCounts("mixed")
    viaGate.manifestRows shouldBe pureBatch.manifestRows

    // the written artifacts converge row-for-row
    docsSet(s"$base/out_gated") shouldBe docsSet(s"$base/out_batch")
    val m1 = manifestSet(s"$base/out_gated")
    m1 shouldBe manifestSet(s"$base/out_batch")
    // and the manifest is a well-formed shard layout: pos is 1..n per shard
    m1.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).toSeq.sorted shouldBe (1L to rows.size).toSeq
    }
  }
}
