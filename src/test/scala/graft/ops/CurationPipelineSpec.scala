package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end crawl-curation chain over synthetic fetches — the
  * round-8 web family composed the way a production pipeline runs it:
  *
  *   parseHttp → (200 ∧ text/html) → stripHtml → canonicalize →
  *   URL-dedup (cap 1 per url_canon) → domain blocklist →
  *   exact text-dedup (fingerprint) → quality floor →
  *   temperatureMix by domain → shardManifest
  *
  * Each stage's contract is asserted on the survivors, and the whole
  * chain is re-run on a repartitioned input to pin end-to-end
  * determinism (every selection step is hash-order-based, so the final
  * manifest must be IDENTICAL row-for-row).
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  // 200 fetches; ids i and i+100 are transport-noise variants of the
  // SAME page (same canonical URL); i%10==9 fetches failed (404);
  // i%100<10 pages share one boilerplate body (exact text dups);
  // site4.com is blocklisted; bodies otherwise unique and long enough
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

  private def runChain(in: DataFrame): (Map[String, Long], Array[(Long, Long, Long)]) = {
    var counts = Map.empty[String, Long]
    def stage(name: String)(df: DataFrame): DataFrame = {
      val out = df.cache()
      counts += name -> out.count(); out
    }
    val fetched = stage("parsed") {
      Web.parseHttp(in, "raw")
        .filter(col("status_code") === 200 && col("content_type") === "text/html")
    }
    val texts = stage("stripped") {
      fetched.withColumn("text", TextAnalysis.stripHtml(col("body")))
    }
    val canon = stage("canonical") {
      Sampling.capPerGroup(Web.canonicalize(texts, "url"), "url_canon", "doc_id", 1)
    }
    val unblocked = stage("unblocked") {
      Web.filterBlockedDomains(canon, "url", "doc_id",
        Seq("site4.com").toDF("domain"), "domain")
    }
    val deduped = stage("text_deduped") {
      Sampling.capPerGroup(
        unblocked.withColumn("_fp", md5(TextAnalysis.normalizeText(col("text")))),
        "_fp", "doc_id", 1)
    }
    val quality = stage("quality") {
      deduped.filter(TextAnalysis.tokenCount(col("text")) >= 5)
    }
    val mixed = stage("mixed") {
      Sampling.temperatureMix(quality, "domain", "doc_id", budget = 40L)
    }
    val manifest = Sampling.shardManifest(mixed.select("doc_id"), "doc_id", shards = 4)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (counts, manifest)
  }

  test("curation chain: per-stage contracts and hand-checkable counts") {
    val (counts, manifest) = runChain(fetches)
    // 200 fetches, 1 in 10 is a 404 → 180 parsed pages
    counts("parsed") shouldBe 180L
    counts("stripped") shouldBe 180L
    // both variants of a page share the last digit, so the 10 pages
    // ending in 9 lost BOTH fetches: 100 − 10 canonical pages survive
    counts("canonical") shouldBe 90L
    // site4.com pages are page%5==4 (20 of 100), and every 404'd page
    // (…9) is one of them — 10 site4 survivors get blocked
    counts("unblocked") shouldBe 80L
    // boilerplate pages {0..9}: page 9 gone (404), page 4 blocked →
    // 8 surviving exact dups collapse to 1 representative
    counts("text_deduped") shouldBe 73L
    counts("quality") shouldBe 73L      // every body clears the floor
    counts("mixed") should be <= 40L
    counts("mixed") should be >= 36L    // floor quotas undershoot ≤ 1/source
    // the manifest covers exactly the mixed survivors, no gaps
    manifest.length.toLong shouldBe counts("mixed")
    manifest.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).sorted.toSeq shouldBe (1L to rows.length).toSeq
    }
  }

  test("curation chain is deterministic end to end under repartitioning") {
    val (c1, m1) = runChain(fetches)
    val (c2, m2) = runChain(fetches.repartition(13))
    c1 shouldBe c2
    m1.toSet shouldBe m2.toSet
  }
}
