package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (r8 verdict #4): the COMPOSED crawl-curation chain —
  * parseHttp → content gate → stripHtml → canonicalize → URL-dedup →
  * blocklist → exact text-dedup → quality floor → temperatureMix →
  * shardManifest — run end-to-end over a probe corpus, reporting
  * per-stage wall time and row counts. The per-op probes live in
  * [[ScaleCuration]]; this one measures the chain as a pipeline (each
  * stage timed against its cached predecessor, so the numbers are
  * stage costs, not cumulative re-computation).
  *
  * Fetches are synthesized deterministically from `documents`: the
  * SparkEntry.syntheticUrls URL shapes, bodies = the document text
  * wrapped in HTML with a script block, every 10th fetch a 404.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleChain
  */
object ScaleChain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scale-chain")
    import spark.implicits._

    val docs = TestTables.table(spark, sfDir, "documents")
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("lang").isNotNull && col("text").isNotNull)
    val m = pmod(col("doc_id"), lit(4))
    val urls =
      when(m === 0, concat(lit("HTTP://WWW."), col("source"), lit(".COM:80/a/b/"),
          col("doc_id"), lit("?utm_source=x&b=2&a=1#frag")))
        .when(m === 1, concat(lit("https://cdn."), col("source"), lit(".com:443//x/"),
          col("lang"), lit("/"), col("doc_id"), lit("?z=9&utm_campaign=c&fbclid=1")))
        .when(m === 2, concat(lit("https://"), col("source"), lit(".com/"),
          col("lang"), lit("/"), col("doc_id"), lit("/")))
        .otherwise(concat(lit("http://"), col("source"), lit(".com/"), col("doc_id")))
    val raw =
      when(pmod(col("doc_id"), lit(10)) === 9,
        lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone"))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html><body><p>"),
        col("text"),
        lit("</p><script>track()</script></body></html>")))
    val fetches = docs.select(col("doc_id"), urls.as("url"), raw.as("raw"))

    var prev: DataFrame = fetches.cache()
    val n0 = prev.count()
    println(s"[chain] fetches rows $n0")
    var total = 0.0
    def stage(name: String)(fn: DataFrame => DataFrame): Unit = {
      val out = fn(prev).cache()
      val t0 = System.nanoTime()
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      total += wall
      println(f"[chain] $name%-14s $wall%8.2f s  rows $n%d")
      prev.unpersist(false)
      prev = out
    }

    stage("parsed")(df => graft.ops.Web.parseHttp(df, "raw")
      .filter(col("status_code") === 200 && col("content_type") === "text/html"))
    stage("stripped")(df => df.withColumn("text",
      graft.ops.TextAnalysis.stripHtml(col("body"))).drop("raw", "body"))
    stage("canonical")(df => graft.ops.Sampling.capPerGroup(
      graft.ops.Web.canonicalize(df, "url"), "url_canon", "doc_id", 1))
    stage("unblocked")(df => graft.ops.Web.filterBlockedDomains(df, "url", "doc_id",
      Seq("src3.com", "cdn.src5.com").toDF("domain"), "domain"))
    stage("text_deduped")(df => graft.ops.Sampling.capPerGroup(
      df.withColumn("_fp", md5(graft.ops.TextAnalysis.normalizeText(col("text")))),
      "_fp", "doc_id", 1))
    stage("quality")(df =>
      df.filter(graft.ops.TextAnalysis.tokenCount(col("text")) >= 5))
    stage("mixed")(df => graft.ops.Sampling.temperatureMix(
      df, "domain", "doc_id", budget = math.max(40L, n0 / 20)))
    stage("manifest")(df => graft.ops.Sampling.shardManifest(
      df.select("doc_id"), "doc_id", shards = 64))
    println(f"[chain] TOTAL          $total%8.2f s")
    spark.stop()
  }
}
