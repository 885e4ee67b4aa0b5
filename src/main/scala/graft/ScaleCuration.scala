package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: the round-8 curation family at a probe corpus dir (the
  * fair 100× corpus from tools/make_fairdocs.py keeps lang/source, so
  * every op runs with its production knob semantics). Prints cold/warm
  * times plus output rows, Scale100-style.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ScaleCuration [op ...]
  */
object ScaleCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val picked = args.toSet
    val spark = GraftSession.get("graft-scale-curation")
    import spark.implicits._
    def run(name: String)(fn: => DataFrame): Unit =
      if (picked.isEmpty || picked(name)) {
        val t0 = System.nanoTime()
        val n0 = fn.count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"[scale] $name%-18s cold $cold%8.2f s  warm $warm%8.2f s  rows $n0%d")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }

    val docs = TestTables.table(spark, sfDir, "documents")
    val emb = TestTables.table(spark, sfDir, "embeddings")
    // same messy-URL derivation as SparkEntry.syntheticUrls
    val d = docs.filter(col("doc_id").isNotNull && col("source").isNotNull &&
      col("lang").isNotNull)
    val m = pmod(col("doc_id"), lit(4))
    val urls = d.select(col("doc_id"),
      when(m === 0, concat(lit("HTTP://WWW."), col("source"), lit(".COM:80/a/b/"),
          col("doc_id"), lit("?utm_source=x&b=2&a=1#frag")))
        .when(m === 1, concat(lit("https://cdn."), col("source"), lit(".com:443//x/"),
          col("lang"), lit("/?z=9&utm_campaign=c&fbclid=1")))
        .when(m === 2, concat(lit("https://"), col("source"), lit(".com/"),
          col("lang"), lit("/"), col("doc_id"), lit("/")))
        .otherwise(concat(lit("http://"), col("source"), lit(".com"))).as("url"))

    run("url_canon")(graft.ops.Web.canonicalize(urls, "url"))
    run("domain_cap")(graft.ops.Web.capPerDomain(urls, "url", "doc_id", maxPages = 2000))
    run("domain_block") {
      val block = Seq("src3.com", "cdn.src5.com").toDF("domain")
      graft.ops.Web.filterBlockedDomains(urls, "url", "doc_id", block, "domain")
    }
    run("temperature_mix")(graft.ops.Sampling.temperatureMix(
      d.select("doc_id", "lang"), "lang", "doc_id", budget = 30000L))
    run("shard_manifest")(graft.ops.Sampling.shardManifest(
      d.select("doc_id"), "doc_id", shards = 64))
    run("hybrid_rrf") {
      val lex = graft.ops.Retrieval.rankByScore(
        graft.ops.TextAnalysis.bm25(docs, "doc_id", "text",
          queryTerms = Seq("spark", "window", "dup"), topN = 50),
        "doc_id", "score").select(col("doc_id"), col("rank"))
      val sem = graft.ops.Similarity.knnBruteForce(
          emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rn").as("rank"))
      graft.ops.Retrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank", k = 60, topN = 25)
    }
    spark.stop()
  }
}
