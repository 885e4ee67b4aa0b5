package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: round-10 fair-100× scale probes for the r9 heavy families
  * the r9 verdict flagged as "only probed at 10×" — PCA/ABTT (both the
  * ordered-fold oracle regime and the production fold-swap), the
  * BLEU/ROUGE gram lattice, spearman, er_clusters (fixed-key blocking
  * vs the tightened prefix block), and the dedup cluster-size chain.
  *
  * Corpus: `tools/make_fairdocs.py` (documents/embeddings) +
  * `tools/make_fairparts_r10.py` (part/lineitem) into one dir.
  *
  * Usage: `runMain graft.ScaleR10 <dir> [family …]` — measures cold
  * (count) and warm (noop write) passes per family, prints one line
  * each; run once against sf0.1 and once against the fair-100× dir.
  */
object ScaleR10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val picked = args.drop(1).toSet
    val spark = GraftSession.get("graft-scale-r10")

    def run(name: String)(fn: => DataFrame): Unit =
      if (picked.isEmpty || picked(name)) {
        val t0 = System.nanoTime()
        val n0 = fn.count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"[scale-r10] $name%-18s cold $cold%8.2f s  warm $warm%8.2f s  rows $n0%d")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }

    def table(name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")

    // same fixture as SparkEntry.evalPairs (candidate = reference with
    // every 7th token dropped, every 11th reversed)
    def evalPairs: DataFrame =
      table("documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.tokens(lower(col("text"))).as("ref"))
        .filter(size(col("ref")) >= 8)
        .withColumn("cand", expr(
          """filter(transform(sequence(1, size(ref)),
            |  i -> CASE WHEN (i - 1) % 7 = 3 THEN CAST(NULL AS STRING)
            |            WHEN (i - 1) % 11 = 5 THEN reverse(ref[i - 1])
            |            ELSE ref[i - 1] END),
            |  x -> x IS NOT NULL)""".stripMargin))

    run("pca_top")(graft.ops.Pca.topComponent(
      spark, table("embeddings"), "vec_id", "embedding"))
    run("abtt")(graft.ops.Pca.projections(
      table("embeddings"), "vec_id", "embedding"))
    // production fold-swap: plain partial+final sums, no ordered folds
    run("pca_top_prod")(graft.ops.Pca.topComponent(
      spark, table("embeddings"), "vec_id", "embedding", ordered = false))
    run("abtt_prod")(graft.ops.Pca.projections(
      table("embeddings"), "vec_id", "embedding", ordered = false))

    run("bleu")(graft.ops.EvalMetrics.bleu(evalPairs, "doc_id", "cand", "ref"))
    run("bleu_corpus")(graft.ops.EvalMetrics.bleuCorpus(evalPairs, "doc_id", "cand", "ref"))
    run("rouge")(graft.ops.EvalMetrics.rouge(evalPairs, "doc_id", "cand", "ref"))

    run("spearman")(graft.ops.Stats.spearman(
      table("lineitem"), "l_returnflag",
      col("l_quantity"), round(col("l_extendedprice"))))

    // registry regime: fixed-cardinality blocking keys (brand, size,
    // first initial) — Σ|block|² grows quadratically when block COUNT is
    // fixed and depth scales with data
    run("er_clusters")(graft.ops.Dedup.nearDupClusters(
      graft.ops.Dedup.fuzzyMatchPairs(
        table("part").withColumn("p_initial", substring(col("p_name"), 1, 1)),
        "p_partkey", "p_name",
        Seq("p_brand", "p_size", "p_initial"), minSim = 0.92)))
    // production regime at scale: tighten the block with a 2-char prefix
    // (the scale lever fuzzyMatchPairs' scaladoc names) — 26× more
    // blocks, same planted-twin recall (twins share their source prefix)
    run("er_clusters_p2")(graft.ops.Dedup.nearDupClusters(
      graft.ops.Dedup.fuzzyMatchPairs(
        table("part").withColumn("p_initial", substring(col("p_name"), 1, 2)),
        "p_partkey", "p_name",
        Seq("p_brand", "p_size", "p_initial"), minSim = 0.92)))

    // production dedup chain (maxDf-bounded pairs -> CC -> histogram),
    // same regime as the r8 fair-100× dedup rows
    run("cluster_sizes")(graft.ops.Dedup.clusterSizeHistogram(
      graft.ops.Dedup.nearDupClusters(
        graft.ops.Dedup.nearDupPairsExact(
          table("documents"), "doc_id", "text", n = 3, tau = 0.5,
          maxDf = Some(5)))))

    spark.stop()
  }
}
