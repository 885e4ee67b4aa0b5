package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: round-11 fair-100× scale probes for the r10 graph family
  * (the r10 verdict's "only sf0.1 evidence" block): community
  * modularity, Jaccard link prediction (the wedge join is the family's
  * quadratic risk), degree assortativity, bounded-hop BFS, 2-round
  * label propagation, bipartite HITS, and local clustering.
  *
  * Corpus: `tools/make_fairgraph_r11.py` — 100 DISJOINT key-shifted
  * copies of the sf0.1 co-occurrence graph (both basket AND item keys
  * shift per copy), so nodes/edges scale ×100 at the ORIGINAL degree
  * distribution and linear wall-clock is the pass criterion.
  *
  * Usage: `runMain graft.ScaleR11 <dir> [family …]` — run once against
  * sf0.1 and once against the fair-100× dir; ratios go to PERF.md.
  */
object ScaleR11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val picked = args.drop(1).toSet
    val spark = GraftSession.get("graft-scale-r11")

    def run(name: String)(fn: => DataFrame): Unit =
      if (picked.isEmpty || picked(name)) {
        val t0 = System.nanoTime()
        val n0 = fn.count()
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"[scale-r11] $name%-18s cold $cold%8.2f s  warm $warm%8.2f s  rows $n0%d")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }

    // schema-adaptive reader: make_bigdata re-emits events.ts as BIGINT
    // nanos, which TestTables normalizes (raw spark.read would fail on
    // hour(ts)); identical for the driver-generated dirs
    def table(name: String): DataFrame =
      TestTables.table(spark, dir, name)

    run("modularity")(graft.ops.Graph.communityModularity(
      table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L))

    run("jaccard_link")(graft.ops.Graph.jaccardLinks(
      table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L))

    run("assortativity")(graft.ops.Graph.degreeAssortativity(
      table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L))

    run("bfs_hops")(graft.ops.Graph.bfsHops(
      graft.ops.Graph.cooccurrenceDigraph(
        table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L),
      "src", "dst",
      table("part").filter(pmod(col("p_partkey"), lit(997)) === 0),
      "p_partkey", maxHops = 3))

    run("label_prop")(graft.ops.Graph.labelPropagation(
      graft.ops.Graph.cooccurrenceDigraph(
        table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L),
      "src", "dst", rounds = 2))

    run("local_clustering")(graft.ops.Graph.localClustering(
      table("lineitem"), "l_orderkey", "l_partkey", minSupport = 2L))

    run("hits") {
      val edges = table("lineitem")
        .join(table("orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_custkey").isNotNull && col("l_partkey").isNotNull)
        .select(concat(lit("C"), col("o_custkey")).as("src"),
          concat(lit("P"), col("l_partkey")).as("dst"))
      graft.ops.Graph.hits(edges, "src", "dst", iters = 2)
    }

    // ---- r11 operator-batch probes (sf0.1 vs make_bigdata 10×).
    // EXPLICIT-PICK ONLY: the fair-100× graph corpus has no events/
    // documents/embeddings tables, so the no-args default sweep stays
    // graph-only.
    if (picked.nonEmpty) {

    run("fleiss")(graft.ops.Stats.fleissKappa(
      table("events"), "user_id", "event_type", col("event_id"), 8))

    run("stable_hist")(graft.ops.Privacy.stableHistogram(
      table("events").withColumn("cat", concat(col("event_type"),
        lit("@"), hour(col("ts")).cast("string"))),
      "user_id", "cat", maxCatsPerUnit = 4, epsilon = 1.0, tau = 12.0))

    run("query_likelihood")(graft.ops.TextAnalysis.queryLikelihood(
      table("documents"), "doc_id", "text",
      Seq("spark", "window", "dup"), mu = 2000.0, topN = 50))

    run("pass_at_k")(graft.ops.EvalMetrics.passAtK(
      table("events"), "user_id", col("event_type") === "purchase", 5))

    run("cliffs")(graft.ops.Stats.cliffsDelta(
      table("events").filter(col("event_type").isin("purchase", "click")),
      col("event_type") === "purchase",
      round(col("value") * 100).cast("long")))

    run("mmr") {
      val e = table("embeddings")
      val knn = graft.ops.Similarity.knnBruteForce(
        e, e.filter(col("vec_id") % 1000 === 0), "vec_id", "embedding", 8)
      graft.ops.Similarity.mmrSelect(
        knn.join(e.select(col("vec_id").as("neighbor_id"), col("embedding")),
          "neighbor_id"),
        "query_id", "neighbor_id", "sim", "embedding", k = 4, lambda = 0.7)
    }

    }

    spark.stop()
  }
}
