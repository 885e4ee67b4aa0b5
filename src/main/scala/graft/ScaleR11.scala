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

    def table(name: String): DataFrame =
      spark.read.parquet(s"$dir/$name.parquet")

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

    spark.stop()
  }
}
