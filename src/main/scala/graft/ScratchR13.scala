package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch probes for the r13 OPTIMIZATION round: decompose the two
  * biggest headline families — shingle-index dedup and the co-occurrence
  * graph family — stage by stage, so the optimization targets the stage
  * that owns the cost instead of guessing (guide §1.1).
  *
  * Each probe times cold-per-pass (caches cleared between passes) because
  * several stages cache internally and a warm median would measure cache
  * reads (the BenchOne lesson, OPTIMIZATION_r13.md).
  */
object ScratchR13 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch-r13")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def t(name: String)(fn: => DataFrame): Unit = {
      clear(); mat(fn) // warm (JIT/codegen)
      val times = (1 to 3).map { _ =>
        clear(); System.gc()
        val t0 = System.nanoTime(); mat(fn); (System.nanoTime() - t0) / 1e9
      }
      println(f"[r13] $name%-34s med=${times.sorted.apply(1)}%.2f  min=${times.min}%.2f  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    val which = if (args.isEmpty) Set("dedup", "graph") else args.toSet

    if (which("dedup")) {
      val docs = TestTables.table(spark, sfDir, "documents")
      import graft.ops.Dedup
      t("sets=shingleSets(n=3)")(Dedup.shingleSets(docs, "doc_id", "text", 3))
      t("posting=explode(sets)")(
        Dedup.shingleSets(docs, "doc_id", "text", 3)
          .select(col("doc_id"), explode(col("shingles")).as("sh")))
      t("postagg=groupBy(sh)count")(
        Dedup.shingleSets(docs, "doc_id", "text", 3)
          .select(col("doc_id"), explode(col("shingles")).as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("df")))
      t("full=nearDupPairsExact")(
        Dedup.nearDupPairsExact(docs, "doc_id", "text", n = 3, tau = 0.5))
      t("full=nearDupPairsPrefix")(
        Dedup.nearDupPairsPrefix(docs, "doc_id", "text", n = 3, tau = 0.5))
      t("full=pairsMaxdf50")(
        Dedup.nearDupPairsExact(docs, "doc_id", "text", n = 3, tau = 0.5,
          maxDf = Some(50)))
      t("full=canonical")(
        Dedup.nearDupPairsCanonical(docs, "doc_id", "text", n = 3, tau = 0.5))
    }

    if (which("graph")) {
      val li = TestTables.table(spark, sfDir, "lineitem")
      import graft.ops.Graph
      t("inc-pairs=cooccurrenceEdges")(
        Graph.cooccurrenceEdges(li, "l_orderkey", "l_partkey", minSupport = 2L))
      t("digraph=cooccurrenceDigraph")(
        Graph.cooccurrenceDigraph(li, "l_orderkey", "l_partkey", minSupport = 2L))
      t("pagerank-full(3 iters)")(
        Graph.pageRank(Graph.cooccurrenceDigraph(li, "l_orderkey", "l_partkey",
          minSupport = 2L), "src", "dst", iters = 3))
      t("hits-full(2 iters)")(
        Graph.hits(Graph.cooccurrenceDigraph(li, "l_orderkey", "l_partkey",
          minSupport = 2L), "src", "dst", iters = 2))
    }

    spark.stop()
  }
}
