package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: the 100 TB dedup anchors at a given corpus dir, with
  * CORPUS-RELATIVE knobs (maxDf scales with |docs| — the registered
  * entries pin absolute values sized for the oracle corpus; a fair scale
  * probe keeps the df FRACTION constant, which is how the knob is set in
  * production). Prints cold/warm times plus output row counts, so a run
  * that went fast by finding nothing is visible as such.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.Scale100 <maxDf> [op ...]
  * (ops default to all; names below)
  */
object Scale100 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxDf = if (args.nonEmpty) args(0).toInt else 5
    val picked = args.drop(1).toSet
    val spark = GraftSession.get("graft-scale100")
    def run(name: String)(fn: => DataFrame): Unit =
      if (picked.isEmpty || picked(name)) {
        val t0 = System.nanoTime()
        val n0 = fn.count() // cold pass materializes + counts output
        val cold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        fn.write.format("noop").mode("overwrite").save()
        val warm = (System.nanoTime() - t1) / 1e9
        println(f"[scale] $name%-22s cold $cold%8.2f s  warm $warm%8.2f s  rows $n0%d")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    val docs = TestTables.table(spark, sfDir, "documents")
    val emb = TestTables.table(spark, sfDir, "embeddings")

    run("dedup_pairs_maxdf")(graft.ops.Dedup.nearDupPairsExact(
      docs, "doc_id", "text", n = 3, tau = 0.5, maxDf = Some(maxDf)))
    run("dedup_canonical")(graft.ops.Dedup.nearDupPairsCanonical(
      docs, "doc_id", "text", n = 3, tau = 0.5, maxDf = Some(maxDf)))
    run("dedup_minhash")(graft.ops.Dedup.nearDupPairsMinHash(
      docs, "doc_id", "text", n = 3, tau = 0.5))
    run("overlap_matrix")(graft.ops.Dedup.sourceOverlapMatrix(
      docs, "doc_id", "text", "source", n = 3, tau = 0.3, maxDf = Some(maxDf * 10)))
    // production SemDeDup regime: high tau, selective 16-bit bands (the
    // registered q_semdedup_lsh pins the plan shape at tau=0.45 on the
    // 2k oracle corpus; at probe scale that config's band-collision
    // volume approaches all-pairs — collision volume IS banded LSH cost)
    run("semdedup_lsh")(graft.ops.Similarity.semDedupDrops(
      emb, "vec_id", "embedding", tau = 0.95, nPlanes = 64, bandBits = 16))
    spark.stop()
  }
}
