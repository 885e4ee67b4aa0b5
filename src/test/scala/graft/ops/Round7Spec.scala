package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-7 pins: deterministic release of superseded `localCheckpoint`
  * blocks in the iterative operators (the round-6 in-suite bench
  * regression: `clearCache()` cannot reach checkpoint RDDs, so every
  * iteration stranded one materialized frame in the block manager).
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  /** Persistent-RDD count, after nudging the ContextCleaner's async
    * unpersists to settle (free() is non-blocking). */
  private def persistedCount(): Int = {
    Thread.sleep(50)
    spark.sparkContext.getPersistentRDDs.size
  }

  test("nearDupClusters frees superseded iteration checkpoints") {
    // a path graph a-b-c-d-e: diameter 4 forces several propagation
    // rounds, so without per-round freeing >1 checkpoint would survive
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("a_id", "b_id")
    val before = persistedCount()
    val out = Dedup.nearDupClusters(pairs)
    val got = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSet == Set("a"), "one component labeled by its min id")
    val leaked = persistedCount() - before
    // exactly the RETURNED frame's final checkpoint may remain
    assert(leaked <= 1, s"clusters stranded $leaked persistent RDDs (want <=1)")
    Checkpoints.free(out)
  }

  test("pageRank frees superseded rank frames and its shared inputs") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("src", "dst")
    val before = persistedCount()
    val out = Graph.pageRank(edges, "src", "dst", iters = 5)
    assert(out.count() == 3)
    val leaked = persistedCount() - before
    assert(leaked <= 1, s"pageRank stranded $leaked persistent RDDs (want <=1)")
    Checkpoints.free(out)
  }

  test("Checkpoints.free is a no-op on a non-checkpointed frame") {
    val df = Seq(1, 2, 3).toDF("x").filter(col("x") > 1)
    Checkpoints.free(df) // must not throw
    assert(df.count() == 2)
  }
}
