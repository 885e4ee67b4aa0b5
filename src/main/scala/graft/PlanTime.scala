package graft

/** Dev tool (r13): split per-query wall into PLANNING (analyze+optimize+
  * physical planning of the initial plan) vs EXECUTION (noop sink run).
  * Large plans with many repeated subtree references (a producer consumed
  * by several broadcast branches) can spend seconds in the driver-side
  * optimizer — invisible in stage metrics, absent in BenchOne's
  * cache-warmed runs, and multiplied by Bench's 1 warm-up + 3 passes.
  * `runMain graft.PlanTime <sfDir> q…` prints both per pass.
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get("graft-plantime")
    args.drop(1).foreach { n =>
      (1 to 2).foreach { pass =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val qe = df.queryExecution
        qe.executedPlan // forces analysis, optimization, physical planning
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[plantime] $n pass$pass plan=${(t1 - t0) / 1e9}%.2f s exec=${(t2 - t1) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
