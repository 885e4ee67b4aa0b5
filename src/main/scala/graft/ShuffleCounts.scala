package graft

/** Dev tool: print the shuffle-exchange count of each registered query's
  * plan at a corpus dir — the source of the pinned budgets in
  * `PlanAuditSpec` (a new Exchange in a headline plan is a regression a
  * human should sign off on, not a silent diff).
  */
object ShuffleCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get("graft-shuffles")
    names.foreach { n =>
      try {
        val c = graft.ops.Bucketing.shuffleCount(SparkEntry.queries(n)(spark, sfDir))
        println(s"[shuffles] $n $c")
      } catch { case e: Throwable =>
        println(s"[shuffles] $n ERR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(80)}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
