package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe: EXECUTED shuffle/input volume per registered query — the
  * bytes-level companion to `ShuffleCounts`' plan-level exchange count
  * (a plan can have one exchange that moves the whole corpus or five
  * that move kilobytes; bytes are the scale truth).
  *
  * Usage: runMain graft.ShuffleBytes <sfDir> [query...]
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get("graft-shuffle-bytes")
    val sc = spark.sparkContext

    @volatile var read = 0L; @volatile var write = 0L; @volatile var input = 0L
    sc.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          read += m.shuffleReadMetrics.totalBytesRead
          write += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
        }
      }
    })

    names.foreach { n =>
      try {
        // warm once so codegen/compile stages don't pollute the numbers,
        // then measure one clean execution
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
        org.apache.spark.GraftSparkInternals.drainListenerBus(sc)
        read = 0L; write = 0L; input = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkInternals.drainListenerBus(sc)
        println(f"[bytes] $n%-24s input ${input / 1e6}%9.1f MB  shuffleW ${write / 1e6}%8.1f MB  shuffleR ${read / 1e6}%8.1f MB  $sec%6.2f s")
      } catch { case e: Throwable =>
        println(s"[bytes] $n ERR ${Option(e.getMessage).getOrElse("?").take(80)}")
      } finally {
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }
    spark.stop()
  }
}
