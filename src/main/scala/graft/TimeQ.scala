package graft
/** Dev tool: time selected queries once (noop-materialized, warm session). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = GraftSession.get("graft-timeq")
    args.drop(1).foreach { n =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[timeq] $n pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
