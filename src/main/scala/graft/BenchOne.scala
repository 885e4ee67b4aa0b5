package graft

import org.apache.spark.sql.DataFrame

/** Dev tool: time a subset of `SparkEntry.queries` (args = query names)
  * on `SPARK_GRAFT_SF_DIR` with the same methodology as [[Bench]]
  * (noop-sink materialization, one warm-up, median of 3). Not part of
  * the driver contract — a fast inner loop for perf work on one query.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench-one")
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      materialize(fn(spark, sfDir)) // warm-up
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        materialize(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bench-one] $name%-24s median=${runs.sorted.apply(1)}%.3f s  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
