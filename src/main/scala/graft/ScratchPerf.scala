package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch bench: stage-by-stage probes for whichever query family is
  * under the profiler this round. Round 8: decompose q_top_paths and
  * q_sample_stratified (the two 5× outliers of the round-7 10× table)
  * into scan / per-row-kernel / shuffle stages to attribute the factor.
  */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(fn: => DataFrame): Unit = {
      mat(fn) // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(fn); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s ${times.sorted.apply(1)}%.2f s (median of 3)")
    }
    val events = TestTables.table(spark, sfDir, "events")

    // --- q_sample_stratified decomposition
    t("strat:scan-only")(events.na.drop(Seq("event_id", "event_type")))
    t("strat:md5-filter") {
      val d = events.na.drop(Seq("event_id", "event_type"))
      d.filter(graft.ops.Sampling.hashBucket(col("event_id"), 100) < lit(50))
    }
    t("strat:full")(
      graft.ops.Sampling.stratifiedSampleByHash(
        events.na.drop(Seq("event_id", "event_type")),
        "event_id", "event_type",
        Map("click" -> 5, "purchase" -> 100, "error" -> 50))
        .groupBy("event_type").agg(count(lit(1)).as("n")))

    // --- q_top_paths decomposition
    t("paths:scan-only")(events.na.drop(Seq("user_id", "ts", "event_type")))
    t("paths:windowlimit") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"), col("event_type"))
      events.na.drop(Seq("user_id", "ts", "event_type"))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 3)
    }
    t("paths:full")(
      graft.ops.Funnel.topPaths(events, "user_id", "ts", "event_type", "event_id", k = 3))

    spark.stop()
  }
}
