package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only scratch main for stage-by-stage perf dissection (not part of
  * the driver contract; deleted or repurposed freely between rounds). */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(fn: => DataFrame): Unit = {
      fn // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(fn); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s median=${runs.sorted.apply(1)}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    val enriched = kpi.KpiQueries.persistEnriched(TestTables.enriched(spark, sfDir))
    mat(enriched)
    val base = enriched.withColumn("unix_timestamp", unix_timestamp(col("timestamp")))
    val w = Window.partitionBy("track_id").orderBy(col("unix_timestamp").desc).rangeBetween(-86400L, 0L)
    t("enriched-cached")(base)
    t("window-only")(base.withColumn("p", count(col("track_id")).over(w)))
    t("window+groupBy")(base.withColumn("p", count(col("track_id")).over(w))
      .groupBy("track_id", "track_genre")
      .agg(max("p").as("m"), sum("duration_ms").as("d"), countDistinct("user_id").as("u")))
    t("window+groupBy+sort")(base.withColumn("p", count(col("track_id")).over(w))
      .groupBy("track_id", "track_genre")
      .agg(max("p").as("m"), sum("duration_ms").as("d"), countDistinct("user_id").as("u"))
      .orderBy(col("m").desc))
    t("groupBy-no-window")(base
      .groupBy("track_id", "track_genre")
      .agg(sum("duration_ms").as("d"), countDistinct("user_id").as("u")))
    spark.stop()
  }
}
