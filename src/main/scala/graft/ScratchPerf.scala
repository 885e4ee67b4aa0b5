package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only scratch main for stage-by-stage perf dissection (not part of
  * the driver contract; deleted or repurposed freely between rounds). */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(fn: => DataFrame): Unit = {
      mat(fn) // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(fn); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s median=${runs.sorted.apply(1)}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    val raw = TestTables.enriched(spark, sfDir)
    val enriched = kpi.KpiQueries.persistEnriched(raw)
    mat(enriched)
    println("[scratch] enriched partitions = " + enriched.rdd.getNumPartitions)
    t("trending-over-cached")(kpi.KpiQueries.trendingKpis(enriched))
    t("trending-over-uncached")(kpi.KpiQueries.trendingKpis(TestTables.enriched(spark, sfDir)))
    t("bucketed-over-cached")(kpi.KpiQueries.trendingKpisBucketed(enriched))
    t("bucketed-over-uncached")(kpi.KpiQueries.trendingKpisBucketed(TestTables.enriched(spark, sfDir)))
    spark.stop()
  }
}
