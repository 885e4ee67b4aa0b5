package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(fn: => DataFrame): Unit = {
      val t0 = System.nanoTime(); mat(fn)
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), lit("all").as("blk"))
    t("seg-docs-noblock")(graft.ops.Dedup.editDistancePairsSegmented(
      docs, "doc_id", "text", "blk", 2))
    t("bucket-docs-noblock")(graft.ops.Dedup.editDistancePairs(
      docs, "doc_id", "text", "blk", 2))
    spark.stop()
  }
}
