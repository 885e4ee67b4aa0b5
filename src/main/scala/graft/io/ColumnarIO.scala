package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Secondary columnar format surface (ORC) alongside [[ParquetIO]] —
  * interchange with Hive/Trino estates whose tables are ORC. Same
  * posture as parquet: columnar scan with predicate pushdown and
  * column pruning (Spark's OrcScan reports `PushedFilters` exactly
  * like parquet — `IoSpec` pins that the filters actually reach the
  * scan, not just that rows come back), partitioned layout support,
  * and snappy compression by default.
  *
  * The reference pipeline is parquet-only (`glue_scripts/etl/
  * music_streaming_etl.py` writes parquet exclusively); ORC is the
  * interchange widening a multi-engine deployment needs, not a port of
  * reference behavior.
  */
object ColumnarIO {

  def readOrc(spark: SparkSession, paths: String*): DataFrame =
    spark.read.orc(paths: _*)

  def writeOrcOverwrite(df: DataFrame, path: String,
                        partitionBy: Seq[String] = Nil): Unit =
    writeOrc(df, path, SaveMode.Overwrite, partitionBy)

  def writeOrcAppend(df: DataFrame, path: String,
                     partitionBy: Seq[String] = Nil): Unit =
    writeOrc(df, path, SaveMode.Append, partitionBy)

  private def writeOrc(df: DataFrame, path: String, mode: SaveMode,
                       partitionBy: Seq[String]): Unit = {
    val w = df.write.mode(mode).option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
