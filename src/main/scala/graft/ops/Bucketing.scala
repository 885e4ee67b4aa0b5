package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-level half of the repo's
  * shuffle-minimization story. A join between two tables bucketed by
  * the SAME key into the SAME bucket count needs NO exchange on either
  * side: each task reads matching bucket files, and with `sortBy` the
  * sort-merge join skips its sorts too. At 100 TB this converts the
  * nightly fact-to-fact join from a full-cluster shuffle (the dominant
  * cost) into an embarrassingly-parallel per-bucket merge; the price is
  * paid ONCE at write time, amortized over every downstream join,
  * which is the right trade for tables joined repeatedly on a stable
  * key (events by user, lineitem by order).
  *
  * Spark-specific discipline encoded here:
  *   - bucket count is the join-time parallelism floor AND the file
  *     count per write task — pick powers of two near the cluster's
  *     target partition count, never "one bucket per key";
  *   - bucketed layout only round-trips through the catalog
  *     (`saveAsTable`): a plain parquet path write silently DROPS the
  *     bucket metadata and every downstream join re-shuffles;
  *   - both sides must agree on bucket count (a 512-bucket read joins
  *     a 1024-bucket read with a shuffle on one side).
  */
object Bucketing {

  /** Write `df` as a catalog-managed parquet table bucketed (and
    * sorted) by `keyCol` — the layout that makes every later
    * equi-join / aggregation on `keyCol` exchange-free.
    */
  def writeBucketed(df: DataFrame, tableName: String, keyCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numBuckets >= 1, "numBuckets must be positive")
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(tableName)
  }

  /** Join two same-key same-count bucketed tables exchange-free.
    * Callers can verify the plan with [[shuffleCount]].
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, keyCol: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(keyCol), joinType)

  /** Number of shuffle exchanges in `df`'s executed plan — 0 proves a
    * co-located join; exposed so tests and plan audits assert layout
    * claims instead of trusting them.
    */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan
    val root = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.collectWithSubqueries { case e: ShuffleExchangeLike => e }.size
  }
}
