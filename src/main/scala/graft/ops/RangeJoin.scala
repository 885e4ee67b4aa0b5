package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: pair each point with every interval (of bounded
  * length) containing it, by equi-joining on coarse time buckets instead
  * of letting Spark plan the range predicate as a broadcast nested loop
  * (its default for non-equi conditions, O(n·m) and a scale-killer).
  *
  * Each interval `[s, s+len]` is exploded into the buckets it touches
  * (`len <= bucketSeconds` ⇒ at most 2); each point maps to exactly one
  * bucket; the equi-join on (keys, bucket) then a residual range filter
  * gives the exact answer with shuffle-hash-join economics. The same
  * trick as `trendingKpisBucketed` — turn an inequality into an
  * equality plus a bounded fan-out.
  */
object RangeJoin {

  /** Join `points` (with `ptsCol`) to `intervals` (with `startCol`,
    * inclusive, fixed `lengthSeconds`, inclusive end) on equal `keys` and
    * containment. Output: all point columns + all interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      ptsCol: String, startCol: String, lengthSeconds: Long,
                      bucketSeconds: Long = 0L): DataFrame = {
    val bucket = if (bucketSeconds > 0) bucketSeconds else lengthSeconds
    require(lengthSeconds <= bucket, "interval length must fit one bucket span")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(shared.isEmpty, s"rename non-key columns shared by both sides: $shared")

    val p = points
      .withColumn("_pu", unix_timestamp(col(ptsCol)))
      .withColumn("_bucket", floor(col("_pu") / bucket))
    val i = intervals
      .withColumn("_su", unix_timestamp(col(startCol)))
      .withColumn("_bucket",
        explode(sequence(floor(col("_su") / bucket),
          floor((col("_su") + lengthSeconds) / bucket))))

    p.join(i, keys :+ "_bucket")
      .filter(col("_pu") >= col("_su") && col("_pu") <= col("_su") + lengthSeconds)
      .drop("_pu", "_su", "_bucket")
  }
}
