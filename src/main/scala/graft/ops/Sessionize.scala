package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the classic lag + cumulative-sum construction:
  * a new session starts where the gap to the previous event exceeds
  * `gapMinutes`; `session_id` is the running count of session starts per
  * user. Exact counterpart of `StreamingKpis.sessionize` for bounded
  * data, and the ground truth its streaming state must agree with.
  *
  * Scale: both windows partition by `user_id` — per-user history, not a
  * global sort; a user's event count bounds the partition (human-scale,
  * no viral-key skew like tracks).
  */
object Sessionize {

  /** Per-event session assignment: (user_id, ts, session_id). */
  def assignSessions(plays: DataFrame, userCol: String, tsCol: String,
                     gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val gapSec = gapMinutes * 60L
    plays
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull, 1L)
          .when(unix_timestamp(col(tsCol)) - unix_timestamp(col("_prev")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new_session")
  }

  /** Per-session rollup: bounds, play count, wall-clock duration. */
  def sessions(plays: DataFrame, userCol: String, tsCol: String,
               gapMinutes: Int = 30): DataFrame =
    assignSessions(plays, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("plays"))
      .withColumn("duration_min",
        (unix_timestamp(col("session_end")) - unix_timestamp(col("session_start"))) / 60.0)
}
