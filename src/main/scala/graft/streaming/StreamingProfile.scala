package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.ops.Sketch

/** Streaming incremental column profiling — the stream twin of
  * `Profile.colStatsState`/`mergeColStats`: per-key running row/non-null
  * counts, min/max, and a KMV distinct sketch over a numeric column,
  * maintained across triggers in bounded state (4 scalars + ≤ k longs
  * per key FOREVER — no watermark needed, like
  * [[StreamingDistinct.runningDistinct]]).
  *
  * Every state component is an associative-commutative fold (adds,
  * min/max, KMV insertion), so the state after any batching equals the
  * batch profile over the union of all inputs — the spec asserts that
  * equality exactly, including the estimator path. The value hashes
  * through its Spark string rendering (`Double.toString`), bit-matching
  * the Column-side `Sketch.kmvHash(col.cast("string"))` the batch op
  * uses, so stream state and batch/DuckDB sketches stay mergeable.
  */
object StreamingProfile {

  private[streaming] final case class ColState(
      n: Long, nn: Long, mn: Double, mx: Double, buf: Array[Long])

  /** Update-mode stream: one row per touched key per trigger —
    * (key, n_rows, n_nonnull, est_distinct, min_value, max_value);
    * min/max/est null until the key sees a non-null value.
    */
  def runningColStats(events: DataFrame, keyCol: String, valueCol: String,
                      k: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new Sketch.KmvAgg(k) // state-fold kernel (insert + finish)
    events
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("double").as("value"))
      .filter(col("key").isNotNull)
      .as[(String, Option[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState[ColState,
        (String, Long, Long, Option[Long], Option[Double], Option[Double])](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Option[Double])],
         state: GroupState[ColState]) =>
          var st = state.getOption.getOrElse(
            ColState(0L, 0L, Double.NaN, Double.NaN, Array.emptyLongArray))
          rows.foreach { case (_, v) =>
            val n = st.n + 1
            st = v match {
              case Some(x) =>
                val mn = if (st.nn == 0 || x < st.mn) x else st.mn
                val mx = if (st.nn == 0 || x > st.mx) x else st.mx
                // JVM md5 of the value's string rendering — identical
                // bits to the batch op's Column-side hash
                ColState(n, st.nn + 1, mn, mx,
                  agg.reduce(st.buf, StreamingDistinct.hash52(x.toString)))
              case None => st.copy(n = n)
            }
          }
          state.update(st)
          if (st.nn == 0) (key, st.n, 0L, None, None, None)
          else (key, st.n, st.nn, Some(agg.finish(st.buf)),
            Some(st.mn), Some(st.mx))
      }
      .toDF("key", "n_rows", "n_nonnull", "est_distinct", "min_value", "max_value")
  }
}
