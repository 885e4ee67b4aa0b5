package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.ops.Sketch

/** Streaming running distinct-count per key — "how many distinct users
  * has each event type EVER seen?" — with KMV sketch state instead of a
  * distinct-values set.
  *
  * Why this exists: Structured Streaming's own
  * `dropDuplicates`/`approx_count_distinct` either keep one state row
  * per distinct value (unbounded over an infinite stream) or cannot
  * maintain a running per-key estimate across triggers at all. The KMV
  * buffer is ≤ k longs per key FOREVER — state is bounded by
  * construction, so this needs NO watermark to stay finite, and the
  * answer is a running total over the whole stream lifetime, not a
  * window.
  *
  * Determinism: KMV insertion is a semilattice (the k smallest distinct
  * hashes of the values seen) — the state after any sequence of
  * triggers equals the batch [[graft.ops.Sketch.kmvDistinct]] over the
  * union of all inputs, regardless of arrival order or batching. The
  * spec asserts that equality exactly.
  */
object StreamingDistinct {

  /** The same 52-bit md5 point as [[Sketch.kmvHash]], computed JVM-side
    * for the typed state function (UTF-8 md5 of the value's string
    * rendering, top 13 hex chars — identical bits to the Column form).
    */
  private[streaming] def hash52(v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // top 13 hex chars = top 52 bits: 6 full bytes + high nibble of the 7th
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h << 4) | ((d(6) & 0xF0L) >> 4)
  }

  /** Update-mode stream: one (key, est_distinct) row per key per
    * trigger that touched it. Null keys/values are dropped
    * (`countDistinct` semantics, matching the batch op).
    */
  def runningDistinct(events: DataFrame, keyCol: String, valueCol: String,
                      k: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._ // includes the Array[Long] state encoder
    val agg = new Sketch.KmvAgg(k) // reused as the state-fold kernel
    events
      .select(col(keyCol).cast("string").as("key"),
        col(valueCol).cast("string").as("value"))
      .filter(col("key").isNotNull && col("value").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[Array[Long]]) =>
          var buf = state.getOption.getOrElse(Array.emptyLongArray)
          rows.foreach { case (_, v) => buf = agg.reduce(buf, hash52(v)) }
          state.update(buf)
          (key, agg.finish(buf))
      }
      .toDF("key", "est_distinct")
  }
}
