package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics via the sweep-line (+1/−1 boundary) pattern — the
  * standard way to answer "how many sessions/streams were active at
  * once?" without expanding intervals into per-tick rows or
  * self-joining the interval table against itself.
  *
  * Reference relevance: the reference's sessions are implicit in its
  * stream events; peak-concurrency ("how many listeners at once, per
  * country/genre") is the capacity-planning query its DynamoDB docs
  * sketch but its engine cannot express without a per-second explode.
  *
  * Scale posture: each interval contributes exactly TWO boundary rows
  * (start +1, end −1) — 2·|intervals|, never duration-proportional.
  * One shuffle by group, one ordered window per group (partition size
  * = 2× the group's interval count), one hash agg. No join, no
  * explode-by-time, no all-pairs overlap test.
  */
object Intervals {

  /** Boundary timeline: one row per interval endpoint with the running
    * concurrency AFTER processing that boundary. Half-open [start, end)
    * semantics: an interval ending at t does not overlap one starting
    * at t — ends (−1) order before starts (+1) at equal timestamps.
    *
    * The running sum uses the window's default RANGE frame, so rows
    * with identical (ts, delta) share one deterministic running value
    * (a ROWS frame would give tied rows an arbitrary intermediate sum).
    */
  def concurrencyTimeline(intervals: DataFrame, groupCol: String,
                          startCol: String, endCol: String): DataFrame = {
    val clean = intervals.filter(
      col(groupCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull)
    // start (+1) and end (−1) events via ONE explode — a starts/ends
    // self-unionAll scans the interval source twice (no upstream
    // exchange to reuse; the nearDupClusters lesson)
    val w = Window.partitionBy(groupCol).orderBy(col("ts"), col("delta"))
    clean
      .select(col(groupCol), explode(array(
        struct(col(startCol).as("ts"), lit(1L).as("delta")),
        struct(col(endCol).as("ts"), lit(-1L).as("delta")))).as("_ev"))
      .select(col(groupCol), col("_ev.ts").as("ts"), col("_ev.delta").as("delta"))
      .withColumn("concurrency", sum(col("delta")).over(w))
  }

  /** Total covered extent of the interval UNION per group — "how much
    * wall-clock was at least one session active?" — plus the merged
    * (island) count. The other classic interval aggregate next to
    * [[peakConcurrency]]: utilization, uptime, on-air time; summing raw
    * durations double-counts every overlap, so the intervals must be
    * merged first.
    *
    * Gaps-and-islands, half-open [start, end) semantics (an interval
    * starting exactly where another ends extends the SAME island):
    * per group in (start, end) order, a row opens a new island iff its
    * start exceeds the running max of all PRIOR ends; the cumulative
    * count of such openings is the island id; an island's extent is
    * max(end) − min(start). All arithmetic on the caller's integer
    * axis (epoch micros, seconds — any BIGINT), so results are exact
    * and engine-independent. Rows tied on (start, end) are
    * order-ambiguous in the window, but island membership and every
    * emitted aggregate are invariant under tie order.
    *
    * Scale posture: one shuffle by group, two ordered windows over the
    * group's own rows (running max, running sum — no self-join, no
    * per-tick explode), two hash aggs. Like the sweep line, cost is
    * O(|intervals|), never duration-proportional.
    * Output: (group, n_intervals, n_islands, covered).
    */
  def coveredExtent(intervals: DataFrame, groupCol: String,
                    startCol: String, endCol: String): DataFrame = {
    val g = col(groupCol); val s = col(startCol); val e = col(endCol)
    val clean = intervals
      .filter(g.isNotNull && s.isNotNull && e.isNotNull && e >= s)
      .select(g.as("grp"), s.cast("long").as("s"), e.cast("long").as("e"))
    val order = Seq(col("s"), col("e"))
    val wPrior = Window.partitionBy("grp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("grp").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = clean
      .withColumn("_pmax", max(col("e")).over(wPrior))
      .withColumn("_new",
        when(col("_pmax").isNull || col("s") > col("_pmax"), 1L).otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(wRun))
    flagged
      .groupBy(col("grp"), col("_island"))
      .agg(count(lit(1)).as("_n"), min("s").as("_is"), max("e").as("_ie"))
      .groupBy(col("grp"))
      .agg(sum("_n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("_ie") - col("_is")).as("covered"))
      .withColumnRenamed("grp", groupCol)
  }

  /** Per-group peak concurrency and the earliest instant it is reached.
    * Output: (group, peak_concurrency, first_peak_ts).
    */
  def peakConcurrency(intervals: DataFrame, groupCol: String,
                      startCol: String, endCol: String): DataFrame = {
    val tl = concurrencyTimeline(intervals, groupCol, startCol, endCol)
    val peaks = tl.groupBy(groupCol).agg(max("concurrency").as("peak_concurrency"))
    tl.join(broadcast(peaks), Seq(groupCol))
      .filter(col("concurrency") === col("peak_concurrency"))
      .groupBy(groupCol)
      .agg(max("concurrency").as("peak_concurrency"),
        min("ts").as("first_peak_ts"))
      .select(col(groupCol), col("peak_concurrency"), col("first_peak_ts"))
  }
}
