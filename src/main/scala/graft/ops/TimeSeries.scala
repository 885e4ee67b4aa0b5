package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-complete time-series primitives: daily resample, gap
  * filling, forward fill. Per-entity daily metrics are only trustworthy
  * once missing days are explicit — a windowed feature computed over a
  * series with silent holes reads "no data" as "no row", which skews
  * every downstream rolling aggregate.
  *
  * Reference behavior: the KPI pipeline's daily rollups
  * (`scripts/compute_genre_kpis.py`) group by event date and simply
  * omit silent days; gap filling is the resample step a consumer needs
  * before trend/retention math over those rollups is sound.
  */
object TimeSeries {

  /** Per-key daily activity series over each key's own
    * `[min_day, max_day]` span: one row per (key, day) with
    * `n_events` = events that day (0 on gap days) and
    * `last_active_day` = most recent day with activity at or before
    * this row (forward fill).
    *
    * Scale posture: the calendar explode emits span-length rows per
    * key — bounded by elapsed DAYS, not event volume, so it cannot
    * amplify a 100 TB fact table (31 rows/key/month regardless of how
    * hot the key is). The join back to daily counts is a (key, day)
    * equi-join — both sides shuffle on the same key, and the per-key
    * daily frame is already aggregated (small side; AQE broadcasts it
    * when a single month-partition is processed). The forward fill is
    * a per-key ordered window — partitions are span-bounded like the
    * calendar, never event-bounded.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .groupBy(keyCol, "day").agg(count(lit(1)).as("n"))
    val spans = daily.groupBy(keyCol).agg(min("day").as("_d0"), max("day").as("_d1"))
    val calendar = spans.select(col(keyCol),
      explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(when(col("n").isNotNull, col("day")), ignoreNulls = true).over(w)
          .as("last_active_day"))
  }

  /** Trailing `days`-day rolling aggregates over per-key DAILY rollups:
    * one row per (key, active day) with that day's count plus the
    * trailing-window event total and active-day count. The window key
    * is the integer epoch day, so the RANGE frame `[-(days-1), 0]` is
    * exact long arithmetic (no interval/timezone math in the frame).
    *
    * Scale posture: the window runs over the AGGREGATED daily frame —
    * one row per (key, day), span-bounded like [[gapFillDaily]]'s
    * calendar — never over raw events; the raw table is touched once,
    * by the daily hash-agg (map-side combined). Sums are exact longs.
    */
  def trailingDaily(df: DataFrame, keyCol: String, tsCol: String,
                    days: Int = 7): DataFrame = {
    require(days >= 1, "window must cover at least the current day")
    val daily = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .groupBy(keyCol, "day").agg(count(lit(1)).as("n_events"))
      .withColumn("_epoch_day", datediff(col("day"), to_date(lit("1970-01-01"))).cast("long"))
    val w = Window.partitionBy(keyCol).orderBy(col("_epoch_day"))
      .rangeBetween(-(days - 1).toLong, 0L)
    daily.select(col(keyCol), col("day"), col("n_events"),
      sum("n_events").over(w).as("n_trailing"),
      count(lit(1)).over(w).as("days_active_trailing"))
  }
}
