package graft.kpi

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The five declared KPI queries of the reference (SURVEY §2.11), as pure
  * `DataFrame => DataFrame` transforms over the enriched play table.
  *
  * Semantics replicated exactly (SURVEY §7.4 parity traps):
  *   - left joins propagate nulls into group keys (`user_name`,
  *     `track_genre` may be null groups) — reference
  *     `scripts/compute_kpis.py:285-287`;
  *   - `listening_time` is song duration (`duration_ms/60000`), null on a
  *     songs-join miss, so `sum`/`avg` skip unmatched plays while `count`
  *     includes them — `scripts/compute_kpis.py:300,167-175`;
  *   - `dense_rank` keeps ties (rank<=k may exceed k rows) —
  *     `scripts/compute_kpis.py:203-210`;
  *   - the trending frame is `orderBy(unix_ts.desc).rangeBetween(-86400,0)`
  *     which (with DESC ordering) counts events in `[t, t+24h]` —
  *     `scripts/compute_kpis.py:229-239`.
  *
  * Scale notes (100 TB): the dims are broadcast (song/user dims are MBs
  * even at full scale vs the TB fact table); every aggregate is a partial+
  * final `HashAggregate` (map-side combine); the enriched frame is persisted
  * once and feeds all five queries instead of being recomputed per sink
  * (reference anti-pattern, SURVEY §4.3); `countDistinct` has an
  * `approxDistinct` switch (HLL) for the 100 TB path.
  */
object KpiQueries {

  val TopSongsPerGenre = 3 // reference scripts/compute_kpis.py:37
  val TopGenresPerDay  = 5 // reference scripts/compute_kpis.py:38

  /** Exact by default (parity); HLL at scale. */
  def uniqueCount(c: Column, approx: Boolean): Column =
    if (approx) approx_count_distinct(c) else countDistinct(c)

  /** Join enrichment — reference `prepare_streaming_data`
    * (`scripts/compute_kpis.py:252-303`): alias-projection, timestamp
    * derivation, left joins onto songs and users, final projection.
    *
    * Both dims are explicitly `broadcast()`: the fact table is the only
    * TB-scale input, so this keeps the whole enrichment shuffle-free.
    */
  def prepareStreamingData(streams: DataFrame, songs: DataFrame, users: DataFrame): DataFrame = {
    val st = streams.select(
      col("user_id").cast("string").as("user_id"),
      col("track_id").cast("string").as("track_id"),
      to_timestamp(col("listen_time")).as("timestamp"))
    val so = songs.select(
      col("track_id").cast("string").as("song_track_id"),
      col("track_name"), col("artists"), col("track_genre"),
      col("duration_ms").cast("long").as("duration_ms"))
    val us = users.select(
      col("user_id").cast("string").as("user_user_id"),
      col("user_name"), col("user_country"))
    st.join(broadcast(so), st("track_id") === so("song_track_id"), "left")
      .join(broadcast(us), st("user_id") === us("user_user_id"), "left")
      .select(
        col("user_id"), col("track_id"), col("timestamp"),
        col("track_name"), col("artists"), col("track_genre"),
        col("duration_ms"),
        (col("duration_ms") / 60000.0).as("listening_time"),
        col("user_name"), col("user_country"))
  }

  /** Persist the enriched frame once for the 5-query fan-out (SURVEY §4.3). */
  def persistEnriched(enriched: DataFrame): DataFrame =
    enriched.persist(StorageLevel.MEMORY_AND_DISK)

  /** Listening-time aggregates are computed from the *exact integer*
    * `sum(duration_ms)` and divided once, instead of summing per-row
    * `duration_ms/60000.0` doubles. Mathematically identical (nulls from
    * join misses are skipped by both `sum` and `count`), but the integer
    * sum is exact and order-independent — at 1000 executors a floating
    * sum's result depends on partition reduce order; this doesn't.
    */
  private def minutesFromDurationSum(durSum: Column): Column = durSum / 60000.0

  /** Q1 user_kpis — reference `scripts/compute_kpis.py:157-175`. */
  def userKpis(enriched: DataFrame): DataFrame =
    enriched
      .groupBy("user_id", "user_name", "user_country")
      .agg(
        count(col("track_id")).as("total_songs_played"),
        sum(col("duration_ms")).as("_dur_sum"),
        count(col("duration_ms")).as("_dur_n"))
      .select(
        col("user_id"), col("user_name"), col("user_country"),
        col("total_songs_played"),
        minutesFromDurationSum(col("_dur_sum")).as("total_listening_time_minutes"),
        (minutesFromDurationSum(col("_dur_sum")) / col("_dur_n"))
          .as("avg_listening_time_minutes"))
      .withColumn("kpi_type", lit("user"))

  private def withDate(enriched: DataFrame): DataFrame =
    enriched.withColumn("date", date_trunc("day", col("timestamp")))

  /** Q2 genre_daily_metrics — reference `scripts/compute_kpis.py:189-195`. */
  def genreDailyMetrics(enriched: DataFrame, approxDistinct: Boolean = false): DataFrame =
    withDate(enriched)
      .groupBy("date", "track_genre")
      .agg(
        count(col("track_id")).as("listen_count"),
        uniqueCount(col("user_id"), approxDistinct).as("unique_listeners"),
        sum(col("duration_ms")).as("_dur_sum"))
      .select(
        col("date"), col("track_genre"), col("listen_count"), col("unique_listeners"),
        minutesFromDurationSum(col("_dur_sum")).as("total_listening_time_minutes"))

  /** Q3 genre_top_songs — top-k tracks per (date, genre), dense-ranked —
    * reference `scripts/compute_kpis.py:197-205`.
    *
    * Scale note: the rank-filter pattern is planned by Spark as a
    * two-phase `WindowGroupLimit` (partial bounded top-k per input
    * partition BEFORE the exchange, final after) — verified via
    * `graft.Explain` — so only ≤k rows per (group, input-partition)
    * ever shuffle. The SURVEY §7.3 "bounded per-partition heap" rewrite
    * is built into Catalyst since 3.5; no custom rule needed.
    */
  def genreTopSongs(enriched: DataFrame, k: Int = TopSongsPerGenre): DataFrame = {
    val plays = withDate(enriched)
      .groupBy("date", "track_genre", "track_id")
      .agg(count(lit(1)).as("play_count"))
    val w = Window.partitionBy("date", "track_genre").orderBy(col("play_count").desc)
    plays.withColumn("rank", dense_rank().over(w)).filter(col("rank") <= k)
  }

  /** Q4 genre_top_genres — top-k genres per day, dense-ranked —
    * reference `scripts/compute_kpis.py:207-210`.
    */
  def genreTopGenres(
      enriched: DataFrame,
      k: Int = TopGenresPerDay,
      approxDistinct: Boolean = false): DataFrame = {
    val daily = genreDailyMetrics(enriched, approxDistinct)
    val w = Window.partitionBy("date").orderBy(col("listen_count").desc)
    daily.withColumn("rank", dense_rank().over(w)).filter(col("rank") <= k)
  }

  /** Q5 trending_kpis — reference `scripts/compute_kpis.py:219-249`.
    *
    * The range frame is replicated verbatim: DESC ordering with
    * `rangeBetween(-86400, 0)` counts plays with timestamps in
    * `[t, t+24h]` of each play (SURVEY §7.4.1).
    */
  def trendingKpis(enriched: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val w = Window
      .partitionBy("track_id")
      .orderBy(col("unix_timestamp").desc)
      .rangeBetween(-86400L, 0L)
    enriched
      .withColumn("unix_timestamp", unix_timestamp(col("timestamp")))
      .withColumn("plays_in_window", count(col("track_id")).over(w))
      .groupBy("track_id", "track_genre")
      .agg(
        max(col("plays_in_window")).as("plays_last_24h"),
        sum(col("duration_ms")).as("_dur_sum"),
        uniqueCount(col("user_id"), approxDistinct).as("unique_listeners"))
      .select(
        col("track_id"), col("track_genre"), col("plays_last_24h"),
        minutesFromDurationSum(col("_dur_sum")).as("total_listening_time_minutes"),
        col("unique_listeners"))
      .withColumn("kpi_type", lit("trending"))
      .orderBy(col("plays_last_24h").desc)
  }

  /** Scale-safe variant of [[trendingKpis]] — identical output, de-skewed
    * window partitioning.
    *
    * The original partitions the window by `track_id` alone: a viral
    * track's entire history lands on ONE core (AQE cannot split window
    * partitions), which is the round-1 verdict's scale-killer. Here every
    * event is assigned to a day bucket `b = floor(unix/86400)` and the
    * window runs inside `(track_id, b)`; since the frame `[t, t+24h]`
    * can only reach into bucket `b+1`, each event is also copied into
    * partition `b-1` as frame *context* (counted by neighbors, never
    * emitting its own count there). Per-event counts are therefore exact
    * — hash-equal to the single-partition plan (same oracle entry) —
    * while the worst partition shrinks from a track's all-time history
    * to two days of it. Cost: the fact stream is duplicated (2×) into
    * one shuffle; at 1000 executors that trade is strictly right.
    * Measured premium vs the exact plan is flat ~2× at BOTH sf0.1
    * (2.3 s vs 1.2 s) and 10× (9.8 s vs 5.1 s warm) — the insurance
    * price does not widen with volume (PERF.md, round-6 scale table).
    */
  def trendingKpisBucketed(enriched: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val e = enriched
      .withColumn("unix_timestamp", unix_timestamp(col("timestamp")))
      .withColumn("bucket", floor(col("unix_timestamp") / 86400L))
    // owner + context copies via ONE explode — an owners/context
    // self-unionAll plans (and, when `enriched` is not persisted, fully
    // re-runs) the 3-table enrichment twice (the nearDupClusters lesson)
    val w = Window
      .partitionBy("track_id", "part_bucket")
      .orderBy(col("unix_timestamp").desc)
      .rangeBetween(-86400L, 0L)
    e.withColumn("_oc", explode(array(
        struct(col("bucket").as("part_bucket"), lit(true).as("is_owner")),
        struct((col("bucket") - 1).as("part_bucket"), lit(false).as("is_owner")))))
      .withColumn("part_bucket", col("_oc.part_bucket"))
      .withColumn("is_owner", col("_oc.is_owner"))
      .drop("_oc")
      .withColumn("plays_in_window", count(col("track_id")).over(w))
      .filter(col("is_owner"))
      .groupBy("track_id", "track_genre")
      .agg(
        max(col("plays_in_window")).as("plays_last_24h"),
        sum(col("duration_ms")).as("_dur_sum"),
        uniqueCount(col("user_id"), approxDistinct).as("unique_listeners"))
      .select(
        col("track_id"), col("track_genre"), col("plays_last_24h"),
        minutesFromDurationSum(col("_dur_sum")).as("total_listening_time_minutes"),
        col("unique_listeners"))
      .withColumn("kpi_type", lit("trending"))
      .orderBy(col("plays_last_24h").desc)
  }

  /** All five KPI tables from one persisted enrichment pass, keyed by the
    * output-directory names the reference's loader depends on
    * (`scripts/compute_kpis.py:351-361`).
    *
    * `deskewTrending` defaults TRUE: the bucketed window is the production
    * plan (a viral track's history would serialize one core under the
    * single-partition window, and AQE cannot split window partitions).
    * The exact-plan variant remains available for small/unskewed inputs
    * where the 2× context-copy shuffle is not worth buying insurance.
    */
  def all(enriched: DataFrame, approxDistinct: Boolean = false,
          deskewTrending: Boolean = true): Map[String, DataFrame] = Map(
    "user_kpis"               -> userKpis(enriched),
    "genre_daily_metrics_kpi" -> genreDailyMetrics(enriched, approxDistinct),
    "genre_top_songs_kpi"     -> genreTopSongs(enriched),
    "genre_top_genres_kpi"    -> genreTopGenres(enriched, approxDistinct = approxDistinct),
    "trending_kpis"           -> (if (deskewTrending) trendingKpisBucketed(enriched, approxDistinct)
                                  else trendingKpis(enriched, approxDistinct)))
}
