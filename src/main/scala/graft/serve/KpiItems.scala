package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Columnar KPI→item mapping for the serving store — the engine-side
  * replacement for the reference's driver-side row loops
  * (`scripts/load_dynamodb.py:229-343`, which `collect()`s every KPI
  * table and builds dicts in Python). Here each item table is a pure
  * projection: key synthesis by `concat`, null-defaulting by `coalesce`,
  * ISO timestamps by `date_format` — all codegen'd, all distributed,
  * nothing on the driver.
  *
  * Key-format parity notes (from the reference's f-strings):
  *   - embedded dates in ids render as Python `str(datetime)` =
  *     `yyyy-MM-dd HH:mm:ss`, while the `date` *attribute* uses
  *     `.isoformat()` = `yyyy-MM-dd'T'HH:mm:ss` — both reproduced;
  *   - a null genre renders as the string `"None"` in ids (f-string of
  *     Python None), reproduced with `coalesce(genre, 'None')`;
  *   - `timestamp` is one value per load run (`datetime.now()
  *     .isoformat()` at `:226`), passed in explicitly here so runs are
  *     reproducible and idempotent re-writes hit the same
  *     (id, timestamp) keys.
  */
object KpiItems {

  private def genreForId(c: String) = coalesce(col(c), lit("None"))
  private def idDate(c: String)     = date_format(col(c), "yyyy-MM-dd HH:mm:ss")
  private def isoDate(c: String)    = date_format(col(c), "yyyy-MM-dd'T'HH:mm:ss")

  /** `USER_{user_id}` items — `scripts/load_dynamodb.py:229-252`. */
  def userItems(userKpis: DataFrame, runTs: String): DataFrame =
    userKpis.select(
      concat(lit("USER_"), col("user_id")).as("id"),
      lit(runTs).as("timestamp"),
      lit("user").as("kpi_type"),
      col("user_id"),
      coalesce(col("total_songs_played"), lit(0L)).as("total_songs"),
      coalesce(col("total_listening_time_minutes"), lit(0.0)).as("total_time"),
      coalesce(col("avg_listening_time_minutes"), lit(0.0)).as("avg_time"))

  /** `GENRE_DAILY_{genre}_{date}` items — `scripts/load_dynamodb.py:254-276`. */
  def genreDailyItems(genreDaily: DataFrame, runTs: String): DataFrame =
    genreDaily.select(
      concat(lit("GENRE_DAILY_"), genreForId("track_genre"), lit("_"), idDate("date")).as("id"),
      lit(runTs).as("timestamp"),
      lit("genre_daily").as("kpi_type"),
      isoDate("date").as("date"),
      col("track_genre").as("genre"),
      coalesce(col("listen_count"), lit(0L)).as("listen_count"),
      coalesce(col("unique_listeners"), lit(0L)).as("unique_listeners"),
      coalesce(col("total_listening_time_minutes"), lit(0.0)).as("total_time"))

  /** `GENRE_TOP_SONGS_{genre}_{date}_{track}` items —
    * `scripts/load_dynamodb.py:278-299`.
    */
  def topSongsItems(topSongs: DataFrame, runTs: String): DataFrame =
    topSongs.select(
      concat(lit("GENRE_TOP_SONGS_"), genreForId("track_genre"), lit("_"),
        idDate("date"), lit("_"), col("track_id")).as("id"),
      lit(runTs).as("timestamp"),
      lit("genre_top_songs").as("kpi_type"),
      isoDate("date").as("date"),
      col("track_genre").as("genre"),
      col("track_id"),
      coalesce(col("play_count"), lit(0L)).as("play_count"),
      coalesce(col("rank"), lit(0)).cast("int").as("rank"))

  /** `GENRE_TOP_{genre}_{date}` items — `scripts/load_dynamodb.py:301-322`. */
  def topGenresItems(topGenres: DataFrame, runTs: String): DataFrame =
    topGenres.select(
      concat(lit("GENRE_TOP_"), genreForId("track_genre"), lit("_"), idDate("date")).as("id"),
      lit(runTs).as("timestamp"),
      lit("genre_top").as("kpi_type"),
      isoDate("date").as("date"),
      col("track_genre").as("genre"),
      coalesce(col("listen_count"), lit(0L)).as("listen_count"),
      coalesce(col("unique_listeners"), lit(0L)).as("unique_listeners"),
      coalesce(col("total_listening_time_minutes"), lit(0.0)).as("total_time"),
      coalesce(col("rank"), lit(0)).cast("int").as("rank"))

  /** `TRENDING_{track_id}` items — `scripts/load_dynamodb.py:324-343`. */
  def trendingItems(trending: DataFrame, runTs: String): DataFrame =
    trending.select(
      concat(lit("TRENDING_"), col("track_id")).as("id"),
      lit(runTs).as("timestamp"),
      lit("trending").as("kpi_type"),
      col("track_id"),
      col("track_genre"),
      coalesce(col("plays_last_24h"), lit(0L)).as("plays_last_24h"),
      coalesce(col("total_listening_time_minutes"), lit(0.0)).as("total_time"),
      coalesce(col("unique_listeners"), lit(0L)).as("unique_listeners"))
}
