package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.kpi.KpiQueries

/** Adapter from the driver's TPC-H-ish corpus (`TESTDATA.md`) onto the
  * engine's music-streaming model, so the *library* KPI code paths run
  * under the driver's DuckDB correctness gate:
  *
  *   lineitem -> streams fact  (user=l_suppkey, track=l_partkey, t=l_shipdate)
  *   part     -> songs dim     (genre=p_brand, duration from p_retailprice)
  *   supplier -> users dim     (country=s_nationkey)
  *
  * Both dims are deliberately *filtered* (`% 7`, `% 10`) so the left joins
  * produce misses — the null-group / null-sum parity traps of SURVEY
  * §7.4.2 are exercised, not dodged.
  */
object TestTables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive read of the events table: the driver's testdata has
    * shipped `ts` both as parquet TIMESTAMP(NANOS) (arrives as `long` under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set by `GraftSession`) and
    * as TIMESTAMP(MICROS) without UTC adjustment (arrives as TIMESTAMP_NTZ).
    * Both normalize to a session-TZ TIMESTAMP with identical `unix_micros`
    * values: nanos floor-divide to micros (integer `div`, not `/`: ns epoch
    * values overflow a double's 53-bit mantissa — DuckDB's ns->us read
    * truncates the same way), and NTZ wall-clock casts 1:1 because the
    * session time zone is pinned to UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.parquet column `ts` has unsupported type $other; expected " +
            "long (TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP_NTZ " +
            "(unadjusted micros), or TIMESTAMP. The testdata schema has " +
            "drifted — update TestTables.events to normalize the new type.")
    }
  }

  def streams(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem").select(
      col("l_suppkey").cast("string").as("user_id"),
      col("l_partkey").cast("string").as("track_id"),
      col("l_shipdate").as("listen_time"))

  def songs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part")
      .filter(col("p_partkey") % 7 =!= 0)
      .select(
        col("p_partkey").cast("string").as("track_id"),
        col("p_name").as("track_name"),
        col("p_type").as("artists"),
        col("p_brand").as("track_genre"),
        round(col("p_retailprice") * 100).cast("long").as("duration_ms"))

  def users(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "supplier")
      .filter(col("s_suppkey") % 10 =!= 0)
      .select(
        col("s_suppkey").cast("string").as("user_id"),
        col("s_name").as("user_name"),
        col("s_nationkey").cast("string").as("user_country"))

  def enriched(spark: SparkSession, dir: String): DataFrame =
    KpiQueries.prepareStreamingData(
      streams(spark, dir), songs(spark, dir), users(spark, dir))

  /** Shared DuckDB CTE prefix mirroring the adapter + enrichment. */
  val oracleBase: String =
    """WITH streams AS (
      |  SELECT CAST(l_suppkey AS VARCHAR) AS user_id,
      |         CAST(l_partkey AS VARCHAR) AS track_id,
      |         l_shipdate AS listen_time
      |  FROM lineitem
      |), songs AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS track_id,
      |         p_name AS track_name, p_type AS artists, p_brand AS track_genre,
      |         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS duration_ms
      |  FROM part WHERE p_partkey % 7 <> 0
      |), users AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS user_id,
      |         s_name AS user_name, CAST(s_nationkey AS VARCHAR) AS user_country
      |  FROM supplier WHERE s_suppkey % 10 <> 0
      |), enriched AS (
      |  SELECT st.user_id, st.track_id, st.listen_time AS ts,
      |         so.track_genre, so.duration_ms,
      |         so.duration_ms / 60000.0 AS listening_time,
      |         u.user_name, u.user_country
      |  FROM streams st
      |  LEFT JOIN songs so ON st.track_id = so.track_id
      |  LEFT JOIN users u ON st.user_id = u.user_id
      |)""".stripMargin
}
