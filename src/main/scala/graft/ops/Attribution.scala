package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event log — "which
  * channel gets credit for this purchase" — with linear (equal-split)
  * credit over the touches in a lookback window before each
  * conversion. The join is [[RangeJoin.pointInInterval]]'s bucketed
  * equi-join (never a nested-loop range plan), and credit is EXACT
  * integer ppm: each conversion distributes 1,000,000 ppm across its
  * n touches as `1000000 div n` each, remainder to the LAST touch
  * (the deterministic tie-break a float split lacks), so per-channel
  * totals are BIGINT sums that gate exactly and conservation
  * (Σ credit = 1e6 × attributed conversions) is a provable invariant,
  * not a rounding hope.
  *
  * Window semantics mirror the range-join contract: containment is
  * floor-second (`unix_timestamp` granularity, ≡ DuckDB
  * `FLOOR(epoch(…))`), plus a strict µs-exact `touch_ts < conv_ts`
  * gate so a same-second touch still never credits a conversion it
  * followed.
  *
  * Scale posture: one bounded-fan-out equi-join (≤2 buckets per
  * conversion window) + one per-conversion window rank (bounded by
  * touches-per-user-week) + one ≤|channels|-row agg. Conversion-heavy
  * users salt like any hot equi-key; nothing is all-pairs.
  *
  * Output: (touch_type, credit_ppm, n_touches, n_conversions) — one
  * row per touching channel.
  */
object Attribution {

  def linearTouch(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String, convType: String,
                  windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    val lenSec = windowDays * 86400L
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
      col(typeCol).isNotNull && col(idCol).isNotNull)
    val conv = base.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("_conv_id"), col(tsCol).as("_cts"),
        (col(tsCol) - expr(s"INTERVAL $windowDays DAYS")).as("_wstart"))
    val touches = base.filter(col(typeCol) =!= convType)
      .select(col(userCol), col(idCol).as("_tid"), col(tsCol).as("_tts"),
        col(typeCol).as("_ttype"))
    val pairs = RangeJoin.pointInInterval(touches, conv, Seq(userCol),
        "_tts", "_wstart", lengthSeconds = lenSec)
      .filter(col("_tts") < col("_cts"))
    val perConv = Window.partitionBy("_conv_id")
    val ranked = pairs
      .withColumn("_rn", row_number().over(
        perConv.orderBy(col("_tts"), col("_tid"))))
      .withColumn("_n", count(lit(1)).over(perConv))
      .withColumn("_credit",
        expr("CAST(1000000 AS BIGINT) div _n") +
          when(col("_rn") === col("_n"),
            expr("CAST(1000000 AS BIGINT) % _n")).otherwise(lit(0L)))
    ranked.groupBy(col("_ttype").as("touch_type"))
      .agg(sum(col("_credit")).cast("long").as("credit_ppm"),
        count(lit(1)).as("n_touches"),
        countDistinct(col("_conv_id")).as("n_conversions"))
  }
}
