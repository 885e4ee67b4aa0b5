package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) segmentation — the classic
  * customer-value rollup the reference's per-user KPI family feeds
  * (`scripts/compute_kpis.py`'s user listening rollup is the F/M half;
  * RFM adds the recency axis and the quintile scoring that makes the
  * rollup actionable for retention/win-back slicing).
  *
  * Scoring discipline: quintiles are NOT `ntile` (row-order-dependent
  * under ties — the q_window_ntile caveat) but the exact cumulative
  * rule `score = 1 + (5 · cum_below) div n_users` computed on each
  * dimension's DISTINCT-VALUE cum frame — ties share a score by
  * construction, every boundary is an integer division, and the
  * |V|-row frames never sort the user table. Recency scores DESCENDING
  * (most recent = 5) via integer negation of the day distance.
  */
object Rfm {

  /** Per-unit RFM scores. Output: (unit, recency_days, frequency,
    * monetary_cents, r_score, f_score, m_score, rfm) with
    * rfm = 100·r + 10·f + m.
    */
  def rfm(df: DataFrame, unitCol: String, tsCol: String,
          value: Column): DataFrame = {
    val base = df.filter(col(unitCol).isNotNull && col(tsCol).isNotNull)
      .select(col(unitCol).as("_u"), col(tsCol).as("_ts"),
        coalesce(value, lit(0L)).cast("long").as("_v"))
    val per = base.groupBy("_u").agg(
      max(date_trunc("day", col("_ts"))).as("_last"),
      count(lit(1)).as("frequency"),
      sum(col("_v")).cast("long").as("monetary_cents"))
    val anchor = per.agg(max(col("_last")).as("_anchor"))
    // one |units|-row frame feeds three score dimensions plus the final
    // join — cache it or every branch re-aggregates the event log
    // (the q_triangles single-lineage discipline)
    val withR = per.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("_anchor"), col("_last")).cast("long"))
      .cache()
    // exact quintile scores from each dimension's distinct-value frame
    def score(dim: Column, name: String, src: DataFrame): DataFrame = {
      val vals = src.groupBy(dim.as("_x")).agg(count(lit(1)).as("_t"))
      val below = Window.orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = Window.orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      vals
        .withColumn("_below", coalesce(sum(col("_t")).over(below), lit(0L)))
        .withColumn("_n", sum(col("_t")).over(tot))
        .select(col("_x"),
          (lit(1) + expr("(5 * _below) div _n")).cast("long").as(name))
    }
    val rS = score(-col("recency_days"), "r_score", withR)
    val fS = score(col("frequency"), "f_score", withR)
    val mS = score(col("monetary_cents"), "m_score", withR)
    withR
      .join(broadcast(rS), -col("recency_days") === rS("_x"))
      .drop("_x")
      .join(broadcast(fS), col("frequency") === fS("_x")).drop("_x")
      .join(broadcast(mS), col("monetary_cents") === mS("_x")).drop("_x")
      .select(col("_u").as(unitCol), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"),
        col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .cast("long").as("rfm"))
  }
}
