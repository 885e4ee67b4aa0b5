package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (rank-based) outlier detection — the anomaly gate a metrics
  * pipeline runs on each batch before KPIs are trusted. Mean/stddev
  * fences are both outlier-sensitive and floating-summation-order
  * dependent; IQR fences from DISCRETE quantiles are neither.
  *
  * Quantile choice is deliberate: type-1 discrete quantiles — the
  * value at row `ceil(p·n)` of the group's sort order — select an
  * ACTUAL data value by integer arithmetic that is identical on any
  * engine (`0.25·n` and `0.75·n` are exact in binary floating point
  * for any realistic n). Interpolated quantiles would make the fence a
  * derived float whose formula is implementation-defined. The fence
  * arithmetic `p75 ± k·(p75−p25)` then composes IEEE-exact ops on
  * identical inputs, so the outlier SET is engine-independent — the
  * property the DuckDB oracle verifies.
  */
object Outliers {

  /** Rows of `df` whose `valueCol` lies outside
    * `[p25 − k·iqr, p75 + k·iqr]` within their `groupCol` group.
    * Output: (group, id, value, lo, hi).
    *
    * Scale posture: one ranked window per group (shuffle by group; a
    * skewed group sorts within its partitions — for a single monster
    * group pre-aggregate or sample upstream), one tiny per-group fence
    * frame (|groups| rows → broadcast join back), one filter pass.
    * Never an all-pairs or per-row subquery.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Double = 1.5): DataFrame = {
    val g = col(groupCol); val v = col(valueCol)
    val ranked = df
      .filter(g.isNotNull && v.isNotNull)
      .select(g, col(idCol), v)
      .withColumn("_rn", row_number().over(Window.partitionBy(g).orderBy(v)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(g)))
    val fences = ranked.groupBy(g).agg(
      min(when(col("_rn") === ceil(col("_n") * lit(0.25)), v)).as("_p25"),
      min(when(col("_rn") === ceil(col("_n") * lit(0.75)), v)).as("_p75"))
    ranked.join(broadcast(fences), Seq(groupCol))
      .withColumn("lo", col("_p25") - lit(k) * (col("_p75") - col("_p25")))
      .withColumn("hi", col("_p75") + lit(k) * (col("_p75") - col("_p25")))
      .filter(v < col("lo") || v > col("hi"))
      .select(g, col(idCol), v, col("lo"), col("hi"))
  }

  /** Robust (median/MAD) outlier detection: rows where
    * `|x − median| > k · MAD`, both statistics the DISCRETE (type-1)
    * medians of their group — the same engine-independent selection
    * discipline as [[iqrOutliers]], but with a breakdown point of 50%
    * (IQR fences move once a quarter of the data is bad; MAD holds to
    * half). `k = 3.5` is the conventional consistency-scaled cutoff.
    * Groups whose MAD is 0 (over half the values identical) flag every
    * row not exactly at the median — deterministic, if blunt; prefer
    * IQR for heavily discrete data.
    * Output: (group, id, value, med, mad).
    *
    * Scale posture: two ranked windows (values, then absolute
    * deviations) + two |groups|-row broadcast joins — same shape as
    * the quantile family, never a per-row subquery. Positional
    * selection under ties is stable: equal values at the selection
    * rank yield the same selected VALUE regardless of tie order.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Double = 3.5): DataFrame = {
    val g = col(groupCol); val v = col(valueCol)
    val ranked = df
      .filter(g.isNotNull && v.isNotNull)
      .select(g, col(idCol), v)
      .withColumn("_rn", row_number().over(Window.partitionBy(g).orderBy(v)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(g)))
    val med = ranked.groupBy(g).agg(
      min(when(col("_rn") === ceil(col("_n") * lit(0.5)), v)).as("med"))
    val dev = ranked.join(broadcast(med), Seq(groupCol))
      .withColumn("_adev", abs(v - col("med")))
      .withColumn("_rn2", row_number().over(Window.partitionBy(g).orderBy(col("_adev"))))
      .withColumn("_n2", count(lit(1)).over(Window.partitionBy(g)))
    val mad = dev.groupBy(g).agg(
      min(when(col("_rn2") === ceil(col("_n2") * lit(0.5)), col("_adev"))).as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .filter(abs(v - col("med")) > lit(k) * col("mad"))
      .select(g, col(idCol), v, col("med"), col("mad"))
  }

  /** Null-repair by group median: null `valueCol` rows take their
    * group's discrete median of the NON-NULL values; everything else
    * passes through — including rows whose GROUP key is null (they
    * have no median frame to match, so `imputed` = `value` unchanged;
    * a repair op must never silently drop rows). The imputation step
    * of an ML feature pipeline, with the engine-independent median
    * selection of this file.
    * Output: (group, id, value, imputed).
    */
  def imputeMedian(df: DataFrame, groupCol: String, idCol: String,
                   valueCol: String): DataFrame = {
    val g = col(groupCol); val v = col(valueCol)
    val ranked = df
      .filter(g.isNotNull && v.isNotNull)
      .select(g, v)
      .withColumn("_rn", row_number().over(Window.partitionBy(g).orderBy(v)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(g)))
    val med = ranked.groupBy(g).agg(
      min(when(col("_rn") === ceil(col("_n") * lit(0.5)), v)).as("_med"))
    // LEFT join: a group whose values are ALL null has no median row,
    // and a NULL group key matches nothing — both kinds of rows must
    // still pass through (imputed stays value/null); an inner join or a
    // group-key filter would silently drop them, losing rows from a
    // repair op
    df.select(g, col(idCol), v)
      .join(broadcast(med), Seq(groupCol), "left")
      .withColumn("imputed", coalesce(v, col("_med")))
      .drop("_med")
  }

  /** Winsorize `valueCol` within each group: values below the `pLo`
    * discrete quantile clamp up to it, above `pHi` clamp down. Same
    * type-1 quantile discipline as [[iqrOutliers]] — the clamp bounds
    * are ACTUAL data values selected by integer rank arithmetic, so the
    * clipped column is engine-independent (no interpolation floats).
    * Output: every input row as (group, id, value, clipped).
    *
    * Scale posture: identical to [[iqrOutliers]] — one ranked window
    * per group, a |groups|-row fence frame broadcast back, one
    * map-side clamp pass. The common alternative (a per-row correlated
    * quantile subquery) is a join-per-row; this is two passes total.
    */
  def winsorize(df: DataFrame, groupCol: String, idCol: String,
                valueCol: String, pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "0 < pLo < pHi < 1")
    val g = col(groupCol); val v = col(valueCol)
    val ranked = df
      .filter(g.isNotNull && v.isNotNull)
      .select(g, col(idCol), v)
      .withColumn("_rn", row_number().over(Window.partitionBy(g).orderBy(v)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(g)))
    val fences = ranked.groupBy(g).agg(
      min(when(col("_rn") === ceil(col("_n") * lit(pLo)), v)).as("_lo"),
      min(when(col("_rn") === ceil(col("_n") * lit(pHi)), v)).as("_hi"))
    ranked.join(broadcast(fences), Seq(groupCol))
      .select(g, col(idCol), v,
        least(greatest(v, col("_lo")), col("_hi")).as("clipped"))
  }

  /** Exact trimmed mean per group — the robust location estimate that
    * DROPS the tails instead of clamping them ([[winsorize]]'s
    * complement; the metric of record when a mean must survive fat
    * tails but a median wastes too much data). `k = (n·trimPpm) div
    * 10⁶` rows leave each end; the kept mass is computed on the
    * group's DISTINCT-VALUE cum frame with per-value clipping
    *
    *   take_v = max(0, min(below+t, n−k) − max(below, k))
    *
    * so boundary TIES split exactly (a row-sort would pick arbitrary
    * tied rows; this is order-free). All sums are exact integers; the
    * single division is the output. Trimming past the middle
    * (n − 2k ≤ 0) masks to NULL. Output: ONE row per group
    * (group, n, n_trimmed, trimmed_mean).
    */
  def trimmedMean(df: DataFrame, groupCol: String, metric: Column,
                  trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0L && trimPpm < 500000L, "0 <= trimPpm < 500000")
    val base = df.filter(col(groupCol).isNotNull && metric.isNotNull)
      .select(col(groupCol).as("_g"), metric.cast("long").as("_x"))
    val vals = base.groupBy("_g", "_x").agg(count(lit(1)).as("_t"))
    val below = Window.partitionBy("_g").orderBy("_x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy("_g")
    val staged = vals
      .withColumn("_below", coalesce(sum(col("_t")).over(below), lit(0L)))
      .withColumn("_n", sum(col("_t")).over(whole))
      .withColumn("_k", expr(s"(_n * ${trimPpm}L) div 1000000L"))
      .withColumn("_take", greatest(lit(0L),
        least(col("_below") + col("_t"), col("_n") - col("_k")) -
          greatest(col("_below"), col("_k"))))
    staged.groupBy("_g")
      .agg(first(col("_n")).as("n"),
        first(col("_n") - lit(2) * col("_k")).as("n_trimmed"),
        sum((col("_take") * col("_x")).cast("decimal(38,0)")).as("_s"))
      .select(col("_g").as(groupCol), col("n"), col("n_trimmed"),
        when(col("n_trimmed") <= 0, lit(null).cast("double"))
          .otherwise(round(col("_s").cast("double") /
            col("n_trimmed").cast("double"), 6)).as("trimmed_mean"))
  }
}
