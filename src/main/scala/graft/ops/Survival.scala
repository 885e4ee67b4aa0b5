package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over an event log — the standard
  * retention/churn curve (Kaplan & Meier 1958) with right-censoring,
  * which the naive "fraction still active after t days" gets wrong:
  * users who joined recently have not yet HAD t days to churn, and
  * dropping them biases survival down. KM credits each user to the
  * risk set for exactly the days they were observable.
  *
  * Observation model (event-log form): a user's duration is
  * `datediff(last_day, first_day)`; the user CHURNED if their last
  * event is more than `censorDays` before the corpus horizon (the
  * global max day), otherwise they are right-censored (still alive as
  * far as the log can tell). `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` over
  * churn durations, emitted in LOG space: `exp` is not
  * cross-engine-reproducible but `ln` of identical doubles is (the
  * BLEU/Kneser–Ney precedent), and each factor's dᵢ/nᵢ comes from
  * exact BIGINT counts, so `log_surv` gates raw, unrounded.
  *
  * Determinism: the running product is a left fold in duration order
  * over the ONE sorted (t, ln-term) array (a window running double-sum
  * would be segment-tree-associated in some engines); the array is ≤
  * one entry per distinct duration — calendar-bounded, broadcast as a
  * 1-row frame (the Kneser–Ney B precedent). `1 − d/n` hits exact 0
  * only when every remaining user churns at the maximum duration;
  * Spark `ln(0)` is NULL while DuckDB gives −inf, so that final factor
  * is masked to NULL explicitly on both sides.
  *
  * Scale posture: one map-side-combinable min/max agg per user over
  * the raw log (the only data-sized shuffle), then everything operates
  * on |users| rows and finally ≤ |distinct durations| rows; the
  * single-partition window ranks a calendar-bounded frame. At 100 TB
  * the per-user agg is the whole cost and it is one exchange.
  *
  * Output: (t_days, n_risk, d_churn, n_end, log_surv) — one row per
  * distinct observed duration; `n_end` counts ALL users whose
  * observation ends at t (churned + censored), `n_risk` those with
  * duration ≥ t.
  */
object Survival {

  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, "censorDays >= 0")
    // cached: consumed by both the horizon agg and the duration frame —
    // without it the raw-log agg (the one data-sized pass) plans twice
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), date_trunc("day", col(tsCol)).as("_d"))
      .groupBy("_u")
      .agg(min("_d").as("_first"), max("_d").as("_last"))
      .cache()
    val horizon = perUser.agg(max(col("_last")).as("_hz"))
    val users = perUser.crossJoin(broadcast(horizon))
      .select(col("_u"),
        datediff(col("_last"), col("_first")).cast("long").as("t"),
        (datediff(col("_hz"), col("_last")) > censorDays).as("_churned"))
    val byT = users.groupBy("t").agg(
      sum(when(col("_churned"), 1L).otherwise(0L)).as("d"),
      count(lit(1)).as("c"))
    val total = byT.agg(sum(col("c")).as("_n"))
    // integer running count — association-free, so a window is safe here;
    // the frame is ≤ |distinct durations| rows (calendar-bounded)
    val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    // cached: feeds both the ln-term array and the output rows, and is
    // ≤ |distinct durations| rows (calendar-bounded)
    val risk = byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        (col("_n") - coalesce(sum(col("c")).over(wPrev), lit(0L))).cast("long"))
      .cache()
    // the sorted ln-term array: one entry per duration with a nonzero,
    // non-terminal hazard factor (d = n only at the max duration -> masked)
    val arr = risk.filter(col("d") < col("n_risk"))
      .agg(array_sort(collect_list(struct(col("t"),
        log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
          .as("_term")))).as("_a"))
    risk.crossJoin(broadcast(arr))
      .select(col("t").as("t_days"), col("n_risk"),
        col("d").as("d_churn"), col("c").as("n_end"),
        when(col("d") >= col("n_risk"), lit(null).cast("double"))
          .otherwise(expr(
            "aggregate(filter(_a, s -> s.t <= t), cast(0.0 as double), " +
              "(a, s) -> a + s._term)")).as("log_surv"))
  }

  /** Two-group log-rank test (Mantel 1966) over the same event-log
    * observation model as [[kaplanMeier]] — "do the two cohorts churn
    * at the same rate?", the inference companion to the KM curve
    * (eyeballing two survival curves is how retention experiments get
    * shipped on noise). `group` must evaluate to 0/1 per row and be
    * constant within a user (an md5 arm from `Sampling.hashBucket`, a
    * plan tier, a signup cohort).
    *
    * At each distinct churn duration t: d(t) pooled churns, d₁(t)
    * group-1 churns, n(t)/n₁(t) at risk (duration ≥ t). Then
    *
    *   O₁ = Σ d₁(t)                       (exact BIGINT)
    *   E₁ = Σ d(t)·n₁(t)/n(t)
    *   V  = Σ d(t)·(n₁/n)·(1−n₁/n)·(n−d)/(n−1)   [terms with n > 1]
    *   z  = (O₁−E₁)/√V,  chi2 = z²  (→ χ²₁ under H₀)
    *
    * Determinism: every count is an exact BIGINT; E₁ and V fold in
    * duration order over ONE sorted array (≤ |distinct durations| —
    * calendar-bounded, the KM discipline); z/chi2 are ROUND(…, 6).
    * The no-variance degenerate (every event time has n₁ ∈ {0, n}, or
    * no churn at all) masks z/chi2 to NULL, decided on the INTEGER
    * predicate d > 0 ∧ 0 < n₁ < n ∧ n > 1 — never a double ≈ 0 probe.
    *
    * Output is ONE row:
    * (n_users, n_users_1, n_event_times, o1, e1, v, z, chi2).
    *
    * Scale posture: one per-user min/max agg over the raw log (the
    * only data-sized exchange, map-side combinable), then a
    * duration-keyed agg on |users| rows and 1-row folds over the
    * calendar-bounded array. Same shape as [[kaplanMeier]].
    */
  def logRank(events: DataFrame, userCol: String, tsCol: String,
              group: Column,
              censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, "censorDays >= 0")
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("_u"), group.cast("long").as("_g"),
        date_trunc("day", col(tsCol)).as("_d"))
      .groupBy("_u")
      .agg(min("_d").as("_first"), max("_d").as("_last"),
        max("_g").as("_g"))
      .cache()
    val horizon = perUser.agg(max(col("_last")).as("_hz"))
    val users = perUser.crossJoin(broadcast(horizon))
      .select(col("_u"), col("_g"),
        datediff(col("_last"), col("_first")).cast("long").as("t"),
        (datediff(col("_hz"), col("_last")) > censorDays).as("_churned"))
    val byT = users.groupBy("t").agg(
      sum(when(col("_churned"), 1L).otherwise(0L)).as("d"),
      sum(when(col("_churned") && col("_g") === 1, 1L).otherwise(0L)).as("d1"),
      count(lit(1)).as("c"),
      sum(when(col("_g") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = byT.agg(sum(col("c")).as("_n"), sum(col("c1")).as("_n1"))
    val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(totals))
      .withColumn("n_risk",
        (col("_n") - coalesce(sum(col("c")).over(wPrev), lit(0L))).cast("long"))
      .withColumn("n1_risk",
        (col("_n1") - coalesce(sum(col("c1")).over(wPrev), lit(0L))).cast("long"))
    val ev = risk.filter(col("d") > 0)
    def dD(s: Column) = s.getField("d").cast("double")
    def nD(s: Column) = s.getField("n_risk").cast("double")
    def n1D(s: Column) = s.getField("n1_risk").cast("double")
    val folded = ev.agg(
      count(lit(1)).as("n_event_times"),
      sum(col("d1")).cast("long").as("o1"),
      // integer-decided variance-existence probe
      max(when(col("n1_risk") > 0 && col("n1_risk") < col("n_risk") &&
        col("n_risk") > 1, 1)).as("_hasv"),
      array_sort(collect_list(struct(col("t"), col("d"), col("n_risk"),
        col("n1_risk")))).as("_a"))
    val e1 = aggregate(col("_a"), lit(0.0), (a, s) =>
      a + dD(s) * n1D(s) / nD(s))
    val v = aggregate(col("_a"), lit(0.0), (a, s) =>
      a + when(s.getField("n_risk") > 1,
        dD(s) * (n1D(s) / nD(s)) * (lit(1.0) - n1D(s) / nD(s)) *
          (nD(s) - dD(s)) / (nD(s) - lit(1.0))).otherwise(lit(0.0)))
    val z = (col("o1").cast("double") - col("_e1")) / sqrt(col("_v"))
    folded.crossJoin(broadcast(totals))
      .withColumn("_e1", e1).withColumn("_v", v)
      .select(col("_n").cast("long").as("n_users"),
        col("_n1").cast("long").as("n_users_1"),
        col("n_event_times"), coalesce(col("o1"), lit(0L)).as("o1"),
        round(col("_e1"), 6).as("e1"), round(col("_v"), 6).as("v"),
        when(col("_hasv").isNull, lit(null).cast("double"))
          .otherwise(round(z, 6)).as("z"),
        when(col("_hasv").isNull, lit(null).cast("double"))
          .otherwise(round(z * z, 6)).as("chi2"))
  }
}
