package graft.ops

import org.apache.spark.sql.DataFrame
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
}
