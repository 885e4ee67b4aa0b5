package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion funnels and cohort retention — the two
  * behavioral-analytics shapes every event-stream product team asks of
  * an engine like the reference's (its KPIs stop at per-genre/user
  * rollups; funnel/retention are the natural next queries over the
  * same `streams` events).
  *
  * Both are built from hash aggregations only — no self-join of the
  * fact table against itself, no window over the full event stream —
  * so the 100 TB cost is k passes of map-side-combined aggregation
  * shuffled by user (k = number of stages), plus joins on the per-user
  * frame, which is |users| rows, not |events|.
  */
object Funnel {

  /** Per-user first-completion time of each ordered stage:
    * t0 = min ts of stage-0 events; t_i = min ts of stage-i events
    * strictly after t_{i-1}. Null t_i = the user never reached stage i.
    * Output: (user, t0 … t_{k-1}).
    *
    * One hash-agg + one per-user join per stage; the events side is
    * filtered to the stage's type BEFORE the join (predicate pushdown
    * reaches the scan), so each pass reads one stage's slice.
    */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var acc = events
      .filter(col(typeCol) === stages.head && col(userCol).isNotNull)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val next = events.filter(col(typeCol) === st && col(userCol).isNotNull)
        .select(col(userCol), col(tsCol).as("_ts"))
      val carried = col(userCol) +: (0 until i).map(j => col(s"t$j"))
      acc = acc.join(next, Seq(userCol), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("_ts") > col(s"t${i - 1}"), col("_ts"))).as(s"t$i"))
    }
    acc
  }

  /** Stage-level funnel summary: (stage, stage_name, users, conversion)
    * where `users` counts users whose t_stage is non-null and
    * `conversion` = users / stage-0 users (int/int → double, identical
    * on any engine).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    val times = stageTimes(events, userCol, tsCol, typeCol, stages)
    val counts = times.agg(
      count(col("t0")).as("c0"),
      stages.indices.drop(1).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    // one stack over the single aggregated row — conversion is computed
    // in the same select so the aggregation branch is never referenced
    // (and thus recomputed) twice
    val stackArgs = stages.zipWithIndex.map { case (name, i) =>
      s"CAST($i AS BIGINT), '$name', c$i, ROUND(c$i / c0, 6)"
    }.mkString(", ")
    counts.select(expr(
      s"stack(${stages.size}, $stackArgs) AS (stage, stage_name, users, conversion)"))
  }

  /** Weekly cohort retention: cohort_week = ISO week of the user's
    * first event; one row per (cohort_week, week_offset) with distinct
    * active users and retention = active / cohort size.
    *
    * Two aggregations (first-event per user; distinct user-weeks) and
    * two joins on per-user / per-cohort frames — the event table is
    * scanned twice and never self-joined. `week_offset` is exact LONG
    * arithmetic: day-difference of week-truncated timestamps div 7.
    */
  def weeklyRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val clean = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val cohort = clean.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = clean
      .select(col(userCol), date_trunc("week", col(tsCol)).as("_week"))
      .distinct()
    val sizes = cohort.groupBy("cohort_week")
      .agg(countDistinct(col(userCol)).as("cohort_users"))
    active.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"),
        call_function("div", datediff(col("_week"), col("cohort_week")).cast("long"),
          lit(7L)).as("week_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"),
        round(col("active_users") / col("cohort_users"), 6).as("retention"))
  }

  /** Frequent leading paths: each user's first `k` event types in
    * time order rendered as one `a>b>c` string, counted across users —
    * the "what do journeys look like" query behind every onboarding
    * analysis. Output: (path, n_users), paths of truncated users
    * included (a 2-event user contributes their 2-step path).
    *
    * Determinism: each user's first `k` rows are selected by a
    * `row_number() <= k` rank filter over (ts, tie) — `tieCol` pins
    * equal-timestamp ordering — and the rendering reads rank slots, so
    * it is independent of partition order by construction.
    *
    * Scale posture: the rank filter plans as `WindowGroupLimit`
    * (Spark ≥ 3.5): each task keeps a bounded k-heap per user while
    * scanning, so a power user with millions of events never inflates
    * window or agg state — the collect that follows sees AT MOST `k`
    * rows per user by construction (the previous shape collected the
    * user's ENTIRE history into one hash-agg buffer before slicing).
    * The path count agg is |distinct paths| ≤ |types|^k rows.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, tieCol: String, k: Int): DataFrame = {
    require(k >= 1, "paths need at least one step")
    import org.apache.spark.sql.expressions.Window
    // _t in the orderBy: when (ts, tie) is not unique the rank cutoff
    // would otherwise fall on partition/scan order — the type column
    // restores the total order the old sort-then-slice shape had
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_ts"), col("_tie"), col("_t"))
    val firstK = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol).as("_ts"), col(tieCol).as("_tie"),
        col(typeCol).as("_t"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
    // Path rendering via k conditional-max columns keyed by the rank —
    // NOT collect_list: an ObjectHashAggregate falls back to sort-based
    // past spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // (default 128) distinct keys per partition, and user count is
    // exactly the high-cardinality case — measured 23× cost for 10×
    // data before this change, ~linear after. `_rn` already encodes the
    // (ts, tie, type) total order, so a declarative max per rank slot
    // renders the identical path; concat_ws skips the null slots of
    // users with fewer than k events. The agg also reuses the window's
    // hash partitioning — no extra shuffle.
    val slots = (1 to k).map(i =>
      max(when(col("_rn") === i, col("_t"))).as(s"_p$i"))
    firstK
      .groupBy(col(userCol))
      .agg(slots.head, slots.tail: _*)
      .select(concat_ws(">", (1 to k).map(i => col(s"_p$i")): _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
  }

  /** Training-example construction from a raw event stream: for every
    * LABEL event (rows whose `typeCol` equals `labelType`), emit the
    * user's `k` immediately-preceding event types in time order as one
    * `a>b>c` context string — the point-in-time-correct (features
    * strictly BEFORE the label, never at or after it) sequence dataset
    * behind next-action prediction and churn models. Users' first
    * labels keep their shorter (possibly empty) context: dropping them
    * would bias the dataset toward established users.
    *
    * Determinism: the frame is `ROWS BETWEEN k PRECEDING AND 1
    * PRECEDING` over a (ts, tie) total order — `tieCol` (a unique
    * event id) pins equal-timestamp ordering, so the rendered context
    * is engine-independent.
    *
    * Scale posture: ONE per-user ordered window pass; the frame holds
    * at most `k` rows regardless of how hot the user is (contrast a
    * collect-then-slice shape, whose agg buffer is the user's whole
    * history). Window partitions are per-user — human-bounded — and
    * the label filter runs AFTER the frame is computed, map-side.
    * Output: (event_id, user_id, ts, context, n_context).
    */
  def labeledSequences(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String, labelType: String,
                       k: Int): DataFrame = {
    require(k >= 1, "context window needs at least one step")
    import org.apache.spark.sql.expressions.Window
    val hist = Window.partitionBy(col(userCol))
      .orderBy(col("_ts"), col("_tie"))
      .rowsBetween(-k, -1)
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(tieCol).isNotNull)
      .select(col(userCol), col(tsCol).as("_ts"), col(tieCol).as("_tie"),
        col(typeCol).as("_t"))
      .withColumn("_ctx", collect_list(col("_t")).over(hist))
      .filter(col("_t") === labelType)
      .select(col("_tie").as("event_id"), col(userCol),
        col("_ts").as("ts"),
        concat_ws(">", col("_ctx")).as("context"),
        size(col("_ctx")).cast("long").as("n_context"))
  }

  /** First-order (Markov) transition counts over each user's ordered
    * event stream: one row per observed (from_type, to_type) with the
    * transition count and the row-conditional probability
    * `p = n / Σ n over from_type` (long/long → double, identical on
    * any engine). `tieCol` pins the order of equal-timestamp events.
    *
    * Scale posture: one per-user ordered window (lead) — partition
    * size is a user's own event count, human-bounded — then a hash agg
    * on (from, to), whose cardinality is |event types|², tiny. The
    * per-from totals come from a second window over THAT tiny frame,
    * not another pass over events.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(ord).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    counts
      .withColumn("_total", sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("_total"), 6).as("p"))
  }

  /** Cohort lifetime-value table: users grouped by first-active
    * period (the cohort — UTC-aligned `periodDays`-day buckets,
    * weekly by default), revenue accumulated by periods-since-first
    * (the age) — the "how much is a week-1 signup worth by week 3"
    * matrix behind payback-period decisions, and the value-weighted
    * sibling of [[retention]]'s user counts. All-integer: cents sum
    * per (user, period) first, period indices are epoch-day integer
    * divisions, the cohort size is the age-0 active-user count
    * (every cohort member is by definition active in their first
    * period) carried down the age axis by a window, and per-user LTV
    * is integer division.
    * Output: (cohort_period, age_periods, n_active, cohort_size,
    * rev_cents, cum_cents, ltv_per_user_cents).
    *
    * Scale posture: the (user, period) agg collapses the log; the
    * user-window and all later frames are user-period sized; single
    * lineage (no joins, sizes ride a first_value window).
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
                cents: Column, periodDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(periodDays >= 1 && periodDays <= 366, "1 <= periodDays <= 366")
    val periodUs = 86400000000L * periodDays
    val um = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("_u"),
        expr(s"unix_micros(${tsCol}) div ${periodUs}L").as("_m"))
      .agg(sum(coalesce(cents.cast("long"), lit(0L))).cast("long").as("_v"))
      .withColumn("_m0", min(col("_m")).over(Window.partitionBy("_u")))
    val byAge = um
      .groupBy(col("_m0"), (col("_m") - col("_m0")).as("age_periods"))
      .agg(count(lit(1)).cast("long").as("n_active"),
        sum(col("_v")).cast("long").as("rev_cents"))
    val wc = Window.partitionBy("_m0").orderBy("age_periods")
    byAge
      .withColumn("cohort_size",
        first(col("n_active")).over(
          wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_cents",
        sum(col("rev_cents")).over(
          wc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .select(col("_m0").as("cohort_period"),
        col("age_periods"), col("n_active"), col("cohort_size"),
        col("rev_cents"), col("cum_cents"),
        expr("cum_cents div cohort_size").as("ltv_per_user_cents"))
  }

  /** Top-k sequential 3-grams of the per-user event stream — the
    * "what flows actually happen" mining pass behind funnel design:
    * [[funnel]] checks a HYPOTHESIZED stage order, this surfaces the
    * dominant observed orders. Two stacked `lead`s over the same
    * per-user window produce adjacent triples; exact integer counts;
    * deterministic top-k by (n DESC, e1, e2, e3).
    *
    * Scale posture: one per-user window (the only data-sized
    * exchange) into a |types|³-bounded cell agg; the rank window runs
    * on the cut's ≤topK rows.
    */
  def sequentialPatterns(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, tieCol: String,
                         topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1 && topK <= 10000, "1 <= topK <= 10000")
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val cells = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(ord).as("e2"),
        lead(col(typeCol), 2).over(ord).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
    cells
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(topK)
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("n").desc, col("e1"), col("e2"), col("e3")))
        .cast("long"))
  }

  /** Exact time-to-convert percentiles between two event types: per
    * user, the gap from the FIRST `fromType` to the first `toType` at
    * or after it, then the nearest-rank p50/p90 of the gap-seconds
    * multiset. The latency distribution behind funnel stage design —
    * a mean hides the bimodal "instant vs came-back-next-day" shape
    * that decides session windows and retargeting delays.
    *
    * Exactness end to end: gaps are integer epoch-second differences;
    * the percentile predicate is the integer cross-multiplication
    * `100·cum ≥ p·n` (⟺ cum ≥ ⌈p·n/100⌉, nearest-rank-ceil), so no
    * index arithmetic or doubles exist anywhere. The first-to-after-
    * first-from gap rides a running-min window: at any `toType` row
    * the running min of from-times IS the user's first from-time, so
    * `min(to_ts − running_from_min)` is exactly (first qualifying to)
    * − (first from).
    *
    * Scale posture: one per-user window + per-user agg collapse the
    * events; the cumulative window runs on the distinct-gap frame
    * (bounded by distinct second-counts, not users).
    */
  def stageLatency(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, tieCol: String,
                   fromType: String, toType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gaps = fromMinAnnotated(events, userCol, tsCol, typeCol, tieCol,
      fromType, toType)
      .groupBy("_u")
      .agg(min(when(col("_e") === toType && col("_from_min").isNotNull,
        expr("(_us - _from_min) div 1000000"))).as("_gap_s"))
      .filter(col("_gap_s").isNotNull)
    val cum = gaps.groupBy("_gap_s").agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(
        Window.orderBy("_gap_s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy()))
    cum.agg(first(col("_n")).cast("long").as("n_converted"),
      min(when(col("_cum") * 100 >= col("_n") * 50, col("_gap_s")))
        .cast("long").as("p50_s"),
      min(when(col("_cum") * 100 >= col("_n") * 90, col("_gap_s")))
        .cast("long").as("p90_s"))
  }

  /** Funnel conversion with time-window breakdowns: of the users who
    * ever reached `fromType`, how many converted to `toType` at all,
    * and how many within 1 minute / 1 hour / 1 day — the
    * time-decomposed completion read that [[stageLatency]]'s
    * percentiles summarize from the other side. Same running-min gap
    * machinery (gap = first qualifying `to` minus first `from`);
    * every output is an exact count or a `·1000000 div` ppm of
    * exact counts. Output ONE row: (n_eligible, n_converted,
    * conv_ppm, conv_1m_ppm, conv_1h_ppm, conv_1d_ppm).
    *
    * Scale posture: one per-user window + per-user agg; the window
    * breakdown is a single 1-row agg over the per-user frame.
    */
  def conversionWindows(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieCol: String,
                        fromType: String, toType: String): DataFrame = {
    val perUser = fromMinAnnotated(events, userCol, tsCol, typeCol, tieCol,
      fromType, toType)
      .groupBy("_u")
      .agg(max(when(col("_e") === fromType, 1L).otherwise(0L)).as("_has_from"),
        min(when(col("_e") === toType && col("_from_min").isNotNull,
          col("_us") - col("_from_min"))).as("_gap_us"))
      .filter(col("_has_from") === 1)
    perUser
      .agg(count(lit(1)).cast("long").as("n_eligible"),
        count(col("_gap_us")).cast("long").as("n_converted"),
        sum(when(col("_gap_us") <= 60000000L, 1L).otherwise(0L))
          .cast("long").as("_c1m"),
        sum(when(col("_gap_us") <= 3600000000L, 1L).otherwise(0L))
          .cast("long").as("_c1h"),
        sum(when(col("_gap_us") <= 86400000000L, 1L).otherwise(0L))
          .cast("long").as("_c1d"))
      .select(col("n_eligible"), col("n_converted"),
        ppmOf("n_converted").as("conv_ppm"),
        ppmOf("_c1m").as("conv_1m_ppm"),
        ppmOf("_c1h").as("conv_1h_ppm"),
        ppmOf("_c1d").as("conv_1d_ppm"))
  }

  /** ppm of `n_eligible`, NULL-masked when the funnel is empty. */
  private def ppmOf(c: String): Column =
    when(col("n_eligible") === 0, lit(null).cast("long"))
      .otherwise(expr(s"$c * 1000000L div n_eligible"))

  /** The shared running-min gap frame behind [[stageLatency]] and
    * [[conversionWindows]]: events filtered to the two stage types,
    * annotated with `_from_min` = the user's earliest `fromType`
    * epoch-μs at or before each row. At any `toType` row the running
    * min IS the user's first from-time, so a per-user min over
    * `_us − _from_min` is exactly (first qualifying to) − (first
    * from). Columns: (_u, _e, _us, _from_min).
    */
  private def fromMinAnnotated(events: DataFrame, userCol: String,
                               tsCol: String, typeCol: String, tieCol: String,
                               fromType: String, toType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull &&
        col(typeCol).isin(fromType, toType))
      .select(col(userCol).as("_u"), col(typeCol).as("_e"),
        unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"))
      .withColumn("_from_min",
        min(when(col("_e") === fromType, col("_us"))).over(
          Window.partitionBy(col("_u")).orderBy(col("_us"), col("_tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Entropy rate (nats/step) of the first-order Markov chain over
    * adjacent event-type transitions — how predictable is the NEXT
    * action given the current one? 0 means deterministic flows
    * (scripted traffic, rigid funnels); ln(|states|) means uniform
    * chaos. Empirical plug-in over the same per-user adjacent pairs
    * as [[transitions]]:
    *
    *   H = Σ_ij (n_ij / N) · ln(rt_i / n_ij)
    *
    * (π weighting falls out of the joint counts). Integer sufficient
    * stats, one sorted-cell fold, ln → rounded at 6 dp — the
    * `Stats.mutualInformation` discipline. Output ONE row:
    * (n_transitions, n_states, entropy_rate_nats).
    */
  def markovEntropyRate(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val cells = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("_f"),
        lead(col(typeCol), 1).over(ord).as("_t"))
      .filter(col("_t").isNotNull)
      .groupBy("_f", "_t").agg(count(lit(1)).as("_n"))
      // row totals via a window over the |states|²-bounded cell frame —
      // one lineage, no join, no re-derivation of the transition scan
      .withColumn("_rt",
        sum(col("_n")).over(Window.partitionBy(col("_f"))).cast("long"))
    val folded = cells
      .agg(array_sort(collect_list(struct(col("_f"), col("_t"), col("_n"),
        col("_rt")))).as("_a"),
        sum(col("_n")).cast("long").as("n_transitions"),
        countDistinct(col("_f")).as("n_states"))
    val h = aggregate(col("_a"), lit(0.0), (acc, s) =>
      acc + (s.getField("_n").cast("double") /
          col("n_transitions").cast("double")) *
        log(s.getField("_rt").cast("double") / s.getField("_n").cast("double")))
    folded.select(col("n_transitions"), col("n_states"),
      round(h, 6).as("entropy_rate_nats"))
  }
}
