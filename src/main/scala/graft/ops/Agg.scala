package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation shapes beyond plain sum/count that analytics consumers
  * expect from a warehouse engine, built with the repo's determinism
  * discipline: every result is a pure function of the input SET —
  * never of partitioning, row order, or float summation order.
  */
object Agg {

  /** Per-group ordered string concatenation (LISTAGG/string_agg).
    * `collect_list` alone is partition-order dependent; sorting the
    * collected array first makes the rendered string canonical.
    *
    * Scale posture: one hash agg; per-group state is the group's value
    * list — bounded by the group's OWN cardinality, the inherent cost
    * of this aggregate (cap upstream for adversarial groups). Output:
    * (group, n_values, joined).
    */
  def orderedStringAgg(df: DataFrame, groupCol: String, valueCol: String,
                       sep: String = ","): DataFrame =
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_values"),
        // sort on the TYPED value (struct field order), render after:
        // sorting the rendered strings would order integers
        // lexicographically ("10" < "2"), diverging from
        // LISTAGG(x ORDER BY x) semantics
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col(valueCol).as("v"),
            col(valueCol).cast("string").as("s")))),
          e => e.getField("s"))).as("joined"))

  /** Per-group mode with a DETERMINISTIC tie rule (highest count, then
    * smallest value) — `mode()` built-ins on any engine pick an
    * arbitrary winner on ties, which can never hash-verify.
    * Output: (group, mode_value, n_rows).
    *
    * Scale posture: hash agg on (group, value) — the only pass over
    * the data — then a rank window over the already-aggregated
    * (group, value) frame, which is distinct-cardinality-sized.
    */
  def modeByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).as("mode_value"))
      .agg(count(lit(1)).as("n_rows"))
    counts
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("n_rows").desc, col("mode_value"))))
      .filter(col("_rk") === 1)
      .drop("_rk")
  }

  /** Per-group Pearson correlation from EXACT integer inputs: `xCol`
    * and `yCol` must already be integer-scaled (cents, micros — the
    * caller owns the scaling and the overflow budget: every
    * sum-of-products must fit a LONG, and land under 2⁵³ so its
    * double image is exact). The five sufficient statistics are then
    * partition-order-independent long sums, and the final formula
    *
    *   r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²))
    *
    * composes the SAME IEEE doubles on any engine — unlike built-in
    * `corr()`, whose streaming co-moment accumulation folds doubles in
    * partition order and cannot cross-engine-verify.
    * Output: (group, n, corr) with corr rounded to 6.
    */
  def pearsonFromIntegers(df: DataFrame, groupCol: String,
                          xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("long"); val y = yCol.cast("long")
    df.filter(col(groupCol).isNotNull && x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      .select(col(groupCol), col("n"),
        round(
          (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
            (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")) *
             sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))),
          6).as("corr"))
  }

  /** Per-group ordinary least squares y = slope·x + intercept, closed
    * form from the same five exact LONG sums as [[pearsonFromIntegers]]
    * — partition-order independent, so slope/intercept are
    * deterministic and cross-engine-exact (the double formula is one
    * fixed expression tree over integer inputs; `ml`-style iterative
    * solvers cannot be oracle-verified bit-for-bit):
    *
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *   intercept = (Σy − slope_unrounded·Σx) / n
    *
    * Groups with zero x-variance emit null slope/intercept (vertical
    * line — undefined), not NaN/Inf. Output:
    * (group, n, slope, intercept), doubles rounded to 6.
    *
    * Scale posture: ONE map-side-combined hash agg over the data, then
    * arithmetic on the |groups|-row frame. The trend-per-key question
    * at 100 TB is exactly this shape — never a per-group solver.
    */
  /** Leakage-safe target encoding: each row's category is encoded as
    * the mean target of the category's STRICTLY EARLIER rows — the
    * time-ordered expanding-prior variant (no target leakage by
    * construction: the frame ends at `-1`, so a row never sees itself
    * or the future; a category's first occurrence encodes null — the
    * caller's cold-start policy, usually a global-prior fill). This is
    * the feature-engineering op behind categorical encodings for GBDT /
    * linear models where naive mean-encoding leaks the label.
    *
    * Determinism discipline: the target is integer-scaled to cents
    * BEFORE the window (`round(value·100)` → LONG), so the expanding
    * sum is exact integer arithmetic — partition-order independent and
    * engine-identical; ONE double division renders the mean at the end.
    * `tieCol` pins equal-timestamp ordering.
    *
    * Scale posture: one per-category ordered window with a running-sum
    * frame — state is O(1) per partition (sum + count), partitions are
    * per-category. A skewed hot category serializes its own partition
    * (inherent to expanding semantics); encode per (category × coarse
    * time shard) upstream when one category dominates.
    * Output: every input row as (tie, category, ts, value_cents,
    * prior_n, prior_mean).
    */
  def targetEncodeExpanding(df: DataFrame, catCol: String, tsCol: String,
                            tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(catCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .filter(col(catCol).isNotNull && col(tsCol).isNotNull &&
        col(tieCol).isNotNull && col(valueCol).isNotNull)
      .select(col(tieCol), col(catCol), col(tsCol),
        round(col(valueCol) * 100).cast("long").as("value_cents"))
      .withColumn("prior_n", count(lit(1)).over(w))
      // UNROUNDED: the two divisions of exact integers are bit-identical
      // on any IEEE engine, while round-to-6 put ~1-in-10⁵ rows on a
      // decimal half boundary where Spark (exact-expansion HALF_UP) and
      // DuckDB (scaled-double) disagree by 1 ulp — found by the sf0.1
      // oracle sweep, round 8
      .withColumn("prior_mean",
        sum("value_cents").over(w) / lit(100.0) / col("prior_n"))
  }

  def linearFit(df: DataFrame, groupCol: String,
                xCol: Column, yCol: Column): DataFrame = {
    val x = xCol.cast("long"); val y = yCol.cast("long")
    val stats = df.filter(col(groupCol).isNotNull && x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val denom = stats("n").cast("double") * col("sxx") -
      col("sx").cast("double") * col("sx")
    val slope = (col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")) / denom
    val intercept = (col("sy").cast("double") - slope * col("sx").cast("double")) /
      col("n").cast("double")
    stats.select(col(groupCol), col("n"),
      round(when(denom =!= 0.0, slope), 6).as("slope"),
      round(when(denom =!= 0.0, intercept), 6).as("intercept"))
  }

  /** OLS regression diagnostics — the top-k most anomalous points per
    * group under the [[linearFit]] model, by INTERNALLY STUDENTIZED
    * residual (residual / s√(1−h)), with the leverage h that separates
    * "far from the line" from "far from the x-mass". The audit answer
    * to "which rows drive this trend?" before trusting a fit.
    *
    * One exact-sum agg per group (adds Σy² to linearFit's five), the
    * ≤|groups|-row fit frame broadcast back onto the rows, all
    * per-row doubles one fixed tree from exact longs, the top-k picked
    * by a group-partitioned window ordered (|t| desc, x, y) — wholly
    * deterministic tie-break. Degenerate groups (n<3, zero x-variance,
    * zero residual variance — decided on the same doubles both engines
    * derive) are dropped. Output per kept row:
    * (group, x, y, leverage, residual, studentized, rank).
    */
  def regressionDiagnostics(df: DataFrame, groupCol: String, xCol: Column,
                            yCol: Column, k: Int = 5): DataFrame = {
    require(k >= 1, "k must be positive")
    val base = df.filter(col(groupCol).isNotNull &&
        xCol.isNotNull && yCol.isNotNull)
      .select(col(groupCol).as("_g"), xCol.cast("long").as("_x"),
        yCol.cast("long").as("_y"))
    val stats = base.groupBy("_g")
      .agg(count(lit(1)).as("_n"),
        sum(col("_x")).cast("long").as("_sx"),
        sum(col("_y")).cast("long").as("_sy"),
        sum((col("_x") * col("_x")).cast("decimal(38,0)")).as("_sxx"),
        sum((col("_x") * col("_y")).cast("decimal(38,0)")).as("_sxy"),
        sum((col("_y") * col("_y")).cast("decimal(38,0)")).as("_syy"))
    val nD = col("_n").cast("double")
    def d(c: String) = col(c).cast("double")
    val sxxC = d("_sxx") - d("_sx") * d("_sx") / nD
    val sxyC = d("_sxy") - d("_sx") * d("_sy") / nD
    val syyC = d("_syy") - d("_sy") * d("_sy") / nD
    val slope = sxyC / sxxC
    val rss = syyC - slope * sxyC
    val fit = stats
      .filter(col("_n") >= 3 && sxxC > lit(0.0))
      .select(col("_g"), col("_n"), d("_sx").as("_sxd"),
        sxxC.as("_sxxc"), slope.as("_b"),
        (d("_sy") / nD - slope * (d("_sx") / nD)).as("_a"),
        (rss / (nD - lit(2.0))).as("_s2"))
      .filter(col("_s2") > 0.0)
    val scored = base.join(broadcast(fit), Seq("_g"))
      .withColumn("_resid", col("_y").cast("double") -
        (col("_a") + col("_b") * col("_x").cast("double")))
      .withColumn("_h", lit(1.0) / col("_n").cast("double") +
        (col("_x").cast("double") - col("_sxd") / col("_n").cast("double")) *
        (col("_x").cast("double") - col("_sxd") / col("_n").cast("double")) /
        col("_sxxc"))
      .withColumn("_t", col("_resid") /
        sqrt(col("_s2") * (lit(1.0) - col("_h"))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("_g")
      .orderBy(abs(col("_t")).desc, col("_x"), col("_y"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_g").as(groupCol), col("_x").as("x"), col("_y").as("y"),
        round(col("_h"), 6).as("leverage"),
        round(col("_resid"), 6).as("residual"),
        round(col("_t"), 6).as("studentized"),
        col("rank").cast("long").as("rank"))
  }

  /** Per-group z-score standardization — the feature-scaling prep step
    * (normalize a metric within its cohort before thresholding,
    * ranking, or model input). `valueInt` must render the value as an
    * exact integer (caller picks the fixed-point scale —
    * `round(col("value") * 100)` for cents — the
    * [[graft.ops.TimeSeries.timeWeightedAvg]] contract), so the
    * per-group Σ and Σ² are exact LONGs and the population
    * mean/variance/z are ONE fixed double tree each:
    * `z = (v − s/n) / sqrt((s2 − s·s/n)/n)` — engine-bit-identical,
    * partition-order independent. Zero-variance groups (and
    * singletons) yield null z, never NaN/Inf.
    *
    * Scale posture: one map-side-combined hash agg to a |groups|-row
    * stats frame, joined back on the group key (Catalyst broadcasts it
    * when small — no forced hint, so a high-cardinality group column
    * degrades to a shuffle join, not an OOM); the z itself is
    * map-side. Caller owns overflow headroom: Σv² must fit a LONG
    * (|v| ≤ ~3e6 at a billion rows/group).
    */
  def standardizeByGroup(df: DataFrame, groupCol: String, keyCol: String,
                         valueInt: Column): DataFrame = {
    val rows = df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("_v", valueInt.cast("long"))
      .filter(col("_v").isNotNull)
    val stats = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"),
        sum(col("_v") * col("_v")).as("_s2"))
    val n = col("_n").cast("double")
    val s = col("_s").cast("double")
    val mean = s / n
    val vr = (col("_s2").cast("double") - s * s / n) / n
    rows.join(stats, Seq(groupCol))
      .select(col(groupCol), col(keyCol), col("_v").as("value_int"),
        // UNROUNDED on purpose: every op in the tree (+,−,×,÷,sqrt) is
        // IEEE-correctly-rounded over exact integers, so the doubles
        // are bit-identical cross-engine; rounding would only ADD
        // decimal-half-boundary divergence (the q_centroids lesson)
        mean.as("group_mean"),
        when(vr > 0d, (col("_v").cast("double") - mean) / sqrt(vr)).as("z"))
  }
}
