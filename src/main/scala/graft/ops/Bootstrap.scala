package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — the uncertainty-quantification
  * tool that actually works on a cluster. The classic bootstrap draws
  * n units WITH replacement per replicate, which needs a global index
  * (a sort) and n random draws per replicate; the Poisson bootstrap
  * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
  * Streams") replaces it with an independent Poisson(1) multiplicity
  * per (unit, replicate) — map-side, no coordination, and the
  * replicate sizes concentrate at n. Here the multiplicity is
  * DERANDOMIZED: `md5("unit_rep") % 1e6` cut against the fixed
  * cumulative-Poisson ppm thresholds, so any engine — or the DuckDB
  * oracle — re-derives the exact same resample (the md5-split
  * discipline of [[Stats.welchZ]]).
  *
  * Replicate statistics are exact-integer: the per-unit metric must be
  * integral (cents, counts), multiplicities are ≤ 9 (P(K>9) < 1e-6),
  * so `Σ m·x` and `Σ m` are BIGINT sums — association-free — and each
  * replicate mean is one double division. Quantiles of the replicate
  * means (the CI) are type-1 picks from the B-sorted array, all
  * engine-bit-identical.
  *
  * Scale posture: one map-side-combinable per-unit agg over the log,
  * then a B-way map-side explode of the |units|-row frame into a
  * B-row agg. Cost is B × |units| slot rows through one exchange —
  * linear, no global sort, no per-replicate pass.
  */
object Bootstrap {

  /** Cumulative Poisson(1) ppm thresholds: h < t(k) ⇒ multiplicity k. */
  private val cumPpm = Seq(367879L, 735758L, 919698L, 981011L, 996340L,
    999405L, 999916L, 999989L, 999998L)

  /** Multiplicity CASE chain over the ppm hash — shared shape with the
    * SQL oracle (see SparkEntry's q_bootstrap_ci twin).
    */
  private def multiplicity(h: Column): Column =
    cumPpm.zipWithIndex.foldRight(lit(cumPpm.length): Column) {
      case ((t, k), rest) => when(h < t, lit(k)).otherwise(rest)
    }

  /** Per-replicate resampled means of an integral per-unit metric.
    * Output: (rep, n_eff, wsum, mean) — `reps` rows; `n_eff` is the
    * replicate's resampled unit count, `mean` = wsum/n_eff (NULL for
    * the ~e^{-n} chance an entire replicate resamples to zero units).
    */
  def poissonBootstrapMeans(df: DataFrame, unitCol: String, metric: Column,
                            reps: Int = 64): DataFrame = {
    require(reps >= 1 && reps <= 4096, "1 <= reps <= 4096")
    // metric NULLs are dropped up front: a unit whose rows are ALL-NULL
    // must vanish entirely, not keep contributing multiplicities to
    // n_eff while adding nothing to wsum (a silent downward bias)
    val per = df.filter(col(unitCol).isNotNull && metric.isNotNull)
      .groupBy(col(unitCol).as("_u"))
      .agg(sum(metric).cast("long").as("_x"))
    val slots = per.select(col("_u"), col("_x"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("_h",
        Sampling.hashBucket(concat_ws("_", col("_u"), col("rep")), 1000000))
      .withColumn("_m", multiplicity(col("_h")).cast("long"))
    slots.groupBy(col("rep").cast("long").as("rep"))
      .agg(sum(col("_m")).cast("long").as("n_eff"),
        sum(col("_m") * col("_x")).cast("long").as("wsum"))
      .select(col("rep"), col("n_eff"), col("wsum"),
        when(col("n_eff") === 0, lit(null).cast("double"))
          .otherwise(col("wsum").cast("double") / col("n_eff").cast("double"))
          .as("mean"))
  }

  /** Derandomized two-sample permutation test, one test per stratum —
    * the EXACT-p companion to [[Stats.welchZ]]: no normal approximation,
    * no transcendental CDF, so the p-value is a small rational both
    * engines state identically (the property [[Stats.bhFdr]] needs to
    * gate a multiple-testing sweep bit-exactly).
    *
    * Units are per-(stratum, unit) metric sums; the OBSERVED split is
    * the md5 parity arm (the welchZ assignment); replicate `b`
    * reassigns every unit by `md5(unit_b) % 2` — under H₀ (no arm
    * effect) relabeling is measure-preserving, and the derandomized
    * relabels are fixed for any engine, run, and partitioning.
    *
    *   p = (1 + #{b : |diff_b| ≥ |diff_obs|}) / (B + 1)
    *
    * The exceedance test cross-multiplies instead of dividing:
    * |s1b·n0b − s0b·n1b| · (n1·n0) ≥ |s1·n0 − s0·n1| · (n1b·n0b),
    * all DECIMAL(38) integer products — the comparison is exact, so
    * `n_exceed` (hence p) is engine-bit-identical. A replicate that
    * lands every unit in one arm has no statistic and counts as
    * exceeding (conservative, probability ~2^{1−n}); a stratum whose
    * OBSERVED split is one-armed masks diff/p to NULL.
    *
    * Output: (stratum, n_units, n_treat, n_control, diff, n_exceed, p)
    * with diff = mean₁ − mean₀ ROUND(…, 6) and p raw (an exact small
    * rational, division of ≤ 4-digit ints — identical IEEE result).
    *
    * Scale posture: one per-(stratum, unit) agg over the log, then a
    * B-way map-side explode into a (stratum, b) agg — B × |units| slot
    * rows through one exchange, the Poisson-bootstrap cost shape. The
    * exceedance compare joins the B-row frame to the 1-row-per-stratum
    * observed frame (broadcast).
    */
  def permutationTest(df: DataFrame, unitCol: String, strataCol: String,
                      metric: Column, reps: Int = 199): DataFrame = {
    require(reps >= 1 && reps <= 4096, "1 <= reps <= 4096")
    val per = df.filter(col(unitCol).isNotNull && col(strataCol).isNotNull &&
        metric.isNotNull)
      .groupBy(col(strataCol).as("stratum"), col(unitCol).as("_u"))
      .agg(sum(metric).cast("long").as("_x"))
      .withColumn("_arm", Sampling.hashBucket(col("_u"), 2))
      .cache() // |units| rows; feeds the observed agg AND the explode
    val obs = per.groupBy("stratum").agg(
        count(lit(1)).as("n_units"),
        sum(when(col("_arm") === 1, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("_arm") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("_arm") === 1, col("_x")).otherwise(0L))
          .cast("long").as("_s1"),
        sum(when(col("_arm") === 0, col("_x")).otherwise(0L))
          .cast("long").as("_s0"))
    val repFrame = per
      .select(col("stratum"), col("_u"), col("_x"),
        explode(sequence(lit(0), lit(reps - 1))).as("b"))
      .withColumn("_ab",
        Sampling.hashBucket(concat_ws("_", col("_u"), col("b")), 2))
      .groupBy("stratum", "b")
      .agg(sum(when(col("_ab") === 1, 1L).otherwise(0L)).as("_n1b"),
        sum(when(col("_ab") === 0, 1L).otherwise(0L)).as("_n0b"),
        sum(when(col("_ab") === 1, col("_x")).otherwise(0L))
          .cast("long").as("_s1b"),
        sum(when(col("_ab") === 0, col("_x")).otherwise(0L))
          .cast("long").as("_s0b"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val exceed = repFrame.join(broadcast(obs), Seq("stratum"))
      .withColumn("_ex",
        when(col("_n1b") === 0 || col("_n0b") === 0, lit(1L)) // degenerate relabel
          .when(
            abs(dec(col("_s1b")) * dec(col("_n0b")) -
              dec(col("_s0b")) * dec(col("_n1b"))) *
              dec(col("n_treat") * col("n_control")) >=
            abs(dec(col("_s1")) * dec(col("n_control")) -
              dec(col("_s0")) * dec(col("n_treat"))) *
              dec(col("_n1b") * col("_n0b")), lit(1L))
          .otherwise(lit(0L)))
      .groupBy("stratum").agg(sum(col("_ex")).cast("long").as("n_exceed"))
    obs.join(exceed, Seq("stratum"))
      .select(col("stratum"), col("n_units"), col("n_treat"), col("n_control"),
        when(col("n_treat") === 0 || col("n_control") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("_s1").cast("double") /
              col("n_treat").cast("double") -
            col("_s0").cast("double") / col("n_control").cast("double"), 6))
          .as("diff"),
        col("n_exceed"),
        when(col("n_treat") === 0 || col("n_control") === 0,
          lit(null).cast("double"))
          .otherwise((col("n_exceed") + 1).cast("double") /
            lit((reps + 1).toDouble)).as("p"))
  }
}
