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
}
