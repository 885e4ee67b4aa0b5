package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-QA gate a training-data
  * pipeline runs before and after every transformation (ingest drift,
  * dedup fallout, split integrity): per-column completeness,
  * cardinality, and value range.
  *
  * All profiled columns aggregate in a SINGLE pass over the table (one
  * `agg` with every measure, then a `stack` to one row per column) —
  * never a per-column scan loop. Min/max render as strings so one
  * output schema covers heterogeneous column types.
  *
  * Exact `COUNT(DISTINCT)` over several columns plans through Spark's
  * `Expand` (one duplicated stream per distinct aggregate); at 100 TB
  * set `approxDistinct = true` to switch to single-pass HyperLogLog
  * sketches (±2.3%) with no expand.
  */
object Profile {

  /** One-row mergeable statistics STATE for `valueCol`: exact row /
    * non-null counts, native-typed min/max, and a KMV distinct sketch —
    * the unit of INCREMENTAL profiling. At 100 TB the corpus is never
    * re-profiled: each ingest batch computes its own state (one scan of
    * the batch), [[mergeColStats]] folds it into the persisted state
    * (a k-long array + four scalars), and [[finishColStats]] renders
    * current corpus stats from state alone. Every component is
    * associative-commutative, so states compose across batches, shards,
    * and engines in any order.
    *
    * Schema: (n_rows, n_nonnull, min_value, max_value, sketch) —
    * min/max keep the column's native type (string rendering would
    * order "10" < "9"; merging then needs the ORIGINAL order).
    */
  def colStatsState(df: DataFrame, valueCol: String, k: Int = 64): DataFrame = {
    val agg = udaf(new Sketch.KmvBufAgg(k))
    val v = col(valueCol)
    // -1 sentinel: KmvBufAgg skips negatives; null rows must stay in
    // the frame so n_rows counts them in the same single pass
    df.select(v.as("_v"), coalesce(Sketch.kmvHash(v), lit(-1L)).as("_hv"))
      .agg(count(lit(1)).as("n_rows"), count(col("_v")).as("n_nonnull"),
        min(col("_v")).as("min_value"), max(col("_v")).as("max_value"),
        agg(col("_hv")).as("sketch"))
  }

  /** Fold any number of state rows (per-batch, per-shard, per-day) into
    * one: counts add, min/max fold in native order, sketches union to
    * the k smallest distinct hashes. The collect is over STATE rows —
    * kilobytes per batch — never data.
    */
  def mergeColStats(states: DataFrame, k: Int = 64): DataFrame =
    states.agg(
      sum("n_rows").cast("long").as("n_rows"),
      sum("n_nonnull").cast("long").as("n_nonnull"),
      min("min_value").as("min_value"),
      max("max_value").as("max_value"),
      slice(array_sort(array_distinct(flatten(collect_list(col("sketch"))))),
        1, k).as("sketch"))

  /** Render corpus stats from a state frame:
    * (n_rows, n_nonnull, est_distinct, min_value, max_value). Exact
    * distinct below k (the sketch IS the value set), order-statistics
    * estimate above.
    */
  def finishColStats(state: DataFrame, k: Int = 64): DataFrame =
    state.select(col("n_rows"), col("n_nonnull"),
      Sketch.kmvEstimate(col("sketch"), k).as("est_distinct"),
      col("min_value"), col("max_value"))

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val measures = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__nn"),
        (if (approxDistinct) approx_count_distinct(c) else countDistinct(col(c)))
          .as(s"__${c}__nd"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', `__${c}__nn`, `__${c}__nd`, `__${c}__min`, `__${c}__max`").mkString(", ")
    df.agg(measures.head, measures.tail: _*)
      .select(col("__n_rows").as("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_nonnull, n_distinct, min_value, max_value)"))
      .select("column", "n_rows", "n_nonnull", "n_distinct", "min_value", "max_value")
  }

  /** Fixed-bound equi-width histogram of `valueCol`: bucket
    * `floor((x − lo) / step)` clamped to `[0, buckets)`, with counts
    * and the bucket's [lo, hi) bounds. Explicit bounds (not
    * data-derived min/max) keep this a SINGLE scan — a min/max
    * discovery pass would double the read at 100 TB — and make bucket
    * edges stable across batches, so per-batch histograms are
    * mergeable by simple addition.
    *
    * Parity note: `step`, the bucket index, and the bounds all derive
    * from the same IEEE double expressions any engine computes
    * identically (sub/div/mul/floor are exact-correctly-rounded ops) —
    * no data-dependent float summation anywhere.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                buckets: Int): DataFrame = {
    require(hi > lo && buckets > 0, "need hi > lo and buckets > 0")
    val step = (hi - lo) / buckets
    val idx = least(greatest(floor((col(valueCol) - lit(lo)) / lit(step)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("long")
    df.filter(col(valueCol).isNotNull)
      .select(idx.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .select(col("bucket"), col("n"),
        (lit(lo) + col("bucket") * lit(step)).as("bucket_lo"),
        (lit(lo) + (col("bucket") + 1) * lit(step)).as("bucket_hi"))
  }
}
