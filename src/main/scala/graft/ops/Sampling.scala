package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and splitting for
  * training-data curation. Assignment depends ONLY on the row's key —
  * an md5-derived bucket — never on partitioning, row order, or an RNG
  * seed, so:
  *
  *   - the same row lands in the same split on every run, every engine,
  *     and every cluster size (the property a train/held-out split must
  *     have at 100 TB — `df.sample()`/`rand()` is partition-order
  *     dependent and unrepeatable after a repartition);
  *   - membership is checkable in SQL anywhere md5 exists, so an
  *     auditor can recompute the split without Spark;
  *   - sampling composes with incremental ingest: newly arrived rows
  *     join the same split their key dictates, no global state.
  *
  * Everything is a pure `Column` expression (codegen'd, map-side, no
  * shuffle).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the key rendered as a
    * string: the first 8 hex chars parsed as an unsigned 32-bit int, mod
    * `buckets`. Reproducible anywhere: DuckDB spells it
    * `('0x' || substr(md5(k::VARCHAR), 1, 8))::BIGINT % buckets`.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Keep rows whose bucket falls below `keepBuckets` — a deterministic
    * `keepBuckets / buckets` fraction of the keyspace.
    */
  def sampleByHash(df: DataFrame, keyCol: String, keepBuckets: Int,
                   buckets: Int = 100): DataFrame = {
    require(keepBuckets >= 0 && keepBuckets <= buckets, "keepBuckets out of range")
    df.filter(hashBucket(col(keyCol), buckets) < keepBuckets)
  }

  /** Label each row `train` / `test`: the top `testBuckets` of the
    * keyspace become the held-out set. Split before dedup/filtering so
    * leakage can't move a key across the boundary.
    */
  def trainTestSplit(df: DataFrame, keyCol: String, testBuckets: Int,
                     buckets: Int = 100, splitCol: String = "split"): DataFrame = {
    require(testBuckets >= 0 && testBuckets <= buckets, "testBuckets out of range")
    df.withColumn(splitCol,
      when(hashBucket(col(keyCol), buckets) >= buckets - testBuckets, lit("test"))
        .otherwise(lit("train")))
  }

  /** Stratified deterministic sampling: per-stratum keep thresholds
    * (buckets out of `buckets`), strata not listed keep nothing. The
    * per-class rebalancing move of a training-data pipeline (e.g. keep
    * 100% of rare languages, 5% of English) — same hash, so a row's
    * fate still never depends on order or partitioning.
    */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
                             keepBuckets: Map[String, Int],
                             buckets: Int = 100): DataFrame = {
    require(keepBuckets.values.forall(k => k >= 0 && k <= buckets), "keepBuckets out of range")
    val threshold = keepBuckets.foldLeft(lit(0)) { case (el, (stratum, keep)) =>
      when(col(strataCol) === stratum, lit(keep)).otherwise(el)
    }
    df.filter(hashBucket(col(keyCol), buckets) < threshold)
  }

  /** Deterministic hash-order rank within a group: 1 = the group's
    * first-kept row. Ordering by (md5(key), key) is stable under any
    * partitioning AND engine-reproducible (the key tiebreak covers the
    * measure-zero md5-collision case).
    */
  private def hashRank(groupCol: String, keyCol: String): Column = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string").cast("binary"))
    row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(h, col(keyCol))).cast("long")
  }

  /** Cap each group at `maxRows` rows, chosen by hash order — the
    * per-source quota of a corpus-curation pipeline ("at most N docs
    * per domain"), with the same determinism contract as the splits:
    * which rows survive depends only on their keys, so re-runs and
    * incremental appends agree (a row that made the cut can only be
    * displaced by a lower-hash newcomer, never by reordering).
    *
    * Scale posture: one window per group (shuffle by group; rank
    * truncation is a WindowGroupLimit pushdown — per-partition bounded
    * heaps when `maxRows` is small), no join, no driver state.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  maxRows: Int): DataFrame = {
    require(maxRows >= 1, "cap must keep at least one row")
    // null keys are dropped, not ranked: md5(null) is null, which would
    // sort FIRST and fill the quota with rows whose inter-se order is
    // partition-dependent — exactly the nondeterminism this operator
    // promises away. A row without identity has no stable fate.
    df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("_hr", hashRank(groupCol, keyCol))
      .filter(col("_hr") <= maxRows)
      .drop("_hr")
  }

  /** Balance classes by downsampling every class to the size of the
    * smallest one, hash-ordered: the cheap de-bias step before
    * training when one label dominates. Exact — every class emits
    * exactly `min(class sizes)` rows (assuming distinct keys).
    *
    * Scale posture: class sizes are one hash agg (|classes| rows,
    * broadcast as a scalar min); membership is the same per-class
    * window as [[capPerGroup]]. Nothing driver-side, nothing
    * order-dependent.
    */
  def balanceClasses(df: DataFrame, labelCol: String, keyCol: String): DataFrame = {
    // null keys dropped for the same determinism reason as capPerGroup
    val clean = df.filter(col(labelCol).isNotNull && col(keyCol).isNotNull)
    val sizes = clean.groupBy(col(labelCol)).agg(count(lit(1)).as("_n"))
    val minN = sizes.agg(min("_n").as("_min_n"))
    clean
      .withColumn("_hr", hashRank(labelCol, keyCol))
      .crossJoin(broadcast(minN))
      .filter(col("_hr") <= col("_min_n"))
      .drop("_hr", "_min_n")
  }
}
