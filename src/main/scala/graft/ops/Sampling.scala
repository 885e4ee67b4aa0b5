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
}
