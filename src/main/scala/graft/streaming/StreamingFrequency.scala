package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Frequency

/** Streaming heavy hitters — "which tokens / URLs / user agents are
  * trending-frequent over the WHOLE stream so far" — with Misra–Gries
  * state instead of one state row per distinct value.
  *
  * Why this exists: the obvious streaming `groupBy(value).count()` in
  * update mode keeps state per DISTINCT value — unbounded on web-scale
  * token/URL streams. The MG summary holds at most `k` counters per
  * shard forever, so state is bounded by construction and needs no
  * watermark, at the classic price: counts are lower bounds,
  * undercounting by at most n_shard/(k+1).
  *
  * Sharding: values route to `nShards` state keys by the same
  * engine-portable md5 bucket as [[graft.ops.Sampling.hashBucket]] —
  * every occurrence of a value lands in ONE shard, so each value's
  * full mass meets its shard's summary and the per-shard MG guarantee
  * applies to the value's GLOBAL count: anything with
  * `count > n_shard/(k+1)` is present in the output, and since
  * n_shard ≈ n/nShards the effective global threshold tightens as
  * shards are added. State scales horizontally: shards are ordinary
  * group-state keys spread across executors.
  *
  * Emission (update mode): each trigger that touches a shard re-emits
  * the shard's full candidate set — (shard, value, count_lb,
  * n_shard) — ≤ k rows per touched shard. `count_lb` is the MG lower
  * bound; for exact figures run [[Frequency.heavyHitters]]'s recount
  * pass over the candidates in batch (same two-phase contract as the
  * batch op).
  */
object StreamingFrequency {

  private[streaming] final case class ShardState(
      counters: Map[String, Long], n: Long)

  /** JVM-side twin of [[graft.ops.Sampling.hashBucket]]: first 8 hex
    * chars of md5(value) as an unsigned int, mod `nShards`.
    */
  private[streaming] def shardOf(v: String, nShards: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    (h % nShards).toInt
  }

  /** Update-mode stream of running heavy-hitter candidates.
    * Output: (shard, value, count_lb, n_shard). Null values drop.
    */
  def runningHeavyHitters(events: DataFrame, valueCol: String,
                          k: Int = 64, nShards: Int = 16): DataFrame = {
    require(k >= 1, "k must be positive")
    require(nShards >= 1, "need at least one shard")
    val spark = events.sparkSession
    import spark.implicits._
    val mg = new Frequency.MisraGriesAgg(k) // state-fold kernel
    events
      .select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .as[String]
      .groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState[ShardState, (Int, String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String], state: GroupState[ShardState]) =>
          var st = state.getOption.getOrElse(ShardState(Map.empty, 0L))
          rows.foreach { v =>
            st = ShardState(mg.reduce(st.counters, v), st.n + 1)
          }
          state.update(st)
          st.counters.iterator.map { case (v, c) => (shard, v, c, st.n) }
      }
      .toDF("shard", "value", "count_lb", "n_shard")
  }

  /** Running count-min cells in update mode — the OTHER bounded-state
    * frequency design: where [[runningHeavyHitters]] bounds state by
    * keeping only k candidate VALUES (lower bounds, candidates can be
    * evicted), the CM grid bounds state by hashing every value into a
    * FIXED depth×width cell grid (≤ d·w state rows by construction —
    * an ordinary streaming aggregation is already safe, no custom
    * state needed) and never forgets: any key's estimate — min over
    * its d cells, queried against this frame — is an UPPER bound that
    * a later batch [[graft.ops.Sketch.countMinAudit]] reproduces
    * exactly (same md5-seeded cells), because cells just add. The
    * streaming/batch twin is the mergeability contract demonstrated,
    * not claimed. Output (update mode): (r, bucket, cnt).
    */
  def runningCountMinCells(events: DataFrame, keyCol: String,
                           depth: Int = 3, width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 8, "1 <= depth <= 8")
    require(width >= 1, "width >= 1")
    events.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", graft.ops.Sampling.hashBucket(
        concat_ws(":", col("r"), col("key")), width))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
  }
}
