package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Hygiene for `localCheckpoint`-based iteration.
  *
  * `Dataset.localCheckpoint()` persists its internal row RDD in the block
  * manager, and `spark.catalog.clearCache()` does NOT release it — the
  * CacheManager only tracks SQL-cached plans. An iterative operator that
  * checkpoints every round ([[Dedup.nearDupClusters]], [[Graph.pageRank]])
  * therefore strands one materialized RDD per iteration until the driver
  * GC happens to collect the frame and the ContextCleaner notices: on a
  * long-lived session running hundreds of queries that is a steady leak of
  * executor storage memory, and at the 100 TB target it is an OOM. These
  * helpers free a superseded checkpoint deterministically, as soon as its
  * successor is materialized.
  */
private[graft] object Checkpoints {

  /** The block-backed RDD behind a `localCheckpoint`ed frame, if any.
    * A checkpointed Dataset's analyzed plan IS a leaf [[LogicalRDD]]
    * wrapping the persisted internal-row RDD — so only a root-level
    * match qualifies. Matching any LogicalRDD nested deeper would let
    * [[free]] unpersist blocks owned by a CALLER-checkpointed input
    * that this frame merely derives from; localCheckpoint truncates
    * lineage, so the caller's later reads would fail irrecoverably
    * with "checkpoint block not found". */
  def rddOf(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }

  /** Release `df`'s checkpoint blocks (non-blocking). Only call once no
    * un-materialized frame still reads from it — i.e. after the next
    * iteration's EAGER checkpoint (or a count/noop write) has run. */
  def free(df: DataFrame): Unit = rddOf(df).foreach(_.unpersist(blocking = false))
}
