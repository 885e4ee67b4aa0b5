package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the missing tense of the dedup
  * family: [[graft.ops.Dedup]] covers the batch corpus,
  * `Dedup.incrementalNearDupPairs` the daily-batch-vs-store case; this
  * covers the continuous-ingest case (a crawler or event firehose
  * feeding the corpus), where duplicates must be dropped before they
  * ever land in parquet.
  *
  * Keyed on the md5 content fingerprint of the NORMALIZED text
  * ([[graft.ops.TextAnalysis.normalizeText]] — control chars out,
  * whitespace collapsed, case folded), so trivial re-encodings of the
  * same document collapse to one key, and the fingerprint matches the
  * batch `Dedup.exactDuplicateGroups` discipline (an engine-portable
  * hash, never Spark-seeded Murmur3).
  *
  * State sizing at scale: `dropDuplicatesWithinWatermark` keeps ONE
  * state row per distinct fingerprint seen within the watermark
  * horizon, evicted as event time passes — state is bounded by the
  * distinct-doc arrival rate × watermark, independent of stream
  * lifetime. The tradeoff is explicit: a duplicate arriving further
  * than `watermark` after its original is re-emitted (at that horizon
  * the batch/incremental store path is the backstop). An unbounded
  * `dropDuplicates` would grow state forever; a per-doc-id key would
  * miss content dups under different ids.
  */
object StreamingDedup {

  /** First occurrence of each normalized-content fingerprint within the
    * watermark horizon; later copies are dropped. Emits the input
    * columns plus the `fingerprint` used for the dedup decision (the
    * downstream sink can persist it straight into the incremental-dedup
    * sidecar store).
    *
    * Null-text rows PASS THROUGH untouched (fingerprint null) on a
    * stateless side branch: `dropDuplicatesWithinWatermark` treats
    * null keys as equal, so routing them through the dedup state would
    * keep one arbitrary null-text row per horizon and silently drop
    * every other distinct document that happens to lack text — a
    * dedup op must never discard rows it cannot compare.
    */
  def dedupExact(docs: DataFrame, textCol: String, tsCol: String,
                 watermark: String = "1 hour"): DataFrame =
    dedupExactWatermarked(docs.withWatermark(tsCol, watermark), textCol)

  /** [[dedupExact]] over a frame whose watermark is ALREADY set —
    * the composition entry point: Spark disallows redefining a
    * watermark, so a chained pipeline ([[StreamingCuration]]) sets it
    * once upstream and every stateful stage downstream rides it.
    */
  def dedupExactWatermarked(docs: DataFrame, textCol: String): DataFrame = {
    val fingerprinted = docs
      .withColumn("fingerprint",
        md5(graft.ops.TextAnalysis.normalizeText(col(textCol)).cast("binary")))
    fingerprinted
      .filter(col(textCol).isNotNull)
      .dropDuplicatesWithinWatermark("fingerprint")
      .unionByName(fingerprinted.filter(col(textCol).isNull))
  }
}
