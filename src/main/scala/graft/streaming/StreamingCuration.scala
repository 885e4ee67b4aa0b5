package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, TextAnalysis, Web}

/** Streaming crawl-curation gate — the continuous-ingest rendering of
  * the batch chain `CurationPipelineSpec` pins (parseHttp → content
  * gate → stripHtml → canonicalize → URL-dedup → blocklist → exact
  * text-dedup → quality floor → shard assignment), so crawled pages
  * are curated BEFORE they land in parquet instead of in a nightly
  * sweep. Mirrors [[IncrementalIngest]]'s posture: the stream does
  * everything that has a bounded-state or stateless rendering; the
  * few corpus-global steps remain the compaction job's business.
  *
  * Stage-by-stage streaming semantics:
  *   - parse / strip / canonicalize: pure map-side, ride the
  *     microbatch scan unchanged from the batch ops.
  *   - URL-dedup: `dropDuplicatesWithinWatermark` on `url_canon` —
  *     FIRST-ARRIVAL representative (the only choice online), state one
  *     row per distinct canonical URL within the horizon. The batch
  *     chain's hash-order representative differs in id but not in
  *     payload for true re-fetches; the convergence contract is over
  *     (url_canon, fingerprint) sets, asserted in
  *     `StreamingCurationSpec`.
  *   - blocklist: full label-boundary SUFFIX semantics without explode
  *     or state — one stream-static LEFT OUTER equi-join per suffix
  *     level (host suffixes of ≤ `maxHostLabels` labels; real hosts
  *     rarely exceed 6), blocked = any level matched. Equi-joins, so
  *     the static side broadcasts; hosts with MORE labels than
  *     `maxHostLabels` match on their deepest `maxHostLabels` suffix
  *     levels — a blocklist entry deeper than that is out of contract
  *     (document-level parity with [[Web.filterBlockedDomains]] at
  *     realistic label depths).
  *   - exact text-dedup: [[StreamingDedup.dedupExact]] (normalized
  *     fingerprint, watermark-bounded state).
  *   - quality floor: stateless filter.
  *   - shard: [[Sampling.hashBucket]] of `url_canon` — map-side and
  *     IDENTICAL to the batch `shardManifest` bucket for the same key,
  *     so a row lands in the same shard whichever tense curated it.
  *     Within-shard `pos` needs the corpus-global hash rank and stays
  *     with the batch manifest (same split as IncrementalIngest:
  *     discovery online, compaction in batch).
  *
  * Decontamination: [[StreamingContamination.gate]] runs on the OUTPUT
  * of this chain as the quarantine side-channel (windowed agg, append
  * after watermark) — flagged ids are blocked from the corpus store by
  * the sink, keeping this main path free of windowed aggregation so it
  * emits rows immediately in append mode.
  */
object StreamingCuration {

  /** Suffix-semantics blocklist gate for a STREAMING frame: one
    * stream-static left-outer equi-join per suffix level, blocked =
    * any level hit. See the object doc for the contract.
    */
  def filterBlockedDomainsStream(stream: DataFrame, urlCol: String,
                                 blocklist: DataFrame, blockedCol: String,
                                 maxHostLabels: Int = 6): DataFrame = {
    val b = blocklist.select(lower(col(blockedCol)).as("_blocked")).distinct()
    val withHost = stream.withColumn("_host_bl",
      Web.bareHost(Web.urlHost(col(urlCol))))
    val labels = split(col("_host_bl"), "\\.")
    var df = withHost
    for (i <- 1 to maxHostLabels) {
      // last i labels, only when the host has at least i of them
      val sfx = when(size(labels) >= i,
        array_join(slice(labels, -i, i), "."))
      df = df.withColumn(s"_sfx$i", sfx)
        .join(b.withColumnRenamed("_blocked", s"_bl$i"),
          col(s"_sfx$i") === col(s"_bl$i"), "left_outer")
    }
    val unblocked = (1 to maxHostLabels).map(i => col(s"_bl$i").isNull)
      .reduce(_ && _)
    df.filter(unblocked)
      .drop((1 to maxHostLabels).flatMap(i => Seq(s"_sfx$i", s"_bl$i")): _*)
      .drop("_host_bl")
  }

  /** The composed gate. Input: a streaming frame with `urlCol` (fetch
    * URL), `rawCol` (raw HTTP response payload) and event-time
    * `tsCol`. Output (append mode): curated rows with `text`,
    * `url_canon`, `host`, `domain`, `fingerprint`, `shard`.
    */
  def curate(stream: DataFrame, urlCol: String, rawCol: String, tsCol: String,
             blocklist: DataFrame, blockedCol: String,
             minTokens: Int = 5, watermark: String = "1 hour",
             shards: Int = 64): DataFrame = {
    val parsed = Web.parseHttp(stream, rawCol)
      .filter(col("status_code") === 200 && col("content_type") === "text/html")
      .withColumn("text", TextAnalysis.stripHtml(col("body")))
      .drop(rawCol, "body")
    val canon = Web.canonicalize(parsed, urlCol)
      .filter(col("url_canon").isNotNull)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url_canon")
    val unblocked = filterBlockedDomainsStream(canon, urlCol, blocklist, blockedCol)
    // the watermark is already set upstream of the URL-dedup; chained
    // stateful stages must ride it (redefining is an analysis error)
    val deduped = StreamingDedup.dedupExactWatermarked(unblocked, "text")
    deduped
      .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
      .withColumn("shard", Sampling.hashBucket(col("url_canon"), shards))
  }
}
