package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Streaming benchmark-decontamination gate — the continuous-ingest
  * rendering of [[graft.ops.Dedup.contamination]]: documents arriving
  * on a stream are checked against a STATIC held-out eval set, and any
  * doc sharing at least `minShared` word `n`-grams with an eval doc is
  * flagged before it reaches the training corpus. The batch op audits
  * a corpus after the fact; this keeps the leak from landing at all.
  *
  * Shape: a stream-static inner equi-join on the shingle. The eval
  * side is tiny by definition (benchmarks, not corpora), so its
  * posting list broadcasts and the per-microbatch cost is one
  * map-side explode + broadcast-hash-join + windowed count per
  * arriving doc — no stream-stream state, no corpus-side index. The
  * count aggregation groups by an event-time window (every shingle of
  * a doc carries the doc's single timestamp, so a doc lives in exactly
  * one window) and finalizes in append mode once the watermark passes.
  *
  * State sizing at scale: one agg row per (window, flagged doc,
  * eval doc) candidate within the watermark horizon — bounded by
  * arrival rate × horizon × eval-collision rate, independent of
  * stream lifetime or corpus size.
  * Output: (doc_id, eval_id, shared_ngrams), emitted after the doc's
  * window finalizes.
  */
object StreamingContamination {

  def gate(stream: DataFrame, evalDocs: DataFrame, idCol: String,
           textCol: String, tsCol: String, n: Int = 8, minShared: Int = 2,
           watermark: String = "10 minutes",
           windowLen: String = "10 minutes"): DataFrame = {
    val evalPost = Dedup.shingleSets(evalDocs, idCol, textCol, n)
      .select(col("doc_id").as("eval_id"), explode(col("shingles")).as("_sh"))
    val streamPost = stream
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc_id"), col(tsCol).as("_ts"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("_sh"))
    streamPost
      .join(broadcast(evalPost), "_sh")
      .groupBy(window(col("_ts"), windowLen), col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
      .select(col("doc_id"), col("eval_id"), col("shared_ngrams"))
  }
}
