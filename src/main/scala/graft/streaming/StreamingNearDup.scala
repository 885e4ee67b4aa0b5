package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}
import graft.functions.VectorExpressions

/** Streaming near-duplicate gate — the continuous-ingest rendering of
  * [[graft.ops.Dedup.nearDupPairsMinHash]]: documents arriving on a
  * stream are checked for FUZZY duplication against a STATIC corpus
  * index (the already-accepted training set), so a near-copy is
  * flagged before it lands. [[StreamingContamination]] gates on exact
  * shared n-grams against a tiny eval set; this gates on Jaccard
  * similarity against the full corpus, which is what ingest-time
  * dedup actually needs.
  *
  * Shape per micro-batch: shingle + MinHash the arriving docs once
  * (one projection, the codegen'd `minhash_sig` kernel), explode into
  * `bands` bucket keys, and equi-join the static band index on
  * (band, bucket) — candidate fanout is bucket-bounded exactly like
  * the batch pipeline, never corpus×batch. Each candidate is verified
  * EXACTLY in the same map task via `array_intersect` on the carried
  * shingle sets (the sets are distinct by construction, so the
  * size-arithmetic Jaccard equals the batch pipeline's
  * `verifyExactJaccard`), then candidates that matched in several
  * bands collapse to one row per (window, doc, corpus doc) in a
  * watermarked windowed agg (append mode; a doc carries one timestamp
  * so it lives in exactly one window). No stream-stream join, no
  * unbounded state.
  *
  * State sizing at scale: agg rows are (window, doc, matched corpus
  * doc) candidates inside the watermark horizon — bounded by arrival
  * rate × horizon × collision rate, independent of stream lifetime.
  * The static index is corpus-sized: cache it (the caller owns the
  * frame), and at 100 TB persist it as parquet bucketed by
  * (band, bucket) so each micro-batch joins without re-shuffling the
  * corpus side.
  * Output: (doc_id, corpus_id, jaccard), emitted after the doc's
  * window finalizes.
  */
object StreamingNearDup {

  /** Banded MinHash index of the accepted corpus, shingle sets carried
    * for exact verification. Build once, `.cache()` (or persist as
    * bucketed parquet), reuse across micro-batches.
    * Output: (band, bucket, corpus_id, corpus_shingles).
    */
  def corpusIndex(corpus: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                  seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val sets = Dedup.shingleSets(corpus, idCol, textCol, n)
    val sigs = Dedup.minHashFromSets(sets, numHashes, seed)
    sigs.join(sets, "doc_id")
      .select(col("doc_id").as("corpus_id"),
        col("shingles").as("corpus_shingles"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .select("band", "bucket", "corpus_id", "corpus_shingles")
  }

  /** The gate. `index` must come from [[corpusIndex]] with the SAME
    * (n, numHashes, bands, seed). Emits one row per (arriving doc,
    * matched corpus doc) with exact Jaccard ≥ `tau`, after the doc's
    * event-time window finalizes.
    */
  def gate(stream: DataFrame, index: DataFrame, idCol: String,
           textCol: String, tsCol: String,
           n: Int = 3, tau: Double = 0.5,
           numHashes: Int = 64, bands: Int = 16, seed: Long = 42L,
           watermark: String = "10 minutes",
           windowLen: String = "10 minutes"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(tau > 0 && tau <= 1, "tau in (0, 1]")
    val rowsPerBand = numHashes / bands
    val (as, bs) = Dedup.hashCoeffs(numHashes, seed)
    // shingles + signature computed INLINE so the event time rides the
    // same projection — re-attaching it later would be a stream-stream
    // self-join (unbounded state); this is one map-side pass
    val arriving = stream
      .withWatermark(tsCol, watermark)
      .filter(col(idCol).isNotNull && col(textCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(tsCol).as("_ts"),
        TextAnalysis.tokens(lower(col(textCol))).as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("doc_id"), col("_ts"),
        TextAnalysis.shinglesFromToks(col("_toks"), n).as("shingles"))
      .withColumn("_xs",
        transform(col("shingles"), s => pmod(xxhash64(s), lit(1L << 31))))
      .withColumn("_sig",
        VectorExpressions.minhashSig(col("_xs"), as, bs, Dedup.MersennePrime))
    val banded = arriving.select(col("doc_id"), col("_ts"), col("shingles"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded
      .join(index, Seq("band", "bucket"))
      .withColumn("_inter",
        size(array_intersect(col("shingles"), col("corpus_shingles"))).cast("double"))
      .withColumn("jaccard", round(col("_inter") /
        (size(col("shingles")) + size(col("corpus_shingles")) - col("_inter")), 6))
      .filter(col("jaccard") >= tau)
      .groupBy(window(col("_ts"), windowLen), col("doc_id"), col("corpus_id"))
      .agg(max("jaccard").as("jaccard"))
      .select(col("doc_id"), col("corpus_id"), col("jaccard"))
  }
}
