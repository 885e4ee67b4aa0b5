package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ParquetIO
import graft.ops.{Sampling, TextAnalysis, Web}

/** The batch crawl-curation chain packaged as a runnable job — the
  * web-corpus counterpart of [[PipelineJob]] (the reference ships its
  * pipelines as entry-point scripts, `scripts/compute_kpis.py:318-370`;
  * this is the engine's training-data equivalent). The chain is the one
  * `CurationPipelineSpec` proves stage-by-stage:
  *
  *   parseHttp → (200 ∧ text/html) → stripHtml → canonicalize →
  *   URL-dedup (1 per url_canon) → domain blocklist →
  *   exact text-dedup (fingerprint) → quality floor →
  *   temperatureMix budget by domain → shardManifest
  *
  * Job semantics (the [[PipelineJob]] disciplines):
  *   - per-stage survivor counts ride the ONE write action via stacked
  *     `observe()` nodes — no per-stage `count()` passes over the corpus;
  *   - the curated docs are written once, then the manifest derives from
  *     the written parquet (idempotent re-run: a crash between the two
  *     writes re-reads the surviving docs instead of recomputing the
  *     chain);
  *   - every selection step is hash-order-based, so the output is
  *     deterministic row-for-row under any input partitioning
  *     (`CurationJobSpec` re-runs the job on repartitioned input).
  *
  * Scale posture: all gates up to the text-dedup are map-side or
  * one-window-per-group ops; the mix is a per-source agg + one rank
  * window; the manifest is `shards`-way-parallel position windows. No
  * driver-side loops, no collects — identical plan at 100 TB.
  */
object CurationJob {

  final case class Config(
      fetchesPath: String,                  // parquet: (doc_id, url, raw)
      outputDir: String,                    // writes docs/ + manifest/
      blocklistPath: Option[String] = None, // parquet with a `domain` column
      budget: Long = 1000000L,              // temperature-mix token budget (rows)
      qualityFloorTokens: Int = 20,         // min tokens to keep a page
      alphaQuarters: Int = 2,               // mix temperature α = quarters/4
      shards: Int = 64)

  final case class Result(stageCounts: Map[String, Long], manifestRows: Long)

  /** The chain as a library function: fetched pages in, curated corpus
    * out, with an `observe()` node per stage so one downstream action
    * yields every stage's survivor count.
    */
  def curate(fetches: DataFrame, blocklist: DataFrame, cfg: Config,
             observations: scala.collection.mutable.Map[String, Observation])
  : DataFrame = {
    def staged(name: String)(df: DataFrame): DataFrame = {
      val o = new Observation(s"curation_$name")
      observations += name -> o
      df.observe(o, count(lit(1)).as("rows"))
    }
    val parsed = staged("parsed") {
      Web.parseHttp(fetches, "raw")
        .filter(col("status_code") === 200 && col("content_type") === "text/html")
    }
    val stripped = parsed.withColumn("text", TextAnalysis.stripHtml(col("body")))
    val canon = staged("canonical") {
      Sampling.capPerGroup(Web.canonicalize(stripped, "url"), "url_canon", "doc_id", 1)
    }
    val unblocked = staged("unblocked") {
      Web.filterBlockedDomains(canon, "url", "doc_id", blocklist, "domain")
    }
    val deduped = staged("text_deduped") {
      Sampling.capPerGroup(
        unblocked.withColumn("_fp", md5(TextAnalysis.normalizeText(col("text")))),
        "_fp", "doc_id", 1).drop("_fp")
    }
    val quality = staged("quality") {
      deduped.filter(TextAnalysis.tokenCount(col("text")) >= cfg.qualityFloorTokens)
    }
    staged("mixed") {
      Sampling.temperatureMix(quality, "domain", "doc_id",
        cfg.budget, cfg.alphaQuarters)
    }
  }

  def run(spark: SparkSession, cfg: Config): Result = {
    val fetches = ParquetIO.read(spark, cfg.fetchesPath)
    val blocklist = cfg.blocklistPath match {
      case Some(p) => ParquetIO.read(spark, p).select(col("domain"))
      case None =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("domain",
              org.apache.spark.sql.types.StringType))))
    }
    val obs = scala.collection.mutable.LinkedHashMap.empty[String, Observation]
    val curated = curate(fetches, blocklist, cfg, obs)
      .select("doc_id", "url", "url_canon", "domain", "text")

    // ONE action writes the corpus and fills every stage observation.
    ParquetIO.writeOverwrite(curated, s"${cfg.outputDir}/docs")
    val counts = obs.map { case (name, o) =>
      name -> o.get("rows").asInstanceOf[Long]
    }.toMap

    // Manifest derives from the WRITTEN parquet (idempotence: a re-run
    // after a crash between the writes re-reads, never recomputes).
    val docs = ParquetIO.read(spark, s"${cfg.outputDir}/docs")
    require(PipelineJob.outputNonEmpty(docs),
      s"curated corpus at ${cfg.outputDir}/docs is empty")
    val mObs = new Observation("curation_manifest")
    ParquetIO.writeOverwrite(
      Sampling.shardManifest(docs.select("doc_id"), "doc_id", cfg.shards)
        .select("doc_id", "shard", "pos")
        .observe(mObs, count(lit(1)).as("rows")),
      s"${cfg.outputDir}/manifest")
    Result(counts, mObs.get("rows").asInstanceOf[Long])
  }

  /** CLI: `CurationJob <fetchesParquet> <outputDir> [--blocklist p]
    * [--budget n] [--floor n] [--alpha-quarters n] [--shards n]`.
    * Prints one JSON summary line (the [[graft.Bench]] stdout contract).
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: CurationJob <fetchesParquet> <outputDir> [--blocklist p] " +
        "[--budget n] [--floor n] [--alpha-quarters n] [--shards n]")
    var cfg = Config(fetchesPath = args(0), outputDir = args(1))
    var i = 2
    while (i < args.length) {
      args(i) match {
        case "--blocklist" => cfg = cfg.copy(blocklistPath = Some(args(i + 1)))
        case "--budget" => cfg = cfg.copy(budget = args(i + 1).toLong)
        case "--floor" => cfg = cfg.copy(qualityFloorTokens = args(i + 1).toInt)
        case "--alpha-quarters" => cfg = cfg.copy(alphaQuarters = args(i + 1).toInt)
        case "--shards" => cfg = cfg.copy(shards = args(i + 1).toInt)
        case other => throw new IllegalArgumentException(s"unknown flag $other")
      }
      i += 2
    }
    val spark = graft.GraftSession.get("graft-curation")
    try {
      val r = run(spark, cfg)
      val stages = r.stageCounts.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      println(s"""{"job":"curation","stages":$stages,"manifest_rows":${r.manifestRows},"out":"${cfg.outputDir}"}""")
    } finally spark.stop()
  }
}
