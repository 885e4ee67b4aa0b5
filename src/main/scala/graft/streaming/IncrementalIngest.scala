package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, element_at, input_file_name, split}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.{CsvSource, ParquetIO, PathUtil}
import graft.validate.Validator

/** Incremental file ingestion (S10) — the Spark-native replacement for
  * the reference's Airflow ledger polling
  * (`dags/music_streaming_pipeline.py:302-350,433-482`, which diffs an
  * S3 listing against `processed/processed_streams.json`).
  *
  * A Structured Streaming file source with a checkpoint IS that ledger:
  * the checkpoint's file log records every processed input file, a
  * second run discovers only new ones, and `Trigger.AvailableNow`
  * gives batch-job semantics (drain everything currently available,
  * then stop) — so re-runs are exactly the reference's "process only
  * new files" contract, with exactly-once file accounting handled by
  * the engine instead of hand-rolled JSON.
  *
  * At scale the source lists the input directory per trigger;
  * `maxFilesPerTrigger` bounds one micro-batch, and
  * `cleanSource`/archival (FsUtil.archive, S12) keeps the listing cost
  * flat as history accumulates.
  */
object IncrementalIngest {

  /** Open the streams CSV directory as an incremental source with the
    * validation job's schema + permissive corrupt capture (S1 semantics).
    */
  def streamsSource(spark: SparkSession, inputDir: String,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CsvSource.CorruptCol)
      .option("delimiter", ",")
      .option("quote", "\"")
      .option("escape", "\\")
      .option("multiLine", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("enableDateTimeParsingFallback", "false")
      .schema(StructType(graft.model.Schemas.streams.fields :+
        StructField(CsvSource.CorruptCol, StringType)))
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.csv(PathUtil.cleanPath(inputDir))
  }

  /** Parse a reference-style processed-files ledger
    * (`dags/music_streaming_pipeline.py:433-482`: one JSON object,
    * `{"<file key>": {"processed_at": ..., "status": "completed"}, ...}`)
    * and return the base file names recorded as completed. Base names,
    * not full keys: the ledger records S3 keys while a migrated deployment
    * reads from its own mount, so the name is the stable identity.
    */
  def readProcessedLedger(path: String): Set[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(PathUtil.cleanPath(path)))
    require(root.isObject, s"processed ledger at $path is not a JSON object")
    root.fields().asScala.collect {
      case e if Option(e.getValue.get("status")).forall(_.asText() == "completed") =>
        e.getKey.split('/').last
    }.toSet
  }

  /** One incremental validation run: drain all currently-available new
    * files through clean-streams validation into an append-mode parquet
    * staging dir, then return the number of micro-batches executed.
    * Idempotent across re-runs via `checkpoint`.
    *
    * Corrupt rows (S7): when `quarantineDir` is set, each micro-batch is
    * split — rows whose raw line failed the schema parse are appended as
    * JSON under `<quarantineDir>/corrupt_records/` with their source file
    * (`scripts/validate_data.py:121-129` semantics, same as the batch
    * `Validator` path); only clean rows reach staging.
    *
    * Ledger migration: `processedLedger` points at a reference-style
    * `processed_streams.json`; files it records as completed are excluded
    * from processing on the FIRST run (by base name, via
    * `input_file_name`), and the checkpoint owns accounting from then on.
    * One-time cost: the first run still lists (and scans) the ledgered
    * files to record them — their rows are filtered out before staging.
    * The skip set is a small driver-side literal (file names); a ledger
    * with millions of entries should be compacted into the checkpoint
    * offline instead.
    *
    * Exactly-once note: the `foreachBatch` split means a batch retried
    * after a partial staging write can duplicate rows (the single-sink
    * parquet file log's transactionality doesn't extend across two
    * sinks). Staged history is re-run-safe downstream via
    * [[graft.validate.Validator.dedupStreams]].
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, stagingDir: String,
                      checkpoint: String, quarantineDir: Option[String] = None,
                      processedLedger: Option[String] = None): Long = {
    val skip = processedLedger.map(readProcessedLedger).getOrElse(Set.empty)
    val source = {
      val src = streamsSource(spark, inputDir)
      if (skip.isEmpty) src
      else src.filter(!element_at(split(input_file_name(), "/"), -1)
        .isin(skip.toSeq: _*))
    }
    val staging = PathUtil.cleanPath(stagingDir)
    val batches = new AtomicLong(0)
    val q = source.writeStream
      .option("checkpointLocation", PathUtil.cleanPath(checkpoint))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches.incrementAndGet()
        // stamp provenance BEFORE the cache boundary — input_file_name()
        // evaluates to "" once rows are served from cached partitions
        val raw = batch.withColumn("_source_file", input_file_name())
          .persist() // one parse pass serves both branches
        try {
          quarantineDir.foreach { qd =>
            ParquetIO.quarantineJson(
              raw.filter(col(CsvSource.CorruptCol).isNotNull), qd)
          }
          val cleaned = raw.filter(col(CsvSource.CorruptCol).isNull)
            .drop(CsvSource.CorruptCol, "_source_file")
            .transform(Validator.cleanStreams)
          ParquetIO.writeAppend(cleaned, staging)
        } finally raw.unpersist()
      }
      .start()
    q.awaitTermination()
    batches.get()
  }
}
