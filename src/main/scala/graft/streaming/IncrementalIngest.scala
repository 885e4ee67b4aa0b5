package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.{CsvSource, PathUtil}
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

  /** One incremental validation run: drain all currently-available new
    * files through clean-streams validation into an append-mode parquet
    * staging dir, then return. Blocking; returns the number of
    * micro-batches executed. Idempotent across re-runs via `checkpoint`.
    */
  def runAvailableNow(spark: SparkSession, inputDir: String, stagingDir: String,
                      checkpoint: String): Unit = {
    val cleaned = streamsSource(spark, inputDir)
      .filter(col(CsvSource.CorruptCol).isNull)
      .drop(CsvSource.CorruptCol)
      .transform(Validator.cleanStreams)
    val q = cleaned.writeStream
      .format("parquet")
      .option("path", PathUtil.cleanPath(stagingDir))
      .option("checkpointLocation", PathUtil.cleanPath(checkpoint))
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
