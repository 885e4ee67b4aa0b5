package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Newline-delimited JSON (JSONL) source — the lingua franca of LLM
  * training corpora (one document object per line). Mirrors
  * [[CsvSource]]'s contract on a different wire format: declared
  * schema, PERMISSIVE parse with `_corrupt_record` capture, and a
  * cached one-pass clean/corrupt split so quarantine never re-reads.
  *
  * Parse semantics (engine-checkable): a line is CORRUPT iff it is not
  * a well-formed JSON object or a present field cannot convert to its
  * declared type; a MISSING field is simply null (schema evolution
  * tolerance — corpora grow fields over time), and EXTRA fields are
  * ignored (projection by schema). Single-line mode only: a JSONL
  * corpus is splittable at newlines, which is what makes a 100 TB
  * corpus scan embarrassingly parallel — multiLine JSON is not, so it
  * is deliberately unsupported here.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Raw permissive read: user schema + trailing corrupt-record column. */
  def readPermissive(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      // defaults locked down for determinism across engines: no NaN
      // tokens, no single quotes, no unquoted field names
      .option("allowNonNumericNumbers", "false")
      .option("allowSingleQuotes", "false")
      .option("allowUnquotedFieldNames", "false")
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .json(paths.map(PathUtil.cleanPath): _*)

  /** One cached parse pass split into (clean rows, corrupt rows) — the
    * same discipline as [[CsvSource.readSplit]]: Spark materializes
    * `_corrupt_record` only when it is part of the read schema, and a
    * query referencing ONLY that column on an uncached frame is
    * rejected, so both sides must be served from one cached parse.
    */
  def readSplit(spark: SparkSession, schema: StructType, paths: Seq[String]): (DataFrame, DataFrame) = {
    val raw = readPermissive(spark, schema, paths).cache()
    val corrupt = raw.filter(col(CorruptCol).isNotNull)
    val clean   = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    (clean, corrupt)
  }
}
