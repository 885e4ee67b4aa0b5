package graft.validate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{CsvSource, PathUtil}
import graft.model.Schemas

class ValidatorSpec extends SparkSpec {

  private val fixtures = "/root/repo/fixtures"

  test("processStreams unions files, drops corrupt and null rows") {
    val df = Validator.processStreams(spark,
      Seq(s"$fixtures/streams_a.csv", s"$fixtures/streams_b.csv"))
    df.columns.toSeq shouldBe Seq("user_id", "track_id", "listen_time")
    // streams_a: 40 valid reference rows; its 5 appended rows are all
    // corrupt or null-bearing. streams_b: 30 valid + 1 valid appended
    // (the date-only timestamp row is corrupt under strict parsing).
    df.count() shouldBe 71
    df.filter(col("user_id").isNull || col("track_id").isNull ||
      col("listen_time").isNull).count() shouldBe 0
  }

  test("readSplit quarantines exactly the malformed rows") {
    val (_, corrupt) =
      CsvSource.readSplit(spark, Schemas.streams, Seq(s"$fixtures/streams_a.csv"))
    // bad month/hour, non-timestamp, short arity — but NOT the rows that
    // parse fine with null fields (those are na.drop's job, not corrupt).
    corrupt.count() shouldBe 3
    val raws = corrupt.select(CsvSource.CorruptCol).collect().map(_.getString(0))
    raws.count(_.contains("TRKBAD")) shouldBe 2
    raws.count(_.contains("TRKSHORT")) shouldBe 1
  }

  test("quarantine sink appends corrupt rows as JSON") {
    val out = tmpDir("quarantine")
    Validator.processStreams(spark, Seq(s"$fixtures/streams_a.csv"), Some(out))
    val q = spark.read.json(s"$out/corrupt_records")
    q.count() shouldBe 3
  }

  test("validateColumns raises on missing columns, names them") {
    val df = spark.range(1).select(col("id").as("user_id"))
    val e = intercept[IllegalArgumentException] {
      Validator.validateColumns(df, Set("user_id", "track_id"), "ctx")
    }
    e.getMessage should include("track_id")
    e.getMessage should include("ctx")
    Validator.validateColumns(df, Set("user_id"), "ok") // no throw
  }

  test("processReferenceData dispatches songs vs users by columns") {
    val songs = Validator.processReferenceData(spark, s"$fixtures/songs.csv")
    songs.columns.length shouldBe 21
    songs.count() shouldBe 26
    val users = Validator.processReferenceData(spark, s"$fixtures/users.csv")
    users.columns.toSeq shouldBe Seq("user_id", "user_name", "user_age", "user_country", "created_at")
    // 30 valid + null-aged row survive; uncastable age and bad date rows are corrupt
    users.count() shouldBe 31
    users.filter(col("user_age").isNull).count() shouldBe 1
  }

  test("processReferenceData inference mode matches declared-schema rows") {
    val inferred = Validator.processReferenceData(spark, s"$fixtures/songs.csv", inferSchema = true)
    inferred.count() shouldBe 26
  }

  test("cleanStreams casts and rejects any-null rows") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("t1"), Some("2024-06-25 10:00:00")),
      (None,    Some("t2"), Some("2024-06-25 10:00:00")),
      (Some(3), None,       Some("2024-06-25 10:00:00")),
      (Some(4), Some("t4"), None)
    ).toDF("user_id", "track_id", "listen_time")
      .withColumn("listen_time", to_timestamp(col("listen_time")))
    val out = Validator.cleanStreams(df)
    out.count() shouldBe 1
    out.schema.map(_.dataType.typeName) shouldBe Seq("string", "string", "timestamp")
  }

  test("processStreamsBulk is row-identical to the per-file fold") {
    val perFile = Validator.processStreams(spark,
      Seq(s"$fixtures/streams_a.csv", s"$fixtures/streams_b.csv"))
      .collect().map(_.toSeq).toSet
    val bulk = Validator.processStreamsBulk(spark,
      Seq(s"$fixtures/streams_a.csv,$fixtures/streams_b.csv"))
      .collect().map(_.toSeq).toSet
    bulk shouldBe perFile

    val q = tmpDir("bulkq")
    Validator.processStreamsBulk(spark, Seq(s"$fixtures/streams_a.csv"), Some(q))
    val quarantined = spark.read.json(s"$q/corrupt_records")
    quarantined.count() shouldBe 3
    quarantined.columns should contain("_source_file")
  }

  test("processStreams: empty path list and missing-columns file both fail loudly") {
    intercept[IllegalArgumentException] {
      Validator.processStreams(spark, Seq.empty)
    }
    val dir = tmpDir("badcsv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.csv"),
      "only_one_column\nx\n")
    // declared streams schema maps the single header to user_id; the
    // validator's column check passes (schema is declared) but the rows
    // are null-padded and dropped — loud emptiness, not silent garbage
    val out = Validator.processStreams(spark, Seq(s"$dir/b.csv"))
    out.count() shouldBe 0
  }

  test("processReferenceData: unrecognized header fails the column check") {
    val dir = tmpDir("badref")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/r.csv"),
      "track_id,only\nx,y\n")
    val e = intercept[IllegalArgumentException] {
      Validator.processReferenceData(spark, s"$dir/r.csv")
    }
    e.getMessage should include("Missing required columns")
  }

  test("PathUtil cleans doubled slashes but preserves scheme") {
    PathUtil.cleanPath("s3://bucket//a///b/c") shouldBe "s3://bucket/a/b/c"
    PathUtil.cleanPath("/local//path") shouldBe "/local/path"
    PathUtil.splitPaths("a.csv, b.csv,,c//d.csv") shouldBe Seq("a.csv", "b.csv", "c/d.csv")
  }

  test("schemaDrift reports missing / added / type_changed columns") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val contract = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val batch = Seq((1, "a", "oops", true)).toDF("id", "name", "score", "extra")
    val drift = Validator.schemaDrift(batch, contract)
      .map(d => d.column -> (d.status, d.expected, d.actual)).toMap
    drift("id") shouldBe (("type_changed", "bigint", "int"))
    drift("score") shouldBe (("type_changed", "double", "string"))
    drift("extra") shouldBe (("added", "", "boolean"))
    drift.contains("name") shouldBe false // unchanged columns don't report

    val missing = Validator.schemaDrift(Seq((1L, 0.5)).toDF("id", "score"), contract)
    missing.map(d => (d.column, d.status)) shouldBe Seq(("name", "missing"))
  }

  test("requireCompatible: added columns pass by default, drift fails loudly") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val contract = StructType(Seq(StructField("id", LongType)))
    val withExtra = Seq((1L, "x")).toDF("id", "extra")
    noException should be thrownBy
      Validator.requireCompatible(withExtra, contract, "t")
    intercept[IllegalArgumentException] {
      Validator.requireCompatible(withExtra, contract, "t", allowAdded = false)
    }.getMessage should include ("extra added")
    intercept[IllegalArgumentException] {
      Validator.requireCompatible(Seq(1).toDF("id"), contract, "t")
    }.getMessage should include ("expected bigint, got int")
  }
}
