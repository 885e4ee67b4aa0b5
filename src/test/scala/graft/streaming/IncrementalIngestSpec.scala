package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Batch-parity proof for incremental ingest: a second run processes
  * ONLY files that arrived after the first (the reference's
  * processed-files-ledger contract).
  */
class IncrementalIngestSpec extends SparkSpec {

  private def writeCsv(path: String, rows: Seq[String]): Unit =
    Files.writeString(Paths.get(path),
      ("user_id,track_id,listen_time" +: rows).mkString("", "\n", "\n"))

  test("AvailableNow run drains current files; re-run picks up only new ones") {
    val base = tmpDir("incr")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    val staging = s"$base/staging"; val ckpt = s"$base/ckpt"

    writeCsv(s"$in/s1.csv", Seq(
      "u1,t1,2024-06-25 10:00:00",
      "u2,t2,2024-06-25 11:00:00",
      "u3,t3,not-a-time")) // corrupt row filtered by validation
    IncrementalIngest.runAvailableNow(spark, in, staging, ckpt)
    spark.read.parquet(staging).count() shouldBe 2

    // second run with NO new files: nothing is reprocessed
    IncrementalIngest.runAvailableNow(spark, in, staging, ckpt)
    spark.read.parquet(staging).count() shouldBe 2

    // drop a new file: only its rows append (s1.csv is not re-read)
    writeCsv(s"$in/s2.csv", Seq("u4,t4,2024-06-26 09:00:00"))
    IncrementalIngest.runAvailableNow(spark, in, staging, ckpt)
    val rows = spark.read.parquet(staging)
    rows.count() shouldBe 3
    import spark.implicits._
    rows.select("user_id").as[String].collect().toSet shouldBe Set("u1", "u2", "u4")
  }

  test("a fresh checkpoint reprocesses from scratch (ledger reset semantics)") {
    val base = tmpDir("incr2")
    val in = s"$base/in"; new java.io.File(in).mkdirs()
    writeCsv(s"$in/s1.csv", Seq("u1,t1,2024-06-25 10:00:00"))
    IncrementalIngest.runAvailableNow(spark, in, s"$base/stage1", s"$base/ck1")
    IncrementalIngest.runAvailableNow(spark, in, s"$base/stage2", s"$base/ck2")
    spark.read.parquet(s"$base/stage1").count() shouldBe 1
    spark.read.parquet(s"$base/stage2").count() shouldBe 1
  }
}
