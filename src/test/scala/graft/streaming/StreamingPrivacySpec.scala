package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class PiiRow(city: String, age_band: String, person_id: Long)

class StreamingPrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityGate withholds sub-k cohorts, flushes at k, then passes through") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(), Seq("city", "age_band"), k = 3)
      .writeStream.format("memory").queryName("kanon")
      .outputMode(OutputMode.Append()).start()

    def released(): Set[Long] = spark.table("kanon")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

    // batch 1: NYC cohort has only 2 members -> everything withheld
    mem.addData(PiiRow("NYC", "20s", 1L), PiiRow("NYC", "20s", 2L),
      PiiRow("LAX", "40s", 9L))
    q.processAllAvailable()
    released() shouldBe Set.empty

    // batch 2: third NYC member arrives -> the whole buffered cohort flushes
    mem.addData(PiiRow("NYC", "20s", 3L))
    q.processAllAvailable()
    released() shouldBe Set(1L, 2L, 3L)

    // batch 3: released cohorts pass straight through; LAX stays withheld
    mem.addData(PiiRow("NYC", "20s", 4L), PiiRow("LAX", "40s", 10L))
    q.processAllAvailable()
    released() shouldBe Set(1L, 2L, 3L, 4L)
    q.stop()

    // convergence: the stream's released set equals the batch audit's
    // safe-cohort rows over the same data
    val all = Seq(
      PiiRow("NYC", "20s", 1L), PiiRow("NYC", "20s", 2L), PiiRow("LAX", "40s", 9L),
      PiiRow("NYC", "20s", 3L), PiiRow("NYC", "20s", 4L), PiiRow("LAX", "40s", 10L)
    ).toDF()
    val safe = graft.ops.Privacy.kAnonymity(all, Seq("city", "age_band"), k = 3)
      .filter(!col("at_risk")).select("city", "age_band")
    val batchKept = all.join(safe, Seq("city", "age_band"), "left_semi")
      .select("person_id").collect().map(_.getLong(0)).toSet
    batchKept shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("kAnonymityGate: distinct cohorts never merge via separator or null tricks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PiiRow]
    val q = StreamingPrivacy.kAnonymityGate(mem.toDF(), Seq("city", "age_band"), k = 2)
      .writeStream.format("memory").queryName("kanon2")
      .outputMode(OutputMode.Append()).start()
    // ("ab","c") vs ("a","bc") and null vs literal-null string: four
    // DISTINCT singleton cohorts -> nothing may release
    mem.addData(PiiRow("ab", "c", 1L), PiiRow("a", "bc", 2L),
      PiiRow(null, "x", 3L), PiiRow("null", "x", 4L))
    q.processAllAvailable()
    spark.table("kanon2").count() shouldBe 0L
    // a true twin arrives for the null cohort only
    mem.addData(PiiRow(null, "x", 5L))
    q.processAllAvailable()
    val got = spark.table("kanon2")
      .select(get_json_object(col("payload"), "$.person_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    got shouldBe Set(3L, 5L)
    q.stop()
  }
}
