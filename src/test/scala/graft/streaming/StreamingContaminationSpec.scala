package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

final case class InDoc(doc_id: Long, text: String, ts: Timestamp)

class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gate flags stream docs sharing >= minShared n-grams with the eval set") {
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")

    val mem = MemoryStream[InDoc]
    val q = StreamingContamination.gate(
      mem.toDF(), eval, "doc_id", "text", "ts", n = 4, minShared = 2,
      watermark = "5 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("contam")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      // contains "the quick brown fox" AND "quick brown fox jumps": 2+ shared 4-grams
      InDoc(1L, "intro text the quick brown fox jumps away", ts("2024-06-25 08:00:00")),
      // one shared 4-gram only ("five dozen liquor jugs"): below minShared
      InDoc(2L, "we bought five dozen liquor jugs yesterday evening", ts("2024-06-25 08:01:00")),
      // clean
      InDoc(3L, "completely unrelated sentence with different words", ts("2024-06-25 08:02:00")))
    q.processAllAvailable()
    // advance the watermark past the 08:00-08:05 window so append finalizes
    mem.addData(InDoc(9L, "late heartbeat row nothing shared", ts("2024-06-25 08:30:00")))
    q.processAllAvailable(); q.stop()

    val got = spark.table("contam")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got.map(_._1) shouldBe Set(1L)
    val hit = got.head
    hit._2 shouldBe 100L
    assert(hit._3 >= 2L)
  }
}
