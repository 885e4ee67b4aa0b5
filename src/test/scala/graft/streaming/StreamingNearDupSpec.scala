package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gate flags near-copies of corpus docs and passes novel docs") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "pack my box with five dozen liquor jugs before the long summer trip")
    ).toDF("doc_id", "text")
    val index = StreamingNearDup.corpusIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 64, bands = 16).cache()

    val mem = MemoryStream[InDoc]
    val q = StreamingNearDup.gate(
      mem.toDF(), index, "doc_id", "text", "ts",
      n = 3, tau = 0.5, numHashes = 64, bands = 16,
      watermark = "5 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      // one-word edit of corpus doc 100: high Jaccard, must flag
      InDoc(1L, "the quick brown fox jumps over the sleepy dog near the river bank today",
        ts("2024-06-25 08:00:00")),
      // novel text: must pass
      InDoc(2L, "completely unrelated sentence describing distributed query engines at scale",
        ts("2024-06-25 08:01:00")))
    q.processAllAvailable()
    mem.addData(InDoc(9L, "late heartbeat row advancing the watermark forward now",
      ts("2024-06-25 08:30:00")))
    q.processAllAvailable(); q.stop()

    val got = spark.table("neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // multi-band matches collapsed: exactly ONE row, for the near-copy
    assert(got.length == 1, s"want one flagged pair, got ${got.mkString(", ")}")
    val (docId, corpusId, jac) = got.head
    assert(docId == 1L && corpusId == 100L)
    assert(jac >= 0.5 && jac < 1.0, s"one-word edit similarity, got $jac")
    index.unpersist()
  }

  test("gate and batch pipeline agree on the flagged pair's jaccard") {
    implicit val sqlCtx = spark.sqlContext
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val editText   = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val corpus = Seq((7L, corpusText)).toDF("doc_id", "text")
    val both = Seq((7L, corpusText), (8L, editText)).toDF("doc_id", "text")
    val batchJac = graft.ops.Dedup.nearDupPairsMinHash(both, "doc_id", "text",
      n = 3, tau = 0.3).collect().head.getDouble(2)

    val index = StreamingNearDup.corpusIndex(corpus, "doc_id", "text", n = 3)
    val mem = MemoryStream[InDoc]
    val q = StreamingNearDup.gate(mem.toDF(), index, "doc_id", "text", "ts",
      n = 3, tau = 0.3, watermark = "5 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("neardup_parity")
      .outputMode(OutputMode.Append()).start()
    mem.addData(InDoc(8L, editText, ts("2024-06-25 09:00:00")))
    q.processAllAvailable()
    mem.addData(InDoc(99L, "watermark mover with totally different words here",
      ts("2024-06-25 09:30:00")))
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("neardup_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq == Seq((8L, 7L, batchJac)),
      "streamed exact-verify must equal the batch pipeline's jaccard")
  }
}
