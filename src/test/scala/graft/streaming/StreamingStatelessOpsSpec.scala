package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.{Bpe, Similarity, TextAnalysis}

final case class SDoc(doc_id: Long, text: String)
final case class SVec(vec_id: Long, embedding: Seq[Float])

/** The round-8 map-side operators — quality model, exact BPE counts,
  * fixed-centroid assignment — are STATELESS by construction (0 pinned
  * shuffles), so they must run unchanged on a stream with Append output
  * and no watermark, batch-identical per micro-batch. This spec pins
  * that contract: an ingest gate can score/tokenize/bucket documents in
  * the same expression the batch pipeline uses.
  */
class StreamingStatelessOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quality model + BPE counts gate a stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SDoc]
    val w = Seq.tabulate(16)(i => (i.toLong * 101L) % 2001L - 1000L)
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    def scored(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.linearQualityScore(df, "doc_id", "text", w, biasPpm = 0L)
        .join(Bpe.tokenCounts(df, "doc_id", "text", merges)
          .select(col("doc_id"), col("n_tokens").as("bpe_tokens")), "doc_id")
    val q = scored(mem.toDF())
      .writeStream.format("memory").queryName("sgate")
      .outputMode(OutputMode.Append()).start()
    val docs = Seq(SDoc(1L, "low lower newest"), SDoc(2L, "the quick brown fox"),
      SDoc(3L, ""))
    mem.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sgate").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batch = scored(docs.toDF()).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    streamed shouldBe batch
  }

  test("URL canonicalization gates a stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SDoc] // text column carries the URL
    def canon(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Web.canonicalize(df.withColumnRenamed("text", "url"), "url")
    val q = canon(mem.toDF())
      .writeStream.format("memory").queryName("scanon")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(SDoc(1L, "HTTP://WWW.A.com:80/x/?utm_source=s&b=1"),
      SDoc(2L, "https://cdn.b.org//p"), SDoc(3L, "junk"))
    mem.addData(rows: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("scanon").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batch = canon(rows.toDF()).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    streamed shouldBe batch
  }

  test("centroid assignment buckets a vector stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SVec]
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val q = Similarity.assignToCentroids(mem.toDF(), "vec_id", "embedding", cents)
      .writeStream.format("memory").queryName("sassign")
      .outputMode(OutputMode.Append()).start()
    val vecs = Seq(SVec(1L, Seq(2.0f, 0.1f)), SVec(2L, Seq(0.1f, 3.0f)),
      SVec(3L, Seq(-1.0f, -2.0f)))
    mem.addData(vecs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sassign").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = Similarity.assignToCentroids(vecs.toDF(), "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    streamed shouldBe batch
  }
}
