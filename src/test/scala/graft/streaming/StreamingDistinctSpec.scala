package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Sketch

final case class KV(k: String, v: String)

class StreamingDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def latest(tableName: String): Map[String, Long] =
    spark.table(tableName).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("running distinct is exact below k and survives batches + dups") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KV]
    val q = StreamingDistinct.runningDistinct(mem.toDF(), "k", "v", k = 64)
      .writeStream.format("memory").queryName("sdist")
      .outputMode(OutputMode.Update()).start()
    mem.addData(KV("a", "u1"), KV("a", "u2"), KV("a", "u1"), KV("b", "u1"))
    q.processAllAvailable()
    latest("sdist") shouldBe Map("a" -> 2L, "b" -> 1L)
    // second trigger: one repeat + two new for a, key b untouched
    mem.addData(KV("a", "u2"), KV("a", "u3"), KV("a", "u4"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sdist").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.filter(_._1 == "a").map(_._2).max shouldBe 4L // running, not per-batch
  }

  test("stream state equals the batch KMV over the union, any batching") {
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 500).map(i => KV(if (i % 2 == 0) "x" else "y", s"val$i"))
    val mem = MemoryStream[KV]
    val q = StreamingDistinct.runningDistinct(mem.toDF(), "k", "v", k = 32)
      .writeStream.format("memory").queryName("sdist_eq")
      .outputMode(OutputMode.Update()).start()
    // feed in three uneven chunks to force cross-trigger folds
    mem.addData(all.take(17): _*); q.processAllAvailable()
    mem.addData(all.slice(17, 301): _*); q.processAllAvailable()
    mem.addData(all.drop(301): _*); q.processAllAvailable(); q.stop()
    // estimates only grow as the sketch fills, so the final state per
    // key is the max across update rows (memory-sink order is not
    // contractual)
    val streamed = spark.table("sdist_eq").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val batch = Sketch.kmvDistinct(all.toDF("g", "v"), "g", "v", k = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed("x") shouldBe batch("x")
    streamed("y") shouldBe batch("y")
  }

  test("hash52 is bit-identical to the Column-side kmvHash") {
    import org.apache.spark.sql.functions._
    val vals = Seq("a", "hello world", "12345", "", "ünïcode")
    val colSide = vals.toDF("v")
      .select(Sketch.kmvHash(col("v")).as("h")).as[Long].collect()
    vals.map(StreamingDistinct.hash52) shouldBe colSide.toSeq
  }
}
