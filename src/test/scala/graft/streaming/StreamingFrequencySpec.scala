package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingFrequencySpec extends SparkSpec {
  import spark.implicits._

  /** Latest emission per (shard, value): count_lb only grows, so the
    * final state row is the max (memory-sink order is not contractual).
    */
  private def latest(tableName: String): Map[String, Long] =
    spark.table(tableName).collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).max }

  test("a heavy value survives every trigger with a near-exact lower bound") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingFrequency.runningHeavyHitters(mem.toDF(), "value",
        k = 8, nShards = 4)
      .writeStream.format("memory").queryName("shh")
      .outputMode(OutputMode.Update()).start()
    // 60 occurrences of "hot" interleaved with 40 singletons, split
    // across triggers — "hot"'s shard sees n_shard ≤ 100, so its MG
    // undercount is ≤ n_shard/(k+1) ≤ 12
    val batch1 = (1 to 30).flatMap(i => Seq("hot", s"cold$i"))
    val batch2 = (31 to 40).flatMap(i => Seq("hot", "hot", "hot", s"cold$i"))
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable(); q.stop()
    val got = latest("shh")
    got.keySet should contain("hot")
    val lb = got("hot")
    lb should be <= 60L          // MG only ever undercounts
    lb should be >= (60L - 12L)  // ...and by at most n_shard/(k+1)
  }

  test("count_lb never exceeds a value's true count") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingFrequency.runningHeavyHitters(mem.toDF(), "value",
        k = 4, nShards = 2)
      .writeStream.format("memory").queryName("shh_ub")
      .outputMode(OutputMode.Update()).start()
    val truth = (1 to 200).map(i => s"v${i % 13}")
    mem.addData(truth.take(90): _*); q.processAllAvailable()
    mem.addData(truth.drop(90): _*); q.processAllAvailable(); q.stop()
    val trueCounts = truth.groupBy(identity).view.mapValues(_.size.toLong).toMap
    latest("shh_ub").foreach { case (v, lb) =>
      lb should be <= trueCounts(v)
    }
  }

  test("sharding: every value reports from exactly one shard, counts sum per shard") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingFrequency.runningHeavyHitters(mem.toDF(), "value",
        k = 32, nShards = 4)
      .writeStream.format("memory").queryName("shh_shard")
      .outputMode(OutputMode.Update()).start()
    mem.addData((1 to 100).map(i => s"t${i % 10}"): _*)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("shh_shard").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // one shard per value — the routing invariant behind the guarantee
    rows.groupBy(_._2).foreach { case (_, rs) =>
      rs.map(_._1).distinct should have size 1
    }
    // k=32 > 10 distinct values: MG never evicts, counts are exact and
    // each shard's candidates sum to the rows it has seen
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._3).sum shouldBe rs.head._4
    }
    rows.map(_._3).sum shouldBe 100L
  }

  test("runningCountMinCells converge to the batch sketch exactly (mergeable cells)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = StreamingFrequency.runningCountMinCells(mem.toDF(), "value",
        depth = 3, width = 8)
      .writeStream.format("memory").queryName("scm")
      .outputMode(OutputMode.Update()).start()
    val data = (1 to 120).map(i => s"k${i % 9}")
    mem.addData(data.take(50): _*); q.processAllAvailable()
    mem.addData(data.drop(50): _*); q.processAllAvailable(); q.stop()
    // latest emission per cell (counts only grow across triggers)
    val streamed = spark.table("scm").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).max }
    // the batch twin over the SAME full input: cells must match exactly
    val batch = StreamingFrequency.runningCountMinCells(
      data.toDF("value"), "value", depth = 3, width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    streamed shouldBe batch
    // and the min-over-rows estimate upper-bounds every true count
    val trueCounts = data.groupBy(identity).view.mapValues(_.size.toLong)
    trueCounts.foreach { case (k, n) =>
      val est = (0 until 3).map { r =>
        val b = data.toDF("value").sparkSession.range(1).select(
          graft.ops.Sampling.hashBucket(
            org.apache.spark.sql.functions.concat_ws(":",
              org.apache.spark.sql.functions.lit(r),
              org.apache.spark.sql.functions.lit(k)), 8).as("b"))
          .collect().head.getLong(0)
        batch((r, b))
      }.min
      est should be >= n
    }
  }
}
