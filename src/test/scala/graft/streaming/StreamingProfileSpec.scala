package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ops.Profile

final case class KD(k: String, v: Option[Double])

class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  /** Final state per key: counts only grow, so take the row with the
    * max n_rows per key (memory-sink order is not contractual).
    */
  private def latest(tableName: String) =
    spark.table(tableName).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.maxBy(_.getLong(1)) }

  test("running stats across triggers equal the batch profile over the union") {
    implicit val sqlCtx = spark.sqlContext
    // 300 distinct values per key > k=32: the estimator path must agree
    // with the batch sketch, not just the exact regime
    val all = (1 to 600).map { i =>
      KD(if (i % 2 == 0) "x" else "y", Some((i / 2).toDouble * 3))
    }
    val mem = MemoryStream[KD]
    val q = StreamingProfile.runningColStats(mem.toDF(), "k", "v", k = 32)
      .writeStream.format("memory").queryName("sprof")
      .outputMode(OutputMode.Update()).start()
    mem.addData(all.take(101): _*); q.processAllAvailable()
    mem.addData(all.slice(101, 487): _*); q.processAllAvailable()
    mem.addData(all.drop(487): _*); q.processAllAvailable(); q.stop()
    val got = latest("sprof")
    for (key <- Seq("x", "y")) {
      val batch = Profile.finishColStats(
        Profile.colStatsState(
          all.filter(_.k == key).toDF("k", "v").select($"v"), "v", k = 32),
        k = 32).collect().head
      val s = got(key)
      s.getLong(1) shouldBe batch.getAs[Long]("n_rows")
      s.getLong(2) shouldBe batch.getAs[Long]("n_nonnull")
      s.getLong(3) shouldBe batch.getAs[Long]("est_distinct")
      s.getDouble(4) shouldBe batch.getAs[Double]("min_value")
      s.getDouble(5) shouldBe batch.getAs[Double]("max_value")
    }
  }

  test("null values count rows but never touch min/max/sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KD]
    val q = StreamingProfile.runningColStats(mem.toDF(), "k", "v", k = 8)
      .writeStream.format("memory").queryName("sprof_null")
      .outputMode(OutputMode.Update()).start()
    mem.addData(KD("a", None), KD("a", Some(5.0)), KD("a", None), KD("b", None))
    q.processAllAvailable(); q.stop()
    val got = latest("sprof_null")
    val a = got("a")
    (a.getLong(1), a.getLong(2), a.getLong(3), a.getDouble(4), a.getDouble(5)) shouldBe
      ((3L, 1L, 1L, 5.0, 5.0))
    val b = got("b")
    (b.getLong(1), b.getLong(2)) shouldBe ((1L, 0L))
    b.isNullAt(3) shouldBe true
    b.isNullAt(4) shouldBe true
  }
}
