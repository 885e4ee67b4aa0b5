package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withSqlConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("same-key same-count bucketed join runs with ZERO shuffles") {
    val a = (1L to 1000L).map(i => (i, s"left_$i")).toDF("k", "la")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rb")
    Bucketing.writeBucketed(a, "bkt_a", "k", numBuckets = 8)
    Bucketing.writeBucketed(b, "bkt_b", "k", numBuckets = 8)
    try withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketing.colocatedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000L)
      assert(Bucketing.shuffleCount(joined) == 0,
        s"bucketed join must be exchange-free:\n${joined.queryExecution.executedPlan}")
      // and the same join WITHOUT bucketing shuffles both sides
      val plain = a.join(b, Seq("k"))
      plain.count()
      assert(Bucketing.shuffleCount(plain) == 2, "control: unbucketed join shuffles")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucketed groupBy on the bucket key aggregates without exchange") {
    val df = (1L to 500L).map(i => (i % 50, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bkt_g", "k", numBuckets = 4)
    try {
      val agg = spark.table("bkt_g").groupBy("k").agg(sum("v").as("s"))
      assert(agg.count() == 50)
      assert(Bucketing.shuffleCount(agg) == 0,
        s"bucketed agg must be exchange-free:\n${agg.queryExecution.executedPlan}")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_g")
  }

  test("mismatched bucket counts fall back to shuffling one side only") {
    val a = (1L to 200L).map(i => (i, i)).toDF("k", "va")
    val b = (1L to 200L).map(i => (i, i)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_m8", "k", numBuckets = 8)
    Bucketing.writeBucketed(b, "bkt_m4", "k", numBuckets = 4)
    try withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = Bucketing.colocatedJoin(spark, "bkt_m8", "bkt_m4", "k")
      joined.count()
      assert(Bucketing.shuffleCount(joined) == 1,
        "one side re-buckets, the other stays in place")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_m8")
      spark.sql("DROP TABLE IF EXISTS bkt_m4")
    }
  }
}
