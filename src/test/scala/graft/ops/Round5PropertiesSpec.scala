package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style tests over ScalaCheck-generated corpora for the
  * round-5 operators (same offline-deterministic drawing technique as
  * `KpiPropertiesSpec`): invariants that must hold for EVERY input,
  * not just the hand-built fixtures.
  */
class Round5PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genRow = for {
    g <- Gen.oneOf("a", "b", "c")
    k <- Gen.choose(1, 500)
    v <- Gen.choose(-1000, 1000)
  } yield (g, k.toLong, v.toDouble / 10.0)

  private def corpus(seed: Long): List[(String, Long, Double)] =
    Gen.listOfN(120, genRow)(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val Seeds = Seq(11L, 22L, 33L)

  test("winsorize: output count preserved; clipped always within [lo-fence, hi-fence]") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("g", "id", "v")
        .groupBy("g", "id").agg(first("v").as("v")) // distinct ids per group
      val n = df.count()
      val w = Outliers.winsorize(df, "g", "id", "v", 0.1, 0.9)
      w.count() shouldBe n
      // every clipped value is an ACTUAL input value of its group
      val inputs = df.as[(String, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
      w.select("g", "clipped").as[(String, Double)].collect().foreach {
        case (g, c) => inputs(g) should contain(c)
      }
    }
  }

  test("capPerGroup: never exceeds the cap and is idempotent") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("g", "id", "v")
        .groupBy("g", "id").agg(count(lit(1)).as("_n")).drop("_n")
      val capped = Sampling.capPerGroup(df, "g", "id", 7)
      capped.groupBy("g").count().as[(String, Long)].collect()
        .foreach { case (_, n) => n should be <= 7L }
      // applying the cap again changes nothing (survivors re-rank identically)
      Sampling.capPerGroup(capped, "g", "id", 7)
        .orderBy("g", "id").collect() shouldBe capped.orderBy("g", "id").collect()
    }
  }

  test("balanceClasses: every class ends at exactly the min class size") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("g", "id", "v")
        .groupBy("g", "id").agg(count(lit(1)).as("_n")).drop("_n")
      val minN = df.groupBy("g").count().agg(min("count")).as[Long].head()
      val sizes = Sampling.balanceClasses(df, "g", "id")
        .groupBy("g").count().select("count").as[Long].collect()
      sizes.foreach(_ shouldBe minN)
    }
  }

  test("snapshotDiff: diff(a, a) is empty; diff respects merge round-trip") {
    Seeds.foreach { s =>
      val base = corpus(s).toDF("g", "id", "v")
        .groupBy("id").agg(first("g").as("g"), first("v").as("v"))
      Cdc.snapshotDiff(base, base, "id").count() shouldBe 0L
      // apply a derived changeset, then diff must report exactly its keys
      val changes = base.filter(col("id") % 3 === 0)
        .withColumn("v", col("v") + 1.0).withColumn("op", lit("U"))
      val merged = Cdc.mergeUpsert(base, changes, "id")
      val diff = Cdc.snapshotDiff(base, merged, "id")
      diff.select("change_type").distinct().as[String].collect().toSet shouldBe
        (if (diff.isEmpty) Set.empty[String] else Set("changed"))
      diff.select("id").as[Long].collect().toSet shouldBe
        changes.select("id").as[Long].collect().toSet
    }
  }

  test("heavyHitters equals the plain group-by answer on any corpus") {
    Seeds.foreach { s =>
      val df = corpus(s).map(_._1).toDF("v") // 3 values over 120 rows
      val expected = df.groupBy("v").count()
        .filter(col("count") > 120 * 0.25)
        .as[(String, Long)].collect().toMap
      val got = Frequency.heavyHitters(df, "v", 0.25)
        .select("value", "n_rows").as[(String, Long)].collect().toMap
      got shouldBe expected
    }
  }

  test("segmented (PassJoin) edit-distance pairs == bucket-join pairs on mutated corpora") {
    val alphabet = "abcdef"
    val genBase = for {
      len <- Gen.choose(1, 14) // includes strings SHORTER than maxDist+1
      cs <- Gen.listOfN(len, Gen.oneOf(alphabet.toSeq))
    } yield cs.mkString
    def mutate(s: String, seed: Int): String = {
      // deterministic 1-2 edits: substitution + optional insertion
      val sb = new StringBuilder(s)
      if (sb.nonEmpty) sb.setCharAt(seed % sb.length, alphabet(seed % alphabet.length))
      if (seed % 2 == 0) sb.insert(seed % (sb.length + 1), alphabet((seed / 2) % alphabet.length))
      sb.toString
    }
    Seq(7L, 19L).foreach { s =>
      val bases = Gen.listOfN(40, genBase)(Gen.Parameters.default, Seed(s))
        .getOrElse(sys.error("gen failed"))
      val rows = bases.zipWithIndex.flatMap { case (b, i) =>
        Seq((2L * i, b, s"blk${i % 3}"), (2L * i + 1, mutate(b, i), s"blk${i % 3}"))
      }
      val df = rows.toDF("id", "t", "blk")
      Seq(1, 2).foreach { tau =>
        val bucket = Dedup.editDistancePairs(df, "id", "t", "blk", tau)
          .as[(Long, Long, Long)].collect().toSet
        val seg = Dedup.editDistancePairsSegmented(df, "id", "t", "blk", tau)
          .as[(Long, Long, Long)].collect().toSet
        withClue(s"seed=$s tau=$tau: ") { seg shouldBe bucket }
      }
    }
  }

  test("latestPerKey: exactly one row per key, and it is the max (ts, tie)") {
    Seeds.foreach { s =>
      val df = corpus(s).zipWithIndex.map { case ((g, k, v), i) =>
        (k % 20, java.sql.Timestamp.valueOf(f"2024-01-${1 + (k % 25)}%02d 10:00:00"), i.toLong, v)
      }.toDF("k", "t", "id", "v")
      val latest = Cdc.latestPerKey(df, "k", "t", "id")
      val perKey = latest.groupBy("k").count().select("count").as[Long].collect()
      perKey.foreach(_ shouldBe 1L)
      val expect = df.as[(Long, java.sql.Timestamp, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(r => (r._2.getTime, r._3))._3).toMap
      latest.select("k", "id").as[(Long, Long)].collect().toMap shouldBe expect
    }
  }
}
