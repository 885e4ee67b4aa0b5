package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 10) =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")

  // horizon = day 20 (u4's last). churned iff horizon - last > 7 days:
  //   u1 t=2 churned, u2 t=5 churned, u3 t=15 censored (gap 4),
  //   u4 t=20 censored (gap 0)
  private def log4 = Seq(
    (1L, ts(0)), (1L, ts(2)),
    (2L, ts(0)), (2L, ts(3)), (2L, ts(5)),
    (3L, ts(1)), (3L, ts(16)),
    (4L, ts(0)), (4L, ts(20))
  ).toDF("user_id", "ts")

  test("hand-computed risk sets, churn counts, and log-survival") {
    val got = Survival.kaplanMeier(log4, "user_id", "ts")
      .orderBy("t_days").collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(2L, 5L, 15L, 20L)
    got.map(_.getLong(1)).toSeq shouldBe Seq(4L, 3L, 2L, 1L) // n_risk
    got.map(_.getLong(2)).toSeq shouldBe Seq(1L, 1L, 0L, 0L) // d_churn
    got.map(_.getLong(3)).toSeq shouldBe Seq(1L, 1L, 1L, 1L) // n_end
    val ls = got.map(_.getDouble(4))
    ls(0) shouldBe math.log(0.75) +- 1e-12
    ls(1) shouldBe (math.log(0.75) + math.log(2.0 / 3.0)) +- 1e-12
    // censored-only durations leave survival unchanged (d = 0 adds ln 1)
    ls(2) shouldBe ls(1)
    ls(3) shouldBe ls(1)
    math.exp(ls(1)) shouldBe 0.5 +- 1e-12
  }

  test("terminal all-churn factor is masked to NULL, earlier rows kept") {
    // horizon from u3 (last day 20); u1 t=3 churn, u2 t=9 churn — u2's
    // duration is NOT max, so the mask only applies where d = n_risk
    val df = Seq(
      (1L, ts(0)), (1L, ts(3)),
      (2L, ts(0)), (2L, ts(9)),
      (3L, ts(20))
    ).toDF("user_id", "ts")
    val got = Survival.kaplanMeier(df, "user_id", "ts")
      .orderBy("t_days").collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(0L, 3L, 9L)
    // t=0 row is u3 (censored, at risk 3); t=9 has n_risk=1, d=1 -> NULL
    got(2).isNullAt(4) shouldBe true
    got(0).getDouble(4) shouldBe math.log(1.0) +- 1e-12
    got(1).getDouble(4) shouldBe math.log(0.5) +- 1e-12
  }

  test("censoring matters: naive churn fraction would differ") {
    // all four users end before horizon-7 except u4 -> without
    // censoring S(5) would be 1/4; KM keeps it at 1/2
    val s5 = Survival.kaplanMeier(log4, "user_id", "ts")
      .filter($"t_days" === 5L).collect()(0).getDouble(4)
    math.exp(s5) shouldBe 0.5 +- 1e-12
  }

  test("deterministic under repartitioning") {
    val big = (0 until 200).flatMap { u =>
      val last = (u * 7) % 25
      Seq((u.toLong, ts(0)), (u.toLong, ts(last)))
    }.toDF("user_id", "ts")
    val a = Survival.kaplanMeier(big, "user_id", "ts")
      .orderBy("t_days").collect().map(_.toSeq).toSeq
    val b = Survival.kaplanMeier(big.repartition(13), "user_id", "ts")
      .orderBy("t_days").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
