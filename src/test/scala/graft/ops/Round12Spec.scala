package graft.ops

import graft.SparkSpec

/** Round-12 operator batch: PPS Poisson sampling. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  /** JVM re-derivation of the seeded inclusion uniform (the Privacy
    * family's md5 inverse-CDF tree).
    */
  private def u(id: Long, seed: Long = 7L): Double = {
    val key = s"$id\u0001$seed"
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(13)
    (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
  }

  test("ppsSample: pi = min(1, n*s/S), certainty units always enter, and " +
    "membership matches the seeded uniform exactly") {
    // sizes 1,1,2,4 -> S = 8; nTarget = 2 -> pi = .25,.25,.5,1.0
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 4L),
      (5L, 0L)).toDF("doc_id", "n_chars") // size 0: excluded, pi would be 0
    val got = Sampling.ppsSample(rows, "doc_id", "n_chars", nTarget = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    got.keySet should contain(4L)       // pi = 1.0: certainty unit
    got(4L) shouldBe ((4L, 1.0))
    (got.keySet should not).contain(5L) // zero mass never samples
    val pi = Map(1L -> 0.25, 2L -> 0.25, 3L -> 0.5)
    for ((id, p) <- pi) {
      if (u(id) < p) {
        got.keySet should contain(id)
        got(id)._2 shouldBe p
      } else (got.keySet should not).contain(id)
    }
  }

  test("ppsSample is reproducible and seed-sensitive") {
    val rows = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n_chars")
    val a = Sampling.ppsSample(rows, "doc_id", "n_chars", 40)
      .select("unit_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.ppsSample(rows, "doc_id", "n_chars", 40)
      .select("unit_id").collect().map(_.getLong(0)).toSet
    a shouldBe b // same seed: bit-reproducible
    val c = Sampling.ppsSample(rows, "doc_id", "n_chars", 40, seed = 8L)
      .select("unit_id").collect().map(_.getLong(0)).toSet
    (c should not).equal(a) // different seed: different draw
    // expected size ~ nTarget (Poisson sampling: E|sample| = sum of pi)
    a.size.toDouble shouldBe 40.0 +- 15.0
  }
}
