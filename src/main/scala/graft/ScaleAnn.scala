package graft

import org.apache.spark.sql.functions._

/** Scale probe for the ANN-backed audit twins (r9): times
  * [[graft.ops.Similarity.labelNoiseApprox]] and
  * [[graft.ops.Similarity.bitextMineIvf]] in their APPROXIMATE regime
  * (nlist = nlist, nprobe = nprobe — an 8x candidate-volume reduction) against
  * the exact all-pairs baselines, and reports verdict agreement so the
  * recall trade is measured, not assumed.
  *
  * Usage: runMain graft.ScaleAnn <sfDir> [withExact]
  *   withExact: also run the exact baselines for wall-clock + agreement
  *   (quadratic — skip on the 10x corpus and cite the TimeQ numbers).
  */
object ScaleAnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val withExact = args.contains("withExact")
    val nlist = args.drop(1).filterNot(_ == "withExact").headOption.map(_.toInt).getOrElse(64)
    val nprobe = args.drop(1).filterNot(_ == "withExact").drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.get("graft-scale-ann")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val left = e.filter(col("vec_id") % 2 === 0)
    val right = e.filter(col("vec_id") % 2 === 1)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scaleann] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val approxNoise = timed(s"labelNoiseApprox($nlist,$nprobe)") {
      graft.ops.Similarity.labelNoiseApprox(
        e, "vec_id", "embedding", "label", k = 10, nlist = nlist, nprobe = nprobe)
        .select("vec_id", "is_suspect").collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    }
    println(s"[scaleann] labelNoiseApprox rows=${approxNoise.size} suspects=${approxNoise.count(_._2)}")

    val approxPairs = timed(s"bitextMineIvf($nlist,$nprobe)") {
      graft.ops.Similarity.bitextMineIvf(
        left, right, "vec_id", "embedding", k = 4, nlist = nlist, nprobe = nprobe)
        .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"[scaleann] bitextMineIvf pairs=${approxPairs.size}")

    if (withExact) {
      val exactNoise = timed("labelNoise(exact)") {
        graft.ops.Similarity.labelNoise(e, "vec_id", "embedding", "label", k = 10)
          .select("vec_id", "is_suspect").collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      }
      val agree = approxNoise.count { case (id, s) => exactNoise.get(id).contains(s) }
      println(s"[scaleann] labelNoise verdict agreement $agree/${exactNoise.size}")

      val exactPairs = timed("bitextMine(exact)") {
        graft.ops.Similarity.bitextMine(left, right, "vec_id", "embedding", k = 4)
          .select("left_id", "right_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall =
        if (exactPairs.isEmpty) 1.0
        else approxPairs.intersect(exactPairs).size.toDouble / exactPairs.size
      println(f"[scaleann] bitext pair recall $recall%.4f (${approxPairs.intersect(exactPairs).size}/${exactPairs.size})")
    }
    spark.stop()
  }
}
