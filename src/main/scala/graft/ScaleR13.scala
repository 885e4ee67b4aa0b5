package graft

import org.apache.spark.sql.functions._

/** Dev tool: round-13 scale probes.
  *
  * `runMain graft.ScaleR13 <dir> [nlist]` — times the IVF-routed
  * near-dup pair op ([[graft.ops.Similarity.nearDupIvf]]) over the
  * dir's embeddings at τ=0.9. The point of the probe: the banded
  * sign-LSH config (8×8) has a corpus-size-INDEPENDENT random-collision
  * rate, so at the fair-100× corpus (200k random-direction vectors +
  * 1% planted twins) its candidate volume is ~6·10⁸ and the verify
  * join fills the disk — while IVF cell routing with `nlist` scaled to
  * the corpus (keep n/nlist ≈ a few hundred) keeps Σ|cell|² bounded.
  * Run once at sf0.1 (nlist 16) and once at the fair-100× dir
  * (nlist ~1024); wall ratios go to PERF.md.
  */
object ScaleR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = if (args.length > 1) args(1) else "ivf"
    val knob = if (args.length > 2) args(2).toInt else (if (mode == "ivf") 16 else 4)
    val spark = GraftSession.get("graft-scale-r13")
    val emb = TestTables.table(spark, dir, "embeddings")
    def run(tag: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val pairs = df
      val n = pairs.count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      pairs.write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[scale-r13] $tag cold $cold%8.2f s  warm $warm%8.2f s  pairs $n%d")
    }
    mode match {
      case "ivf" =>
        run(s"nearDupIvf nlist=$knob", graft.ops.Similarity.nearDupIvf(
          emb, "vec_id", "embedding", tau = 0.9, nlist = knob, nprobe = 2,
          iters = 3, samplePerList = 4))
      case "e2lsh" =>
        // m (projPerTable) is the corpus-scale knob: random collisions
        // per table fall as (w/d)^m, so m grows with log(n)
        run(s"e2lshPairs m=$knob", graft.ops.Similarity.e2lshPairs(
          emb.select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("embedding")),
          "vec_id", "embedding", dim = 64, r = 0.1, projPerTable = knob))
    }
    spark.stop()
  }
}
