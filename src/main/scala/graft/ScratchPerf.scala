package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch bench: stage-by-stage probes for whichever query family is
  * under the profiler this round. Round 11: decompose q_semdedup_prod
  * (drifted 1.5 → 2.4 s between r9 and r10 with no code change to its
  * chain) — twin-corpus construction, banded pair generation, the edge
  * set, and the CC rounds — to find which stage owns the cost.
  */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-scratch")
    def mat(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(name: String)(fn: => DataFrame): Unit = {
      mat(fn) // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mat(fn); (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-28s ${times.sorted.apply(1)}%.2f s (median of 3)")
    }

    val e = TestTables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"))
    def corpus = {
      val twins = e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
      e.unionAll(twins)
    }

    t("corpus-scan")(corpus)
    t("pairs-banded-tau0.9")(
      graft.ops.Similarity.nearDupCosine(corpus, "vec_id", "embedding",
        tau = 0.9, nPlanes = 64, bandBits = 8))
    t("full-semdedup-prod")(
      graft.ops.Similarity.semDedupDrops(corpus, "vec_id", "embedding",
        tau = 0.9, nPlanes = 64, bandBits = 8))
    spark.stop()
  }
}
