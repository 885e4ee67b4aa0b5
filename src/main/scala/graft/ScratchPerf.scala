package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch bench: stage-by-stage probes for whichever query family is
  * under the profiler this round. Round 10: decompose q_chrf (the
  * mid-round bench's slowest entry at 21 s) — eval-pair construction,
  * join/strip projection, the char-gram kernel, and the score tree —
  * to find which stage owns the cost.
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
    val docs = TestTables.table(spark, sfDir, "documents")

    val refs = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(lower(col("text"))).as("ref"))
      .filter(size(col("ref")) >= 8)
    t("tokens-only")(refs)

    val barrier = refs.select(col("doc_id"), explode(array(col("ref"))).as("ref"))
    val cand = barrier.withColumn("cand", expr(
      """filter(transform(sequence(1, size(ref)),
        |  i -> CASE WHEN (i - 1) % 7 = 3 THEN CAST(NULL AS STRING)
        |            WHEN (i - 1) % 11 = 5 THEN reverse(ref[i - 1])
        |            ELSE ref[i - 1] END),
        |  x -> x IS NOT NULL)""".stripMargin))
    t("evalPairs(barrier)")(cand)

    val joined = cand.select(col("doc_id"),
      array_join(col("cand"), " ").as("cand"),
      array_join(col("ref"), " ").as("ref"))
    t("+array_join")(joined)

    val stripped = joined.select(col("doc_id"),
      regexp_replace(col("cand"), "\\s+", "").as("_cs"),
      regexp_replace(col("ref"), "\\s+", "").as("_rs"))
    t("+strip")(stripped)

    val kernel = stripped.select(col("doc_id"),
      explode(array(graft.functions.TextExpressions.clippedCharGramCounts(
        col("_cs"), col("_rs"), 6))).as("_st"))
    t("+kernel")(kernel)

    t("chrF(full)")(graft.ops.EvalMetrics.chrF(joined, "doc_id", "cand", "ref"))
    spark.stop()
  }
}
