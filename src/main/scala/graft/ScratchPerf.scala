package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch bench: stage-by-stage probes for whichever query family is
  * under the profiler this round. Round 9: decompose the df-bounded
  * dedup/containment candidate path (the r8 bench's two slowest entries)
  * into shingling / df-agg / pairing / verify stages, and compare the
  * posting self-join pairing against the posting-list-collapse tier.
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
    val d = {
      val n = docs.filter(col("doc_id").isNotNull && col("text").isNotNull).count()
      math.max(5L, n / 100L).toInt
    }
    println(s"[scratch] relMaxDf bound d = $d")

    val sets = graft.ops.Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    val posting = sets.select(col("doc_id"), explode(col("shingles")).as("sh"))
    t("shingle+explode")(posting)
    val dfAgg = posting.groupBy("sh").agg(count(lit(1)).as("df"))
    t("df-agg")(dfAgg)
    val keep = dfAgg.filter(col("df") <= d).select("sh")
    val bounded = posting.join(keep, "sh")
    t("bounded-postings")(bounded)

    // old pairing: posting self-join + distinct
    t("pairs:selfjoin") {
      val a = bounded.select(col("sh"), col("doc_id").as("a_id"))
      val b = bounded.select(col("sh"), col("doc_id").as("b_id"))
      a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
    }
    // new pairing: collapse identical posting lists, explode pairs
    t("pairs:collapse") {
      val lists = bounded.groupBy("sh")
        .agg(sort_array(collect_list(col("doc_id"))).as("_docs"))
        .filter(size(col("_docs")) >= 2)
        .select("_docs").distinct()
      lists.select(explode(col("_docs")).as("a_id"), col("_docs"))
        .select(col("a_id"),
          explode(filter(col("_docs"), b => b > col("a_id"))).as("b_id"))
        .distinct()
    }
    // stats: gram/list duplication factor and candidate volume
    val lists = bounded.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("_docs"))
      .filter(size(col("_docs")) >= 2).cache()
    val nGrams = lists.count()
    val nLists = lists.select("_docs").distinct().count()
    val pairVolGram = lists.select(sum(expr("cast(size(_docs) as bigint) * (size(_docs) - 1) div 2"))).head.getLong(0)
    val distinctLists = lists.select("_docs").distinct()
    val pairVolList = distinctLists.select(sum(expr("cast(size(_docs) as bigint) * (size(_docs) - 1) div 2"))).head.getLong(0)
    val cands = distinctLists.select(explode(col("_docs")).as("a_id"), col("_docs"))
      .select(col("a_id"), explode(filter(col("_docs"), b => b > col("a_id"))).as("b_id"))
      .distinct()
    val nCands = cands.cache().count()
    println(s"[scratch] grams(df in [2,$d])=$nGrams distinctLists=$nLists " +
      s"pairVol(gram)=$pairVolGram pairVol(list)=$pairVolList distinctCands=$nCands")

    // verify stage cost on the candidate set
    t("verify:exact-jaccard")(
      graft.ops.Dedup.verifyExactJaccard(cands, sets, 0.5))
    spark.stop()
  }
}
