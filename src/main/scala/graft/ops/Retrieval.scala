package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse independently-produced rankings
  * (lexical BM25, embedding kNN, ...) into one list. The standard tool
  * for retrieval-based data curation — "find corpus docs relevant to a
  * target domain" works best when a lexical ranker and a semantic
  * ranker vote together, and reciprocal rank fusion (Cormack et al.,
  * SIGIR'09) is the score-free way to combine them: it reads only the
  * RANKS, so the two lists' incomparable score scales never meet.
  */
object Retrieval {

  /** Reciprocal rank fusion over N rankings:
    * `score(d) = Σ_lists 1/(k + rank_list(d))`, here as exact integer
    * ppm — `floor(1e6 / (k + rank))` per list, summed as BIGINT — so
    * the fused ordering is engine-reproducible (no float summation
    * order to pin). `k = 60` is the published default; larger `k`
    * flattens the head. Docs absent from a list simply contribute
    * nothing (the classic formulation).
    *
    * Output: top `topN` of (doc_id, n_lists, rrf_ppm), ordered by
    * (rrf_ppm desc, doc_id).
    *
    * Scale posture: each ranking is already a top-list (bounded by its
    * own producer's cut), so this is a union of bounded frames → one
    * hash agg → `TakeOrderedAndProject`. No join at all — fusion by
    * union+agg scales with Σ|lists|, never the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k >= 0, "rrf k must be non-negative")
    require(topN >= 1, "topN must be positive")
    val contribs = rankings.map { r =>
      r.filter(col(idCol).isNotNull && col(rankCol).isNotNull)
        .select(col(idCol).cast("long").as("doc_id"),
          expr(s"1000000 div ($k + CAST(`$rankCol` AS BIGINT))").as("_c"))
    }
    contribs.reduce(_ unionAll _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lists"), sum(col("_c")).as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(topN)
  }

  /** Turn a scored result into a 1-based ranking by
    * (`scoreCol` desc, `idCol`) — the adapter between score-producing
    * operators ([[TextAnalysis.bm25]]) and [[rrfFuse]]. Rank on the
    * producer's ROUNDED score so the ordering is the one the producer's
    * own oracle pinned.
    *
    * The window is GLOBAL (single partition): only ever call this on an
    * already-cut top-list (bounded rows by construction), never on a
    * corpus-sized frame — ranking a corpus is the producer's job, with
    * its own partitioned/heap plan.
    */
  def rankByScore(scored: DataFrame, idCol: String, scoreCol: String): DataFrame =
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
}
