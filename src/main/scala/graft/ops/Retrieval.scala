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
      // null-filter AFTER the long cast: a non-numeric id casts to null,
      // and filtering before the cast would quietly merge every such row
      // into one doc_id=null mega-group instead of dropping it
      r.select(col(idCol).cast("long").as("doc_id"),
          expr(s"1000000 div ($k + CAST(`$rankCol` AS BIGINT))").as("_c"))
        .filter(col("doc_id").isNotNull && col("_c").isNotNull)
    }
    contribs.reduce(_ unionAll _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lists"), sum(col("_c")).as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(topN)
  }

  /** Ranking-quality metrics against a relevance-judgment set (qrels) —
    * the eval half of a retrieval pipeline: after [[rrfFuse]] (or any
    * ranker) produces per-query rankings, score them per query as
    *
    *   - `n_rel` / `n_rel_in_k`: judged-relevant docs, total and inside
    *     the top-k cut;
    *   - `recall_ppm = n_rel_in_k·10⁶ div n_rel` (exact integer);
    *   - `mrr_ppm = 10⁶ div first_rel_rank` (exact integer; 0 when no
    *     relevant doc is retrieved — the standard convention);
    *   - `ndcg@k`: DCG with gain `rel/log2(rank+1)` over the top-k,
    *     normalized by the ideal DCG of the query's judged gains. Both
    *     sums fold in RANK ORDER (a total order), each term one fixed
    *     double tree with `log2(x)` spelled `ln(x)/ln(2)` — the same
    *     engine-reproducibility discipline as the LM scores.
    *
    * `ranking`: (queryIdCol, docIdCol, rankCol); `qrels`:
    * (queryIdCol, docIdCol, relCol ≥ 1 integer gain); unjudged
    * retrieved docs count as gain 0 (standard). Queries present only in
    * qrels (nothing retrieved) emit recall/mrr/ndcg 0.
    *
    * Scale posture: one equi-join of the ranking with qrels on
    * (query, doc), then per-query hash aggs whose state is the judged
    * set / the k-bounded retrieved set — never the corpus. The ideal-DCG
    * frame aggregates qrels alone. No windows over raw rankings.
    */
  def rankingMetrics(ranking: DataFrame, qrels: DataFrame, queryIdCol: String,
                     docIdCol: String, rankCol: String, relCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    // null-filter AFTER the casts (the rrfFuse contract): ids that don't
    // cast drop instead of collapsing into a null join key
    val r = ranking.select(col(queryIdCol).cast("long").as("query_id"),
        col(docIdCol).cast("long").as("doc_id"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull &&
        col("rank").isNotNull)
    val q = qrels
      .filter(col(relCol).isNotNull && col(relCol) >= 1)
      .select(col(queryIdCol).cast("long").as("query_id"),
        col(docIdCol).cast("long").as("doc_id"),
        col(relCol).cast("long").as("rel"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull)
    // judged totals + ideal DCG: gains sorted descending (rel desc) fill
    // ideal ranks 1..n_rel; fold over the (−rel)-sorted array = rank order
    val ln2 = lit(math.log(2.0))
    val ideal = q.groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"),
        array_sort(collect_list(-col("rel"))).as("_gains"))
      .withColumn("_idcg", expr(s"""aggregate(
        slice(_gains, 1, $k),
        named_struct('i', 0L, 's', 0.0d),
        (a, g) -> named_struct('i', a.i + 1L,
          's', a.s + (-g) / (ln(CAST(a.i + 2 AS DOUBLE)) / ln(2.0d))),
        a -> a.s)"""))
      .select(col("query_id"), col("n_rel"), col("_idcg"))
    // retrieved ∩ judged, with rank; per-query fold over rank-sorted arr
    // (all @k: a relevant doc beyond the cut contributes nothing — the
    // standard metric-at-k convention)
    val hits = r.join(q, Seq("query_id", "doc_id"))
    val perQuery = hits.groupBy("query_id")
      .agg(min(when(col("rank") <= k, col("rank"))).as("first_rel_rank"),
        count(when(col("rank") <= k, lit(1))).as("n_rel_in_k"),
        array_sort(collect_list(when(col("rank") <= k,
          struct(col("rank"), col("rel"))))).as("_arr"))
    val dcg = aggregate(col("_arr"), lit(0.0), (a, s) =>
      a + s.getField("rel").cast("double") /
        (log(s.getField("rank").cast("double") + lit(1.0)) / ln2))
    ideal.join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_rel_in_k"), lit(0L)).as("n_rel_in_k"),
        expr(s"coalesce(n_rel_in_k, 0L) * 1000000L div n_rel").as("recall_ppm"),
        coalesce(expr("1000000L div first_rel_rank"), lit(0L)).as("mrr_ppm"),
        round(coalesce(dcg, lit(0.0)) / col("_idcg"), 6).as("ndcg"))
  }

  /** Average precision at `k` per query — the order-sensitive
    * complement to [[rankingMetrics]]'s recall/MRR/NDCG: AP integrates
    * precision at every relevant hit, so it penalizes a relevant doc at
    * rank 9 that NDCG's log discount barely notices, and MAP over it is
    * the classic single-number retrieval score (TREC convention:
    * binary relevance = judged gain ≥ 1; denominator is the query's
    * TOTAL judged-relevant count, so relevant docs outside the top-k
    * cost recall, not just discount).
    *
    *   ap = ( Σ_{hits i ≤ k, rank order} cum_hits(i) / rank(i) ) / n_rel
    *
    * The per-query sum folds over the rank-sorted hit array (≤ k
    * entries — a total order, one fixed double tree), same
    * engine-reproducibility discipline as the NDCG fold. Queries with
    * judged docs but no retrieved hit emit ap = 0.
    *
    * Input contract matches [[rankingMetrics]]; output:
    * (query_id, n_rel, n_rel_in_k, ap).
    *
    * Scale posture: one (query, doc) equi-join, per-query hash aggs
    * with k-bounded state; no windows over raw rankings.
    */
  def averagePrecision(ranking: DataFrame, qrels: DataFrame,
                       queryIdCol: String, docIdCol: String, rankCol: String,
                       relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val r = ranking.select(col(queryIdCol).cast("long").as("query_id"),
        col(docIdCol).cast("long").as("doc_id"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull &&
        col("rank").isNotNull)
    val q = qrels
      .filter(col(relCol).isNotNull && col(relCol) >= 1)
      .select(col(queryIdCol).cast("long").as("query_id"),
        col(docIdCol).cast("long").as("doc_id"))
      .filter(col("query_id").isNotNull && col("doc_id").isNotNull)
    val totals = q.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val perQuery = r.join(q, Seq("query_id", "doc_id"))
      .filter(col("rank") <= k)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_rel_in_k"),
        array_sort(collect_list(col("rank"))).as("_ranks"))
      // fold carries (hits so far, precision sum): at the i-th hit with
      // rank r the term is i / r
      .withColumn("_psum", expr("""aggregate(_ranks,
        named_struct('h', 0L, 's', 0.0d),
        (a, r) -> named_struct('h', a.h + 1L,
          's', a.s + CAST(a.h + 1 AS DOUBLE) / CAST(r AS DOUBLE)),
        a -> a.s)"""))
    totals.join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_rel_in_k"), lit(0L)).as("n_rel_in_k"),
        round(coalesce(col("_psum"), lit(0.0)) /
          col("n_rel").cast("double"), 6).as("ap"))
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
  /** Rank-biased overlap, min form (Webber, Moffat & Zobel, "A
    * Similarity Measure for Indefinite Rankings", TOIS 2010, eq. 11) —
    * the top-weighted agreement between two RANKINGS of the same item
    * space, the right metric when comparing retrieval systems or
    * monitoring ranking drift: unlike Kendall/Spearman it handles
    * lists that only partially overlap and discounts disagreement
    * deep in the tail by `p^d`.
    *
    *   RBO_min = (1−p)/p · [ Σ_{d=1..k} p^d · X_d / d
    *                         + X_k · (−ln(1−p) − Σ_{d=1..k} p^d/d) ],
    *   X_d = |A_{1..d} ∩ B_{1..d}|
    *
    * The second summand is eq. 11's tail term — agreement assumed to
    * persist at X_k beyond the evaluated depth (Σ_{d>k} p^d/d =
    * −ln(1−p) − Σ_{d≤k} p^d/d), which makes the value comparable with
    * standard RBO implementations: identical lists score
    * 1 − p^k + k·(1−p)/p·(−ln(1−p) − Σ p^d/d), not the truncated
    * 1 − p^k (the r11-advice definition gap).
    *
    * Rewritten per common item: an id at ranks (ra, rb) contributes
    * Σ_{d=max(ra,rb)..k} p^d/d — so the computation is one equi-join
    * of the two (≤ k)-row rank frames, no depth loop over data. The
    * double fold runs over the ID-SORTED common-item array, each
    * item's weight an ascending-d sequence fold, and the tail constant
    * is the same ascending fold from d=1 — partial-sum order is
    * pinned on both engines. Output: ONE row (k, n_common, rbo_min).
    *
    * Scale posture: both inputs are top-k frames (bounded by contract —
    * the output of a ranking cut, not a corpus); everything here is
    * ≤ k rows.
    */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          p: Double, k: Int): DataFrame = {
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    require(k >= 1, "k must be positive")
    def side(df: DataFrame, out: String) =
      df.filter(col(rankCol) <= k && col(idCol).isNotNull)
        .select(col(idCol).cast("string").as("_id"),
          col(rankCol).cast("long").as(out))
    val j = side(a, "_ra").join(side(b, "_rb"), "_id")
      .withColumn("_m", greatest(col("_ra"), col("_rb")))
    val folded = j.agg(
      count(lit(1)).as("n_common"),
      array_sort(collect_list(struct(col("_id"), col("_m")))).as("_arr"))
    val sumW = aggregate(col("_arr"), lit(0.0), (acc, s) =>
      acc + aggregate(sequence(s.getField("_m"), lit(k.toLong)), lit(0.0),
        (a2, d) => a2 + pow(lit(p), d) / d))
    // eq. 11 tail: X_k * (sum_{d>k} p^d/d), with the constant inner sum
    // folded ascending exactly like the per-item weights
    val sumK = aggregate(sequence(lit(1L), lit(k.toLong)), lit(0.0),
      (a2, d) => a2 + pow(lit(p), d) / d)
    val tail = col("n_common").cast("double") * (-log(lit(1.0 - p)) - sumK)
    folded.select(lit(k.toLong).as("k"), col("n_common"),
      round(lit(1.0 - p) / lit(p) * (sumW + tail), 6).as("rbo_min"))
  }

  def rankByScore(scored: DataFrame, idCol: String, scoreCol: String): DataFrame =
    scored.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
}
