package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def fuse(a: Seq[(Long, Long)], b: Seq[(Long, Long)], k: Int = 60,
                   topN: Int = 20): Seq[(Long, Long, Long)] =
    Retrieval.rrfFuse(
      Seq(a.toDF("id", "rank"), b.toDF("id", "rank")), "id", "rank",
      k = k, topN = topN)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("rrfFuse: doc in both lists beats a higher single-list doc (hand-computed)") {
    // doc 1: rank 2 + rank 3 -> 16129 + 15873 = 32002
    // doc 2: rank 1 in one list only -> 16393
    val got = fuse(Seq((1L, 2L), (2L, 1L)), Seq((1L, 3L), (3L, 1L)))
    got.head shouldBe ((1L, 2L, 1000000L / 62 + 1000000L / 63))
    got.map(_._1) shouldBe Seq(1L, 2L, 3L)
    // singles: floor ppm at k=60
    got.find(_._1 == 2L).get shouldBe ((2L, 1L, 1000000L / 61))
  }

  test("rrfFuse ties break by doc id; topN cuts after the fused order") {
    // two docs with identical contributions -> tie on rrf_ppm, id order
    val got = fuse(Seq((7L, 1L), (5L, 1L)), Seq.empty, topN = 1)
    // both rank 1 in (distinct) lists is impossible in one list; use two lists
    val both = fuse(Seq((7L, 1L)), Seq((5L, 1L)), topN = 2)
    both.map(_._1) shouldBe Seq(5L, 7L)
    got should have size 1
  }

  test("rrfFuse is join-free and shuffles once (the fusion agg)") {
    // enough rows that the top-N cut survives optimization (on a frame
    // smaller than topN the optimizer correctly drops the limit and the
    // tail becomes a plain sort) — the shipping shape is
    // union → hash agg (1 exchange) → TakeOrderedAndProject
    val a = (1L to 100L).map(i => (i, i)).toDF("id", "rank")
    val b = (50L to 150L).map(i => (i, i - 49L)).toDF("id", "rank")
    val df = Retrieval.rrfFuse(Seq(a, b), "id", "rank", topN = 10)
    PlanAudit.forbiddenJoins(df) shouldBe empty
    Bucketing.shuffleCount(df) shouldBe 1
    df.queryExecution.executedPlan.toString should include ("TakeOrderedAndProject")
  }

  test("rrfFuse: uncastable ids fail loudly under ANSI, never collapse to a null group") {
    // ANSI (this engine's default): the long cast of 'doc-1' ERRORS —
    // garbage ids are a caller bug, not a mergeable null key. Under
    // ANSI-off deployments the cast nulls and the post-cast filter
    // drops the row; either way no doc_id=null mega-group can form.
    val a = Seq(("doc-1", 1L), ("7", 2L)).toDF("id", "rank")
    val ex = intercept[Exception] {
      Retrieval.rrfFuse(Seq(a), "id", "rank").collect()
    }
    ex.getMessage should include ("CAST_INVALID_INPUT")
    // numeric-string ids are fine and keep their value
    val ok = Seq(("7", 1L)).toDF("id", "rank")
    Retrieval.rrfFuse(Seq(ok), "id", "rank")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(7L)
  }

  test("rankByScore ranks by (score desc, id) on the rounded score") {
    val scored = Seq((10L, 2.5), (11L, 3.5), (12L, 2.5)).toDF("id", "score")
    Retrieval.rankByScore(scored, "id", "score")
      .select("id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap shouldBe
      Map(11L -> 1L, 10L -> 2L, 12L -> 3L)
  }

  test("rankingMetrics: hand-computed recall/MRR/nDCG at k; unjudged and unretrieved edges") {
    // q1: judged {10→3, 13→1, 20→2}; retrieved [10,11,12,13] — doc 13 at
    // rank 4 is OUTSIDE k=3, doc 20 never retrieved.
    // q2: judged {30→2}; nothing relevant retrieved.
    // q3: retrieved but has no judgments — absent from output.
    val ranking = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (2L, 40L, 1L), (3L, 50L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 10L, 3L), (1L, 13L, 1L), (1L, 20L, 2L),
      (2L, 30L, 2L)).toDF("query_id", "doc_id", "rel")
    val got = Retrieval.rankingMetrics(ranking, qrels,
      "query_id", "doc_id", "rank", "rel", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    // dcg = 3/log2(2); idcg = 3/log2(2) + 2/log2(3) + 1/log2(4)
    val ndcg1 = (3.0 / log2(2)) / (3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4))
    got(1L)._1 shouldBe 3L               // n_rel
    got(1L)._2 shouldBe 1L               // n_rel_in_k (13 is beyond the cut)
    got(1L)._3 shouldBe 333333L          // recall_ppm = 1e6 div 3
    got(1L)._4 shouldBe 1000000L         // mrr: first relevant at rank 1
    got(1L)._5 shouldBe
      BigDecimal(ndcg1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(2L) shouldBe ((1L, 0L, 0L, 0L, 0.0)) // judged, nothing found
    got.contains(3L) shouldBe false          // no judgments → no metric
  }

  test("hybrid fusion end-to-end: bm25 + knn legs over the sf0.001 corpus") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.TestTables.table(spark, dir, "documents")
    val emb = graft.TestTables.table(spark, dir, "embeddings")
    val lex = Retrieval.rankByScore(
        TextAnalysis.bm25(docs, "doc_id", "text",
          queryTerms = Seq("spark", "window", "dup"), topN = 20),
        "doc_id", "score")
      .select(col("doc_id"), col("rank"))
    val sem = Similarity.knnBruteForce(
        emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 20)
      .select(col("neighbor_id").as("doc_id"), col("rn").as("rank"))
    val fused = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank", topN = 10)
      .collect()
    fused.length should be > 0
    // fused order is non-increasing in rrf_ppm
    val ppm = fused.map(_.getLong(2)).toSeq
    ppm shouldBe ppm.sorted(Ordering[Long].reverse)
    // a doc on both lists carries n_lists = 2 at most
    fused.map(_.getLong(1)).max should be <= 2L
  }
}
