package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // baskets: b1={x,y,z}, b2={x,y}, b3={x,y,w}, b4={z,w}, b5 is a
  // mega-basket (items m1..m5) used only by the size-guard test
  private lazy val baskets = Seq(
    ("b1", "x"), ("b1", "y"), ("b1", "z"),
    ("b2", "x"), ("b2", "y"),
    ("b2", "y"), // duplicate incidence row — must not double-count
    ("b3", "x"), ("b3", "y"), ("b3", "w"),
    ("b4", "z"), ("b4", "w"),
    (null, "x"), ("b1", null) // null basket/item dropped
  ).toDF("basket", "item")

  test("cooccurrenceEdges counts shared baskets once per basket") {
    val got = Graph.cooccurrenceEdges(baskets, "basket", "item", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe Set(
      ("x", "y", 3L), // b1, b2 (deduped), b3
      ("x", "z", 1L), ("y", "z", 1L),
      ("w", "x", 1L), ("w", "y", 1L), ("w", "z", 1L))
  }

  test("minSupport prunes edges before downstream joins") {
    val got = Graph.cooccurrenceEdges(baskets, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe Set(("x", "y", 3L))
  }

  test("maxBasketSize drops mega-baskets before pairing") {
    val withMega = baskets.unionAll(
      (1 to 5).map(i => ("b5", s"m$i")).toDF("basket", "item"))
    val got = Graph.cooccurrenceEdges(withMega, "basket", "item",
        minSupport = 1L, maxBasketSize = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // no m* pair survives; the small baskets are untouched
    got.exists(_._1.startsWith("m")) shouldBe false
    got should contain(("x", "y"))
  }

  test("associationRules: confidence and lift as integer ppm, both directions") {
    val got = Graph.associationRules(baskets, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // n_baskets=4; cnt(x)=3, cnt(y)=3; sup(x,y)=3
    // conf(x→y) = 3/3 = 1e6 ppm; lift = 3*4/(3*3) = 1.333333e6 ppm
    got shouldBe Set(
      ("x", "y", 3L, 3L, 1000000L, 1333333L),
      ("y", "x", 3L, 3L, 1000000L, 1333333L))
  }

  test("triangles enumerates each closed triple once, a < b < c") {
    val got = Graph.triangles(baskets, "basket", "item", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // closed triples need each EDGE to exist, not one shared basket:
    // {x,y,z} (all via b1), {w,x,y} (b3), and the cross-basket closures
    // {w,x,z} (w-x b3, x-z b1, w-z b4) and {w,y,z} (w-y b3, y-z b1, w-z b4)
    got shouldBe Set(("x", "y", "z"), ("w", "x", "y"),
      ("w", "x", "z"), ("w", "y", "z"))
  }

  test("triangles respects minSupport on every edge") {
    // at support 2 only edge (x,y) survives → no triangle
    Graph.triangles(baskets, "basket", "item", minSupport = 2L)
      .count() shouldBe 0L
  }

  private def ranks(edges: Seq[(Int, Int)], iters: Int): Map[Int, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = iters)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("pageRank matches the hand-unrolled integer recurrence") {
    // 1→2, 2→{1,3}, 3→1; out-degrees 1, 2, 1
    // r1 = (1425000, 1000000, 575000); r2 below, all exact ppm ints
    ranks(Seq((1, 2), (2, 1), (2, 3), (3, 1)), iters = 2) shouldBe
      Map(1 -> 1063750L, 2 -> 1361250L, 3 -> 575000L)
  }

  test("pageRank: dangling node receives rank but redistributes none") {
    // 1→{2,3}, 2→1; node 3 has no out-edges (mass leaks, documented)
    ranks(Seq((1, 2), (2, 1), (1, 3)), iters = 1) shouldBe
      Map(1 -> 1000000L, 2 -> 575000L, 3 -> 575000L)
  }

  test("pageRank collapses duplicate edges (unweighted graph)") {
    val dup = Seq((1, 2), (1, 2), (2, 1), (2, 3), (3, 1))
    ranks(dup, iters = 2) shouldBe
      Map(1 -> 1063750L, 2 -> 1361250L, 3 -> 575000L)
  }

  test("kCore peels pendant chains to the triangle, multi-round") {
    // triangle 1-2-3 plus a pendant chain 3-4-5: node 5 peels in round
    // 1, which EXPOSES node 4 for round 2 — the fixed point is the
    // triangle alone, every member at degree 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Graph.kCore(edges, "a", "b", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    // k above the densest degree empties the graph (no rows, no hang)
    Graph.kCore(edges, "a", "b", k = 3).count() shouldBe 0L
  }

  test("hits: hand-computed 2-round ppm scores on a directed bipartite graph") {
    import spark.implicits._
    // C1->{P1,P2}, C2->P1. Round 1: a(P1)=1e6, a(P2)=500000;
    // h(C1)=1e6, h(C2)=1e12 div 1.5e6 = 666666. Round 2:
    // a(P1)=1e6, a(P2)=1e12 div 1666666 = 600000; h(C1)=1e6,
    // h(C2)=1e12 div 1600000 = 625000.
    val e = Seq(("C1", "P1"), ("C1", "P2"), ("C2", "P1")).toDF("src", "dst")
    val got = Graph.hits(e, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got("C1") shouldBe ((1000000L, 0L))
    got("C2") shouldBe ((625000L, 0L))
    got("P1") shouldBe ((0L, 1000000L))
    got("P2") shouldBe ((0L, 600000L))
  }

  test("hits is deterministic under repartitioning") {
    import spark.implicits._
    val e = (1 to 60).map(i => (s"u${i % 7}", s"v${i % 11}")).toDF("src", "dst")
    val a = Graph.hits(e, "src", "dst", 2).orderBy("node").collect().map(_.toSeq)
    val b = Graph.hits(e.repartition(7), "src", "dst", 2)
      .orderBy("node").collect().map(_.toSeq)
    a shouldBe b
  }

  test("itemCosine down-weights promiscuous items and cuts deterministically") {
    import spark.implicits._
    // baskets: b1{1,2} b2{1,2} b3{1,3} -> cnt 1=3, 2=2, 3=1
    val df = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L),
      (30L, 3L)).toDF("b", "i")
    val got = Graph.itemCosine(df, "b", "i", minSupport = 1L, topK = 10)
      .collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) shouldBe
      Array((1L, 2L, 2L), (1L, 3L, 1L))
    got(0).getDouble(5) shouldBe 2.0 / math.sqrt(3.0 * 2.0)
    got(1).getDouble(5) shouldBe 1.0 / math.sqrt(3.0 * 1.0)
  }
}
