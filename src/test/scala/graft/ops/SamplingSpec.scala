package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 1000L).toDF("id")

  test("hashBucket is a pure function of the key: partitioning never changes membership") {
    val a = Sampling.sampleByHash(ids, "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(ids.repartition(13), "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    val c = Sampling.sampleByHash(ids.orderBy(col("id").desc), "id", keepBuckets = 10)
      .collect().map(_.getLong(0)).toSet
    a shouldBe b
    a shouldBe c
    // ~10% of the keyspace, binomial tolerance
    a.size.toDouble should (be >= 60.0 and be <= 140.0)
  }

  test("trainTestSplit covers every row exactly once and is key-stable") {
    val split = Sampling.trainTestSplit(ids, "id", testBuckets = 20)
    split.count() shouldBe 1000
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.keySet shouldBe Set("train", "test")
    byLabel.values.sum shouldBe 1000
    byLabel("test").toDouble should (be >= 120.0 and be <= 280.0)
    // disjoint by construction: same key never flips label
    val again = Sampling.trainTestSplit(ids.repartition(7), "id", testBuckets = 20)
      .filter(col("split") === "test").collect().map(_.getLong(0)).toSet
    split.filter(col("split") === "test").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("stratifiedSampleByHash applies per-stratum thresholds; unlisted strata drop") {
    val rows = (1L to 300L).map(i =>
      (i, if (i <= 100) "a" else if (i <= 200) "b" else "c")).toDF("id", "cls")
    val kept = Sampling.stratifiedSampleByHash(rows, "id", "cls",
      Map("a" -> 100, "b" -> 0)) // keep all of a, none of b, c unlisted
    val byCls = kept.groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byCls shouldBe Map("a" -> 100L)
    // the kept subset of a stratum equals the unstratified hash sample
    val keptHalf = Sampling.stratifiedSampleByHash(rows, "id", "cls", Map("c" -> 50))
      .collect().map(_.getLong(0)).toSet
    val plain = Sampling.sampleByHash(rows.filter(col("cls") === "c"), "id", 50)
      .collect().map(_.getLong(0)).toSet
    keptHalf shouldBe plain
  }

  test("splitByWeights partitions the keyspace exhaustively, in listed order") {
    val parts = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val split = Sampling.splitByWeights(ids, "id", parts)
    split.count() shouldBe 1000
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.values.sum shouldBe 1000
    byLabel("train").toDouble should be >= 800.0
    // a 3-way split is the 2-way split refined: train+val here == train
    // in trainTestSplit with the same bucket count (contiguous slices)
    val twoWay = Sampling.trainTestSplit(ids, "id", testBuckets = 5)
      .filter(col("split") === "test").collect().map(_.getLong(0)).toSet
    split.filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet shouldBe twoWay
    // weights must cover the bucket space exactly
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitByWeights(ids, "id", Seq("a" -> 50, "b" -> 30))
  }

  test("mixToProportions yields the LARGEST exactly-proportioned mixture") {
    // 100 web, 30 books, 10 code; target 7/2/1 → capacity limited by
    // web: N = min(100*10/7, 30*10/2, 10*10/1) = min(142,150,100) = 100
    // quotas: web 70, books 20, code 10 — all of code survives
    val rows = ((1L to 100L).map(i => (i, "web")) ++
      (101L to 130L).map(i => (i, "books")) ++
      (131L to 140L).map(i => (i, "code"))).toDF("id", "src")
    val got = Sampling.mixToProportions(rows, "src", "id",
      Map("web" -> 7, "books" -> 2, "code" -> 1))
    val bySrc = got.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc shouldBe Map("web" -> 70L, "books" -> 20L, "code" -> 10L)
    // partitioning never changes which rows make the cut
    val again = Sampling.mixToProportions(rows.repartition(11), "src", "id",
      Map("web" -> 7, "books" -> 2, "code" -> 1))
      .select("id").collect().map(_.getLong(0)).toSet
    got.select("id").collect().map(_.getLong(0)).toSet shouldBe again
  }

  test("mixToProportions: a listed source with zero rows pins capacity to 0") {
    val rows = ((1L to 100L).map(i => (i, "web")) ++
      (101L to 130L).map(i => (i, "books"))).toDF("id", "src")
    // "code" is declared in the mixture but absent from the corpus: the
    // only exactly-7/2/1 mixture that exists is the empty one
    Sampling.mixToProportions(rows, "src", "id",
      Map("web" -> 7, "books" -> 2, "code" -> 1)).count() shouldBe 0L
  }

  test("splitByWeights: null keys land in the first part, never a held-out slice") {
    val rows = Seq(Some(1L), Some(2L), None).toDF("id")
    val bySplit = Sampling.splitByWeights(rows, "id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .filter(col("id").isNull).select("split")
      .collect().map(_.getString(0)).toSeq
    bySplit shouldBe Seq("train")
  }

  test("epochRepeat: whole epochs for all, the partial epoch by keyspace slice") {
    val rows = (1L to 400L).map(i => (i, if (i <= 200) "rare" else "big"))
      .toDF("id", "src")
    // rare ×2.5, big ×0.5 (big not repeated, half of big dropped)
    val got = Sampling.epochRepeat(rows, "src", "id",
      Map("rare" -> 25000, "big" -> 5000))
    val perId = got.groupBy("id", "src").agg(count(lit(1)).as("n"),
        max("epoch").as("maxe"), min("epoch").as("mine"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    // every emitted id has contiguous epochs starting at 0
    perId.values.foreach { case (_, n, maxe, mine) =>
      mine shouldBe 0L
      maxe shouldBe n - 1
    }
    // rare ids appear 2 or 3 times (2.5 mean); big ids 0 or 1 (0.5 mean)
    val rareCounts = perId.collect { case (_, ("rare", n, _, _)) => n }
    rareCounts.toSet shouldBe Set(2L, 3L)
    val bigEmitted = perId.count { case (_, (s, _, _, _)) => s == "big" }
    bigEmitted.toDouble should (be >= 60.0 and be <= 140.0) // ~half of 200
    // total volume ≈ 200·2.5 + 200·0.5 = 600, binomial noise
    got.count().toDouble should (be >= 520.0 and be <= 680.0)
    // determinism: same rows survive under any partitioning
    val again = Sampling.epochRepeat(rows.repartition(17), "src", "id",
      Map("rare" -> 25000, "big" -> 5000))
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe again
  }

  test("fillTokenBudget keeps the maximal hash-order prefix within each quota") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 200L).map { i =>
      (i, if (i % 2 == 0) "a" else "b", 10L + i % 7)
    }.toDF("id", "src", "toks")
    val budget = 1200L
    val weights = Map("a" -> 2, "b" -> 1) // quotas: 2*1200/3=800, 400
    val got = Sampling.fillTokenBudget(rows, "src", "id", "toks", budget, weights)
      .select("id").as[Long].collect().toSet

    // naive single-window ground truth: running sum in (md5, id) order
    val naive = rows
      .withColumn("_h", md5(col("id").cast("string").cast("binary")))
      .withColumn("_cum", sum("toks").over(
        Window.partitionBy("src").orderBy(col("_h"), col("id"))))
      .withColumn("_q", when(col("src") === "a", 800L).otherwise(400L))
      .filter(col("_cum") <= col("_q"))
      .select("id").as[Long].collect().toSet
    got shouldBe naive
    got.nonEmpty shouldBe true
    // both sources are capped well below their total mass
    val kept = Sampling.fillTokenBudget(rows, "src", "id", "toks", budget, weights)
      .groupBy("src").agg(sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") <= 800L && kept("a") > 800L - 17L) // slack < one max doc
    assert(kept("b") <= 400L && kept("b") > 400L - 17L)

    // determinism under partitioning
    val again = Sampling.fillTokenBudget(rows.repartition(13), "src", "id",
      "toks", budget, weights).select("id").as[Long].collect().toSet
    again shouldBe got
  }

  test("fillTokenBudget: zero budget keeps nothing; unlisted sources drop") {
    val rows = Seq((1L, "a", 5L), (2L, "z", 5L)).toDF("id", "src", "toks")
    Sampling.fillTokenBudget(rows, "src", "id", "toks", 0L, Map("a" -> 1))
      .count() shouldBe 0L
    Sampling.fillTokenBudget(rows, "src", "id", "toks", 100L, Map("a" -> 1))
      .select("id").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("selectByScoreBudget equals the naive global-window prefix") {
    // scores spread across many 2^16 buckets AND negative values, so the
    // two-level cumsum exercises bucket offsets and the floor-shift on
    // negatives; sizes chosen so the cut lands mid-bucket
    val rows = (1L to 200L).map { i =>
      (i, (i * 7919L % 401L) * 3000L - 250000L, 1L + i % 13L)
    }.toDF("id", "score_ppm", "toks")
    val naive = rows.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, s, _) => (-s, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, s, t)) => (id, s, t, cum + t) }
      .drop(1).takeWhile(_._4 <= 600L).map(_._1).toSet
    val got = Sampling.selectByScoreBudget(rows, "id", "score_ppm", "toks", 600L)
      .select("key").as[Long].collect().toSet
    got shouldBe naive
    got.nonEmpty shouldBe true

    // partitioning must not move the selection
    val again = Sampling.selectByScoreBudget(rows.repartition(17), "id",
      "score_ppm", "toks", 600L).select("key").as[Long].collect().toSet
    again shouldBe got

    // bucketShift granularity must not either (0 = one bucket per score)
    val shift0 = Sampling.selectByScoreBudget(rows, "id", "score_ppm", "toks",
      600L, bucketShift = 0).select("key").as[Long].collect().toSet
    shift0 shouldBe got
  }

  test("weightedSample matches an independent A-ES recomputation") {
    val rows = (1L to 100L).map(i => (i, 1L + (i * 31L) % 997L))
    val df = rows.toDF("id", "w")
    def naivePriority(key: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val hv = java.lang.Long.parseLong(hex, 16)
      -math.log((hv + 1).toDouble / 4503599627370496.0) / w.toDouble
    }
    val expect = rows.sortBy { case (id, w) => (naivePriority(id, w), id) }
      .take(10).map(_._1).toSet
    val got = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("key").as[Long].collect().toSet
    got shouldBe expect

    // repartition-proof
    Sampling.weightedSample(df.repartition(13), "id", "w", k = 10)
      .select("key").as[Long].collect().toSet shouldBe expect
  }

  test("weightedSample: k >= n returns every positive-weight row") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L), (4L, 7L))
      .toDF("id", "w")
    Sampling.weightedSample(df, "id", "w", k = 10)
      .select("key").as[Long].collect().toSet shouldBe Set(1L, 4L)
  }

  test("weightedSample favors heavy weights (deterministically)") {
    // one row carries 10^6× the weight of 999 others; its priority is
    // ~10^6 smaller than a typical light row's — it must be in any
    // small sample
    val df = ((1L to 999L).map(i => (i, 1L)) :+ (1000L, 1000000L)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 20)
      .select("key").as[Long].collect().toSet
    got should contain(1000L)
  }

  test("selectByScoreBudget is a greedy PREFIX: a crossing row ends the take") {
    val rows = Seq((1L, 30L, 5L), (2L, 20L, 10L), (3L, 10L, 3L))
      .toDF("id", "score_ppm", "toks")
    // cum: 5, 15, 18 vs budget 8 → only the top-scored row; the small
    // later row is NOT admitted even though 5 + 3 would fit
    Sampling.selectByScoreBudget(rows, "id", "score_ppm", "toks", 8L)
      .select("key").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("kfoldAssign: folds cover [0,k), all rows of one key share a fold") {
    val df = (1L to 300L).flatMap(k => Seq((k, "x"), (k, "y"))).toDF("key", "payload")
    val got = Sampling.kfoldAssign(df, "key", k = 5)
    val folds = got.select("fold").as[Long].collect()
    folds.toSet.subsetOf((0L until 5L).toSet) shouldBe true
    folds.toSet.size shouldBe 5 // 300 keys hit every fold
    // leakage-safety: both rows of a key land together
    got.groupBy("key").agg(countDistinct("fold").as("nf"))
      .filter(col("nf") > 1).count() shouldBe 0L
  }

  test("kfoldAssign is partitioning-independent") {
    val df = (1L to 200L).toDF("key")
    val one = Sampling.kfoldAssign(df.repartition(1), "key", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Sampling.kfoldAssign(df.repartition(13), "key", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    one shouldBe many
  }

  test("kfoldStratified: every stratum's fold sizes differ by at most one") {
    // stratum sizes 7, 10, 3 against k=4 — none divide evenly
    val df = ((1L to 7L).map((_, "a")) ++ (8L to 17L).map((_, "b")) ++
      (18L to 20L).map((_, "c"))).toDF("key", "s")
    val sizes = Sampling.kfoldStratified(df, "key", "s", k = 4)
      .groupBy("s", "fold").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (s <- Seq("a", "b", "c")) {
      val perFold = (0L until 4L).map(f => sizes.getOrElse((s, f), 0L))
      (perFold.max - perFold.min) should be <= 1L
    }
    // a 3-row stratum still reaches 3 different folds
    (0L until 4L).count(f => sizes.contains(("c", f))) shouldBe 3
  }

  test("negativeSample: k other-label negatives per anchor, never own label") {
    val df = (1L to 60L).map(i => (i, s"l${i % 4}")).toDF("key", "lbl")
    val got = Sampling.negativeSample(df, "key", "lbl", k = 3, poolSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lbl = (1L to 60L).map(i => i -> s"l${i % 4}").toMap
    got.groupBy(_._1).foreach { case (_, rs) => rs should have size 3 }
    got.foreach { case (a, n, _) => lbl(a) should not be lbl(n) }
    // ranks are 1..3 per anchor
    got.groupBy(_._1).foreach { case (_, rs) =>
      rs.map(_._3).sorted shouldBe Seq(1L, 2L, 3L)
    }
  }

  test("negativeSample is partitioning-independent and anchor-varied") {
    val df = (1L to 80L).map(i => (i, s"l${i % 5}")).toDF("key", "lbl")
    def run(parts: Int) =
      Sampling.negativeSample(df.repartition(parts), "key", "lbl", k = 2, poolSize = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val a = run(1); val b = run(11)
    a shouldBe b
    // the per-pair hash re-ranks the pool per anchor: not every anchor
    // gets the same negative set
    a.groupBy(_._1._1).values.map(_.values.toSet).toSet.size should be > 1
  }

  test("negativeSample: anchors with too few other-label pool rows get fewer negatives") {
    // pool is dominated by label "a": a "b" anchor still fills k, an
    // "a" anchor can only draw from the single "b" pool row
    val df = ((1L to 19L).map((_, "a")) :+ (20L, "b")).toDF("key", "lbl")
    val got = Sampling.negativeSample(df, "key", "lbl", k = 3, poolSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byAnchor = got.groupBy(_._1)
    byAnchor(1L).map(_._2).toSet shouldBe Set(20L) // only one "b" exists
    byAnchor(20L) should have size 3
  }

  test("kfoldStratified keeps every input row exactly once") {
    val df = (1L to 50L).map(i => (i, s"s${i % 3}")).toDF("key", "s")
    val got = Sampling.kfoldStratified(df, "key", "s", k = 5)
    got.count() shouldBe 50L
    got.select("key").distinct().count() shouldBe 50L
  }

  test("temperatureMix: α=1/2 quotas match the hand formula and cap at n_s") {
    // sources: a=400, b=100, c=4 rows; w_ppm = floor(1e6*sqrt(n))
    // Σw = 20e6 + 10e6 + 2e6 = 32e6; budget 160 ->
    // a: 160*20/32 = 100, b: 160*10/32 = 50, c: min(4, 160*2/32=10) = 4
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 504L).map(i => (i, "c"))).toDF("key", "src")
    val got = Sampling.temperatureMix(df, "src", "key", budget = 160L)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 100L, "b" -> 50L, "c" -> 4L)
  }

  test("temperatureMix flattens with α: lower α gives the tail a larger share") {
    val df = ((1L to 900L).map(i => (i, "head")) ++
      (901L to 1000L).map(i => (i, "tail"))).toDF("key", "src")
    def tailShare(q: Int): Double = {
      val m = Sampling.temperatureMix(df, "src", "key", budget = 200L,
        alphaQuarters = q).groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      m("tail").toDouble / (m("head") + m("tail"))
    }
    // natural (α=1) share is 0.1; each temperature step flattens further
    tailShare(4) shouldBe 0.1 +- 0.01
    tailShare(3) should be > tailShare(4)
    tailShare(2) should be > tailShare(3)
    tailShare(1) should be > tailShare(2)
  }

  test("temperatureMix selection is partitioning-invariant and a subset of the input") {
    val df = (1L to 300L).map(i => (i, s"s${i % 4}")).toDF("key", "src")
    def keys(d: org.apache.spark.sql.DataFrame) =
      Sampling.temperatureMix(d, "src", "key", budget = 100L)
        .select("key").collect().map(_.getLong(0)).toSet
    val a = keys(df); val b = keys(df.repartition(13))
    a shouldBe b
    a.subsetOf((1L to 300L).toSet) shouldBe true
  }

  test("shardManifest: positions are 1..|shard| and stable under repartitioning") {
    val df = (1L to 500L).map(i => s"k$i").toDF("key")
    val got = Sampling.shardManifest(df, "key", shards = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.length shouldBe 500
    got.map(_._2).toSet.subsetOf((0L until 8L).toSet) shouldBe true
    // positions within a shard are a contiguous 1..n run, no gaps/dupes
    got.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).sorted.toSeq shouldBe (1L to rows.length).toSeq
    }
    val again = Sampling.shardManifest(df.repartition(11), "key", shards = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got.toSet shouldBe again.toSet
  }

  test("epochShuffle: distinct epochs permute differently; each epoch is deterministic") {
    val df = (1L to 300L).map(i => s"k$i").toDF("key")
    def order(epoch: Int, d: org.apache.spark.sql.DataFrame = df) =
      Sampling.epochShuffle(d, "key", shards = 4, epoch = epoch)
        .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val e1 = order(1); val e2 = order(2)
    e1 should not be e2                      // fresh permutation per epoch
    order(1, df.repartition(7)) shouldBe e1  // …but each epoch reproducible
    // positions are still a contiguous run per shard
    val byShard = Sampling.epochShuffle(df, "key", 4, 1)
      .collect().map(r => (r.getLong(2), r.getLong(3))).groupBy(_._1)
    byShard.values.foreach { rows =>
      rows.map(_._2).sorted.toSeq shouldBe (1L to rows.length).toSeq
    }
  }

  test("shardManifest append-stability: new keys never reorder surviving neighbors") {
    val base = (1L to 200L).map(i => s"k$i").toDF("key")
    val grown = (1L to 260L).map(i => s"k$i").toDF("key")
    def manifest(d: org.apache.spark.sql.DataFrame) =
      Sampling.shardManifest(d, "key", shards = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val before = manifest(base); val after = manifest(grown)
    // same shard for every surviving key, and the RELATIVE order of the
    // original keys within a shard is unchanged (newcomers splice in)
    val afterByKey = after.map(t => t._1 -> ((t._2, t._3))).toMap
    before.foreach { case (k, s, _) => afterByKey(k)._1 shouldBe s }
    before.groupBy(_._2).foreach { case (s, rows) =>
      val origOrder = rows.sortBy(_._3).map(_._1).toSeq
      val newOrder = after.filter(t => t._2 == s && origOrder.contains(t._1))
        .sortBy(_._3).map(_._1).toSeq
      newOrder shouldBe origOrder
    }
  }

  test("curriculumManifest: within-shard order walks the score, membership is the hash bucket") {
    val d = (1L to 200L).map(i => (i, (i * 7919L) % 50L)).toDF("k", "score")
    val out = Sampling.curriculumManifest(d, "k", "score", shards = 4).collect()
    out.length shouldBe 200
    // membership unchanged from shardManifest's bucket
    val buckets = Sampling.shardManifest(d, "k", shards = 4)
      .select("k", "shard").as[(Long, Long)].collect().toMap
    out.foreach(r => r.getLong(2) shouldBe buckets(r.getLong(0)))
    // positions 1..|shard| and scores nondecreasing along pos
    out.groupBy(_.getLong(2)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(3))
      sorted.map(_.getLong(3)).toSeq shouldBe (1L to rows.length).toSeq
      sorted.map(_.getLong(1)).toSeq shouldBe sorted.map(_.getLong(1)).sortBy(identity).toSeq
    }
    // descending flag reverses the ramp
    val desc = Sampling.curriculumManifest(d, "k", "score", shards = 4,
      descending = true).collect()
    desc.groupBy(_.getLong(2)).values.foreach { rows =>
      val s = rows.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      s shouldBe s.sortBy(-_)
    }
    // deterministic under repartitioning
    val again = Sampling.curriculumManifest(d.repartition(13), "k", "score", shards = 4)
      .select("k", "pos").as[(Long, Long)].collect().toMap
    out.foreach(r => again(r.getLong(0)) shouldBe r.getLong(3))
  }
}
