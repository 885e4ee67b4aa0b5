package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-style tests over ScalaCheck-generated corpora for the
  * round-8 operators: invariants that must hold for EVERY input, not
  * just the hand-built fixtures.
  */
class Round8PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val genWord = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "merge", "order", "low", "lower",
    "newest", "widest", "a", "ab", "abc", "x1", "92", "the")
  private val genDoc = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genWord))

  private def corpus(seed: Long, n: Int = 60): List[(Long, String)] =
    Gen.listOfN(n, genDoc)(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  private val Seeds = Seq(7L, 19L, 51L)

  test("BPE: merges only ever REDUCE token counts; zero merges = char count") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("doc_id", "text")
      val merges = Bpe.train(df, "text", numMerges = 6)
      val none = Bpe.tokenCounts(df, "doc_id", "text", Nil)
        .select("doc_id", "n_tokens", "n_chars")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      // with NO merges every non-space char is its own token
      none.values.foreach { case (tok, chars) => tok shouldBe chars }
      if (merges.nonEmpty) {
        val some = Bpe.tokenCounts(df, "doc_id", "text", merges)
          .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
        some.foreach { case (id, t) =>
          t should be <= none(id)._1
          if (none(id)._1 > 0) t should be >= 1L
        }
        // applying the same merge table twice changes nothing: all
        // left-side pairs were already consumed by the first pass
        val once = Bpe.applyMerges(Bpe.toUnits(Bpe.normalize(col("text"))), merges)
        val twice = Bpe.applyMerges(once, merges)
        df.select((once === twice).as("eq")).as[Boolean].collect()
          .forall(identity) shouldBe true
      }
    }
  }

  test("salted boilerplate removal is bit-identical to unsalted on any corpus") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("doc_id", "text")
      val plain = Boilerplate.removeBoilerplate(df, "doc_id", "text",
        delim = " ", minDocs = 3).orderBy("doc_id").collect().map(_.toSeq)
      val salted = Boilerplate.removeBoilerplate(df, "doc_id", "text",
        delim = " ", minDocs = 3, saltBuckets = 5).orderBy("doc_id")
        .collect().map(_.toSeq)
      salted should contain theSameElementsInOrderAs plain
    }
  }

  test("filterFunnel conserves corpus mass on any corpus") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("doc_id", "text")
      val f = TextAnalysis.filterFunnel(df, "doc_id", "text")
        .orderBy("stage").collect()
      f.length shouldBe 6
      f.sliding(2).foreach { case Array(a, b) =>
        a.getAs[Long]("n_out") shouldBe b.getAs[Long]("n_in") }
      val total = df.filter(col("text").isNotNull).count()
      f.head.getAs[Long]("n_in") shouldBe total
      f.map(_.getAs[Long]("n_dropped")).sum + f.last.getAs[Long]("n_out") shouldBe total
      f.foreach { r =>
        r.getAs[Long]("n_dropped") should be >= 0L
        r.getAs[Long]("n_out") should be >= 0L
      }
    }
  }

  test("canonical near-dup: pair set is invariant under exact-duplicate injection") {
    Seeds.foreach { s =>
      val base = corpus(s, 40).filter(_._2.nonEmpty)
      val df = base.toDF("doc_id", "text")
      // inject verbatim copies at higher ids: canonical reps (min ids)
      // and therefore the emitted pair SET must not change
      val flooded = (base ++ base.take(10).map { case (id, t) => (1000L + id, t) })
        .toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) =
        Dedup.nearDupPairsCanonical(d, "doc_id", "text", n = 2, tau = 0.5)
          .select("a_id", "b_id", "jaccard").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      pairs(flooded) shouldBe pairs(df)
    }
  }

  test("linearQualityScore: score strictly inside (0,1); sum exact vs driver recompute") {
    Seeds.foreach { s =>
      val df = corpus(s).toDF("doc_id", "text")
      val w = Seq.tabulate(32)(i => (i.toLong * 37L) % 1001L - 500L)
      val rows = TextAnalysis.linearQualityScore(df, "doc_id", "text", w, biasPpm = 100000L)
        .collect()
      rows.foreach { r =>
        val score = r.getDouble(3)
        score should (be > 0.0 and be < 1.0)
      }
    }
  }

  // ---- round-8b web/curation family ----------------------------------

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("a.com", "B.Example.ORG", "x.y.z.io", "localhost")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/p", "//a//b/", "/x/y/z///")
    q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=s", "?z=1&utm_x=2&a=3", "?ref=r#f")
  } yield s"$scheme://$www$host$port$path$q"

  test("property: URL canonicalization is idempotent on generated URLs") {
    Seeds.foreach { s =>
      val urls = Gen.listOfN(120, genUrl)(Gen.Parameters.default, Seed(s))
        .getOrElse(sys.error("gen failed")).toDF("url")
      val once = Web.canonicalize(urls, "url")
        .select(col("url_canon").as("url")).filter(col("url").isNotNull)
      Web.canonicalize(once, "url")
        .filter(col("url_canon") =!= col("url")).count() shouldBe 0L
    }
  }

  test("property: stripHtml never leaves a tag, for any generated markup") {
    val genHtml: Gen[String] = for {
      words <- genDoc
      tag <- Gen.oneOf("b", "p", "div", "SPAN")
      junk <- Gen.oneOf("", "<script>var x=1<2;</script>", "<!-- c -->",
        "<style>p{}</style>", "&amp;lt;", "&nbsp;")
    } yield s"<$tag class='k'>${words.mkString(" ")}</$tag>$junk"
    Seeds.foreach { s =>
      val html = Gen.listOfN(100, genHtml)(Gen.Parameters.default, Seed(s))
        .getOrElse(sys.error("gen failed")).toDF("h")
      // no markup survives: nothing matching `<letter` or `</`
      html.select(TextAnalysis.stripHtml(col("h")).as("t"))
        .filter(col("t").rlike("<[a-zA-Z!/]")).count() shouldBe 0L
    }
  }

  test("property: rrfFuse output is invariant to the ORDER of the ranking lists") {
    Seeds.foreach { s =>
      val a = corpus(s, 40).map { case (i, _) => (i, i % 17 + 1) }.toDF("id", "rank")
      val b = corpus(s + 1, 40).map { case (i, _) => (i, i % 11 + 1) }.toDF("id", "rank")
      def fused(xs: Seq[org.apache.spark.sql.DataFrame]) =
        Retrieval.rrfFuse(xs, "id", "rank", topN = 15)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      fused(Seq(a, b)) shouldBe fused(Seq(b, a))
    }
  }

  test("property: temperatureMix at α=1 keeps (at most floor-slack under) natural proportions") {
    Seeds.foreach { s =>
      val df = corpus(s, 200).map { case (i, w) => (i, s"s${w.length % 3}") }
        .toDF("key", "src")
      val natural = df.groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = natural.values.sum
      val budget = total / 2
      val got = Sampling.temperatureMix(df, "src", "key", budget, alphaQuarters = 4)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      natural.foreach { case (src, n) =>
        val q = got.getOrElse(src, 0L)
        // quota_s = floor(budget * n / total), capped at n
        q should be <= math.min(n, budget * n / total)
        q should be >= math.max(0L, budget * n / total - 1)
      }
    }
  }
}
