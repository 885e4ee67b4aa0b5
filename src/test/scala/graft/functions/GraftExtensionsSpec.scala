package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  /** A session built THROUGH the SparkSessionExtensions injection path a
    * pure-SQL deployment uses. `spark.sql.extensions` is a STATIC conf —
    * it cannot attach to the already-running test SparkContext — so the
    * builder's `withExtensions` applies the SAME `GraftExtensions`
    * instance the conf would construct, over a fresh SparkSession on the
    * shared context. A broken `injectFunction` registration — wrong
    * arity check, bad builder — fails these tests, not just a manual
    * temp-function mirror of the registration.
    */
  private def withExtensionSession[T](body: SparkSession => T): T = {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      body(s)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("extension injects dot_product_double; the function evaluates in SQL") {
    withExtensionSession { s =>
      val got = s.sql(
        "SELECT dot_product_double(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      got shouldBe 11.0
    }
  }

  test("extension injects nfc_normalize; SQL output matches the Scala kernel") {
    withExtensionSession { s =>
      val got = s.sql(s"SELECT nfc_normalize('cafe\u0301 A\u030a') AS n")
        .collect().head.getString(0)
      got shouldBe "caf\u00e9 \u00c5"
    }
  }

  test("minhash_sig in SQL is bit-identical to the Scala pipeline's signatures") {
    val sqlSig = withExtensionSession { s =>
      s.sql("SELECT minhash_sig(array(7L, 99L, 12345L), 8, 42) AS sig")
        .collect().head.getSeq[Long](0)
    }
    val (as, bs) = graft.ops.Dedup.hashCoeffs(8, 42L)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val scalaSig = Seq(Seq(7L, 99L, 12345L)).toDF("xs")
      .select(VectorExpressions.minhashSig(col("xs"), as, bs, (1L << 61) - 1))
      .collect().head.getSeq[Long](0)
    sqlSig shouldBe scalaSig
  }

  test("simhash_sig in SQL matches the Dedup pipeline's signature") {
    withExtensionSession { s =>
      val sqlSig = s.sql("SELECT simhash_sig(array(42L)) AS s")
        .collect().head.getLong(0)
      sqlSig shouldBe 42L // single token: signature == the token hash
    }
  }

  test("injected builders enforce arity with a useful message") {
    withExtensionSession { s =>
      val ex = intercept[Exception] {
        s.sql("SELECT dot_product_double(array(1.0d))").collect()
      }
      ex.getMessage should include ("dot_product_double(arrayA, arrayB)")
    }
  }

  test("web-curation macros in SQL match the Scala Column chains bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val url = "HTTP://WWW.News.Example.COM:80/a//b/?b=2&utm_source=x&a=1#f"
    val html = "<p>Hello <b>world</b></p><script>x()</script>&amp;lt;"
    val (sqlCanon, sqlDom, sqlText) = withExtensionSession { s =>
      val r = s.sql(
        s"""SELECT canonical_url('$url') AS c,
           |       registrable_domain('news.example.com') AS d,
           |       strip_html('$html') AS t""".stripMargin).collect().head
      (r.getString(0), r.getString(1), r.getString(2))
    }
    val scala = Seq((url, html)).toDF("u", "h")
      .select(graft.ops.Web.canonicalUrl(col("u")),
        graft.ops.Web.registrableDomain(lit("news.example.com")),
        graft.ops.TextAnalysis.stripHtml(col("h")))
      .collect().head
    sqlCanon shouldBe scala.getString(0)
    sqlDom shouldBe scala.getString(1)
    sqlText shouldBe scala.getString(2)
    sqlCanon shouldBe "http://news.example.com/a/b?a=1&b=2"
  }
}
