package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StringExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // every accent is spelled as an explicit \u escape — a literal accent
  // in source text is ambiguous about its normalization form
  test("nfc: composes combining sequences; already-normal text is unchanged") {
    val df = Seq(
      (1L, "cafe\u0301"), // e + combining acute -> precomposed e-acute
      (2L, "A\u030angstro\u0308m"), // A+ring, o+diaeresis compose
      (3L, "plain ascii"),
      (4L, "caf\u00e9") // already NFC
    ).toDF("id", "s")
    // functions.length is shadowed by the ScalaTest `length` matcher
    val len = org.apache.spark.sql.functions.length _
    val got = df.select(col("id"), StringExpressions.nfc(col("s")).as("n"),
        len(col("s")).as("lr"), len(StringExpressions.nfc(col("s"))).as("ln"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    got(1L) shouldBe (("caf\u00e9", 5, 4))
    got(2L) shouldBe (("\u00c5ngstr\u00f6m", 10, 8))
    got(3L) shouldBe (("plain ascii", 11, 11))
    got(4L) shouldBe (("caf\u00e9", 4, 4))
  }

  test("nfc: interpreted eval equals the codegen'd path") {
    // a filter on the expression forces it through codegen inside the
    // whole-stage pipeline; collecting the projection exercises eval
    val df = (0L to 99L).map(i => (i, s"e\u0301val$i")).toDF("id", "s")
    val viaFilter = df.filter(StringExpressions.nfc(col("s")) =!= col("s")).count()
    viaFilter shouldBe 100L
    val one = df.select(StringExpressions.nfc(col("s"))).limit(1).collect().head.getString(0)
    one shouldBe "\u00e9val0"
  }

  test("nfc: interpreted nullSafeEval directly (codegen fallback path)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // the DataFrame tests above run whole-stage codegen; Spark falls
    // back to this eval on codegen compile failure, so pin it directly
    def nfcEval(s: String) = StringExpressions.NfcNormalize(
      Literal(UTF8String.fromString(s), StringType)).eval(null)
    nfcEval("cafe\u0301").toString shouldBe "caf\u00e9"
    nfcEval("A\u030angstro\u0308m").toString shouldBe "\u00c5ngstr\u00f6m"
    // already-normalized fast path returns the INPUT instance, no re-encode
    val in = UTF8String.fromString("caf\u00e9")
    val fastPath = StringExpressions.NfcNormalize(Literal(in, StringType))
      .eval(null).asInstanceOf[AnyRef]
    fastPath should be theSameInstanceAs in
    val onNull = StringExpressions.NfcNormalize(Literal(null, StringType))
      .eval(null)
    (onNull == null) shouldBe true
  }

  test("nfc: nulls pass through") {
    val df = Seq((1L, null: String)).toDF("id", "s")
    df.select(StringExpressions.nfc(col("s"))).collect().head.isNullAt(0) shouldBe true
  }

  test("jaroWinkler: textbook values and the oracle-engine conventions") {
    import graft.functions.StringKernels.{jaroWinkler => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    jw(u("martha"), u("marhta")) shouldBe 0.9611111111111111
    jw(u("DWAYNE"), u("DUANE")) shouldBe 0.8400000000000001
    jw(u("DIXON"), u("DICKSONX")) shouldBe 0.8133333333333332
    // below the 0.7 boost threshold the prefix boost must NOT apply
    jw(u("sky"), u("soup")) shouldBe 0.5277777777777778
    // oracle-engine conventions: empty sides are 0 even when equal
    jw(u(""), u("")) shouldBe 0.0
    jw(u(""), u("abc")) shouldBe 0.0
    jw(u("abc"), u("abc")) shouldBe 1.0
  }

  test("jaroWinkler column runs codegen'd and null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("martha", "marhta"), ("abc", null), (null, "x"))
      .toDF("a", "b")
      .select(StringExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
    val rows = df.collect()
    rows(0).getDouble(0) shouldBe 0.9611111111111111
    rows(1).isNullAt(0) shouldBe true
    rows(2).isNullAt(0) shouldBe true
  }
}
