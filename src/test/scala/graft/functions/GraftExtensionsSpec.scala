package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("extension injects dot_product_double; the function evaluates in SQL") {
    // wiring: the injector registers without error on a fresh extensions object
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // behavior: same builder registered into the live session's registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_double",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorExpressions.DotProductDouble(children.head, children(1)),
      "scala_udf")
    val got = spark.sql(
      "SELECT dot_product_double(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    got shouldBe 11.0
  }

  test("minhash_sig in SQL is bit-identical to the Scala pipeline's signatures") {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      (children: Seq[Expression]) => {
        val n = children(1).asInstanceOf[Literal].value.asInstanceOf[Int]
        val seed = children(2).asInstanceOf[Literal].value.asInstanceOf[Int].toLong
        val (as, bs) = graft.ops.Dedup.hashCoeffs(n, seed)
        VectorExpressions.MinHashSig(children.head, as, bs, (1L << 61) - 1)
      },
      "scala_udf")
    val sqlSig = spark.sql(
      "SELECT minhash_sig(array(7L, 99L, 12345L), 8, 42) AS sig")
      .collect().head.getSeq[Long](0)
    val (as, bs) = graft.ops.Dedup.hashCoeffs(8, 42L)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val scalaSig = Seq(Seq(7L, 99L, 12345L)).toDF("xs")
      .select(VectorExpressions.minhashSig(col("xs"), as, bs, (1L << 61) - 1))
      .collect().head.getSeq[Long](0)
    sqlSig shouldBe scalaSig
  }

  test("simhash_sig in SQL matches the Dedup pipeline's signature") {
    import org.apache.spark.sql.catalyst.expressions.Expression
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig",
      (children: Seq[Expression]) => VectorExpressions.SimHashSig(children.head),
      "scala_udf")
    val sqlSig = spark.sql("SELECT simhash_sig(array(42L)) AS s")
      .collect().head.getLong(0)
    sqlSig shouldBe 42L // single token: signature == the token hash
  }
}
