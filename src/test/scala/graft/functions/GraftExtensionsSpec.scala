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
}
