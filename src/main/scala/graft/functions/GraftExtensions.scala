package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` hook exposing the engine's custom Catalyst
  * expressions to SQL users:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *   SELECT dot_product_double(a.v, b.v) FROM ...
  * }}}
  *
  * (Scala callers use `VectorExpressions.dotD` directly; this makes the
  * same codegen'd kernel reachable from pure-SQL workloads.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_double"),
      new ExpressionInfo(classOf[VectorExpressions.DotProductDouble].getName,
        "dot_product_double"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_double(arrayA, arrayB)")
        VectorExpressions.DotProductDouble(children.head, children(1))
      }))
  }
}
