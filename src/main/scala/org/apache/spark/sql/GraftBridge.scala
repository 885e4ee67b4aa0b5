package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion —
  * the standard escape hatch for libraries that ship custom Catalyst
  * expressions (Spark 4 moved `Column` to a node-based API; classic
  * conversions live in `org.apache.spark.sql.classic.ExpressionUtils`).
  */
object GraftBridge {
  def column(e: Expression): Column     = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column→Expression conversion: walks the ColumnNode tree NOW
    * (via the classic converter) instead of wrapping it in a lazy
    * `ColumnNodeExpression` that only the Dataset API ever expands —
    * required when a Column-built tree must be returned from an
    * `injectFunction` builder into the SQL analyzer, which never runs
    * the node converter itself.
    */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** `AbstractDataType` is `private[sql]`; expressions outside this
    * package that want `ImplicitCastInputTypes` (analysis-time type
    * validation + implicit upcasts, e.g. array<int> → array<long>) mix
    * in this trait and override `bridgeInputTypes` instead.
    */
  trait ImplicitCastsFromTypes
      extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    def bridgeInputTypes: Seq[org.apache.spark.sql.types.DataType]
    override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
      bridgeInputTypes
  }
}
