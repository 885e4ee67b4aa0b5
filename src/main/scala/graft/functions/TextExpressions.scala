package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels.
  *
  * [[WordShingles]] exists for a PLAN-SHAPE reason, not raw loop speed:
  * the declarative rendering (`transform(sequence(...), i ->
  * concat_ws(element_at(toks, i), …))`) is a large expression tree that
  * optimizer rules love to SUBSTITUTE into other operators — predicate
  * pushdown through the defining projection and
  * `InferFiltersFromGenerate` both inline it, and once inlined, the
  * `toks` child (itself a `split(lower(text))`) is re-evaluated PER
  * LAMBDA ELEMENT: measured ~30-50 s to shingle 4,500 mid-size docs at
  * n = 8, entirely spent re-splitting documents inside a pushed-down
  * filter. A single compact expression node evaluates its child once
  * per row wherever the optimizer moves it, by construction.
  * Semantics are identical to
  * `array_distinct(transform(...concat_ws(" ", …)))`: first-occurrence
  * order, space-joined, only defined for non-null token elements.
  */
object TextExpressions {

  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "shingle size must be positive")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    private val sep = UTF8String.fromString(" ")

    override protected def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val len = toks.numElements()
      if (len < n) return new GenericArrayData(Array.empty[Any])
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray().asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def wordShingles(toks: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(toks), n))
}
