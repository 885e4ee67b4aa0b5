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

  /** Clipped char-n-gram overlap m_n = Σ_g min(cf_g, rf_g) for
    * n = 1..maxN, computed per ROW — the chrF primitive done where the
    * data already lives. The cand/ref pair is colocated on one row by
    * construction, so exploding both sides into an (id, n, gram)
    * shuffle-agg (the token-BLEU plan, right for CORPUS rollups)
    * multiplies 6 gram slots per char into ~18M exploded rows at
    * sf0.1 and paid ~18 s in two hash aggs; this node streams the
    * ref grams into a reused hash map and clips the cand grams
    * against it — one pass per order, zero shuffles.
    * Output: struct<len_cand, len_ref, m: array<long>> — the lengths
    * ride along so the caller references the (stripped) input strings
    * exactly once; consume through a Generate barrier
    * (`explode(array(...))`) so CollapseProject can never inline the
    * kernel once per downstream field reference (measured: the inlined
    * rendering re-evaluated it 6× — 11.5 s vs ~2 s behind the barrier).
    */
  case class ClippedCharGramCounts(left: Expression, right: Expression,
                                   maxN: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    require(maxN >= 1, "maxN must be positive")

    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    override def dataType: DataType = StructType(Seq(
      StructField("len_cand", LongType, nullable = false),
      StructField("len_ref", LongType, nullable = false),
      StructField("m", ArrayType(LongType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "clipped_char_gram_counts"

    // code-point start offsets of s, plus the end sentinel — grams are
    // then O(1)-indexed String.substring slices. (UTF8String.substringSQL
    // re-walks the byte array from position 0 on EVERY call — O(L²) per
    // row per order, measured as 10 of q_chrf's 21 s.)
    private def cpOffsets(s: String): Array[Int] = {
      val out = new Array[Int](s.codePointCount(0, s.length) + 1)
      var idx = 0
      var i = 0
      while (i < s.length) {
        out(idx) = i
        idx += 1
        i = Character.offsetByCodePoints(s, i, 1)
      }
      out(idx) = s.length
      out
    }

    override protected def nullSafeEval(cand: Any, ref: Any): Any = {
      val c = cand.asInstanceOf[UTF8String].toString
      val r = ref.asInstanceOf[UTF8String].toString
      val cOff = cpOffsets(c); val rOff = cpOffsets(r)
      val cLen = cOff.length - 1; val rLen = rOff.length - 1
      val out = new Array[Any](maxN)
      val counts = new java.util.HashMap[String, Array[Int]]()
      var n = 1
      while (n <= maxN) {
        counts.clear()
        var i = 0
        while (i <= rLen - n) {
          val g = r.substring(rOff(i), rOff(i + n))
          val slot = counts.get(g)
          if (slot == null) counts.put(g, Array(1)) else slot(0) += 1
          i += 1
        }
        var m = 0L
        i = 0
        while (i <= cLen - n) {
          val slot = counts.get(c.substring(cOff(i), cOff(i + n)))
          if (slot != null && slot(0) > 0) { slot(0) -= 1; m += 1L }
          i += 1
        }
        out(n - 1) = m
        n += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](cLen.toLong, rLen.toLong, new GenericArrayData(out)))
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def clippedCharGramCounts(cand: Column, ref: Column, maxN: Int): Column =
    GraftBridge.column(ClippedCharGramCounts(
      GraftBridge.expression(cand), GraftBridge.expression(ref), maxN))

  /** [[ClippedCharGramCounts]] for TOKEN-array pairs — the BLEU/ROUGE
    * primitive m_n = Σ_g min(cf_g, rf_g) per order, computed on the
    * row where the pair already lives. Replaces the side-tagged
    * explode→(id,n,gram)-agg lattice for the PER-PAIR metrics: that
    * plan shuffled ~8 gram slots per token through two hash aggs
    * (right only when a corpus-pooled rollup needs the grams
    * distributed — and even the pooled BLEU only needs the per-pair
    * m/t SUMS, one 1-row agg over this node's output). Gram keys join
    * tokens with a space (unambiguous for whitespace-split tokens —
    * the oracle's own key form); only defined for non-null token
    * elements, the [[WordShingles]] caveat.
    * Output: struct<len_cand, len_ref, m: array<long>> — consume via a
    * Generate barrier like the char twin.
    */
  case class ClippedTokenGramCounts(left: Expression, right: Expression,
                                    maxN: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    require(maxN >= 1, "maxN must be positive")

    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    override def dataType: DataType = StructType(Seq(
      StructField("len_cand", LongType, nullable = false),
      StructField("len_ref", LongType, nullable = false),
      StructField("m", ArrayType(LongType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "clipped_token_gram_counts"

    private def gram(toks: Array[String], i: Int, n: Int): String = {
      if (n == 1) return toks(i)
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      sb.toString
    }

    override protected def nullSafeEval(cand: Any, ref: Any): Any = {
      def strs(a: Any): Array[String] = {
        val arr = a.asInstanceOf[ArrayData]
        val out = new Array[String](arr.numElements())
        var i = 0
        while (i < out.length) { out(i) = arr.getUTF8String(i).toString; i += 1 }
        out
      }
      val c = strs(cand); val r = strs(ref)
      val out = new Array[Any](maxN)
      val counts = new java.util.HashMap[String, Array[Int]]()
      var n = 1
      while (n <= maxN) {
        counts.clear()
        var i = 0
        while (i <= r.length - n) {
          val g = gram(r, i, n)
          val slot = counts.get(g)
          if (slot == null) counts.put(g, Array(1)) else slot(0) += 1
          i += 1
        }
        var m = 0L
        i = 0
        while (i <= c.length - n) {
          val slot = counts.get(gram(c, i, n))
          if (slot != null && slot(0) > 0) { slot(0) -= 1; m += 1L }
          i += 1
        }
        out(n - 1) = m
        n += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](c.length.toLong, r.length.toLong, new GenericArrayData(out)))
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def clippedTokenGramCounts(cand: Column, ref: Column, maxN: Int): Column =
    GraftBridge.column(ClippedTokenGramCounts(
      GraftBridge.expression(cand), GraftBridge.expression(ref), maxN))
}
