package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the similarity/dedup hot kernels.
  *
  * The declarative versions (`zip_with` + `aggregate`, `transform` +
  * `array_min`) are kept as reference implementations, but Spark's
  * higher-order functions evaluate interpreted — one lambda dispatch and
  * an allocation per element — which is the dominant cost when the
  * kernel sits inside an n² pair join. These expressions generate a
  * tight primitive loop instead (`doGenCode`), with `eval` fallback for
  * interpreted contexts. Arithmetic order is IDENTICAL to the HOF
  * versions (left-to-right fold from 0), so results are bit-identical —
  * verified by the oracle entries and unit tests.
  */
object VectorExpressions {

  /** dot(a, b) over two array<double> columns — Σ a[i]·b[i]. */
  case class DotProductDouble(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product_double"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // ctx.freshName for every local: when the same expression appears
        // twice in one whole-stage function (filter + projection), fixed
        // names collide and Janino rejects the compile ("Redefinition of
        // local variable"), silently dropping the stage to interpreted eval.
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** MinHash signature: for each j, min over xs of ((a_j·x + b_j) mod P).
    * One pass over the base hashes with a primitive accumulator row —
    * replaces numHashes interpreted `array_min(transform(...))` scans.
    */
  case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], prime: Long)
      extends UnaryExpression {

    require(as.length == bs.length)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val h  = as.length
      val acc = Array.fill(h)(Long.MaxValue)
      var i = 0
      val n = xs.numElements()
      while (i < n) {
        // null element ≡ hash 0 (matches UnsafeArrayData's zeroed null
        // slots, so interpreted and codegen paths agree)
        val x = if (xs.isNullAt(i)) 0L else xs.getLong(i)
        var j = 0
        while (j < h) {
          val v = java.lang.Math.floorMod(as(j) * x + bs(j), prime)
          if (v < acc(j)) acc(j) = v
          j += 1
        }
        i += 1
      }
      ArrayData.toArrayData(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
      nullSafeCodeGen(ctx, ev, xs => {
        // Fresh names — see DotProductDouble.doGenCode.
        val h   = ctx.freshName("h")
        val acc = ctx.freshName("acc")
        val n   = ctx.freshName("n")
        val i   = ctx.freshName("i")
        val j   = ctx.freshName("j")
        val x   = ctx.freshName("x")
        val v   = ctx.freshName("v")
        s"""
           |int $h = $asRef.length;
           |long[] $acc = new long[$h];
           |java.util.Arrays.fill($acc, Long.MAX_VALUE);
           |int $n = $xs.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $xs.isNullAt($i) ? 0L : $xs.getLong($i);
           |  for (int $j = 0; $j < $h; $j++) {
           |    long $v = java.lang.Math.floorMod($asRef[$j] * $x + $bsRef[$j], ${prime}L);
           |    if ($v < $acc[$j]) $acc[$j] = $v;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($acc);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** SimHash signature from an array of 64-bit token hashes: bit j of
    * the output is set iff Σ over tokens of (+1 if bit j of the token
    * hash is set, else −1) is > 0. One pass with a 64-counter
    * accumulator — replaces 64 interpreted `aggregate` scans (one per
    * bit) of the declarative rendering, which made signature
    * computation O(64·tokens) lambda dispatches per document and
    * dominated `q_simhash_pairs` (24.7 s at sf0.1, vs ~1 s with this
    * kernel). Empty array → 0L, matching `aggregate`'s zero fold.
    */
  case class SimHashSig(child: Expression) extends UnaryExpression
      with GraftBridge.ImplicitCastsFromTypes {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_sig"
    // rejects non-array input at analysis (and implicitly casts e.g.
    // array<int> up to array<long>) — the SQL-surfaced entry point must
    // not fall through to getLong on arbitrary bytes
    override def bridgeInputTypes: Seq[DataType] = Seq(ArrayType(LongType))

    // A null ELEMENT votes like hash 0 (all 64 bits unset -> −1 per
    // bit): this matches both the declarative reference (`when(bit===1)
    // .otherwise(-1)` is -1 for null) and UnsafeArrayData's zeroed null
    // slots — interpreted and codegen paths must agree.
    override protected def nullSafeEval(input: Any): Any = {
      val xs = input.asInstanceOf[ArrayData]
      val cnt = new Array[Int](64)
      val n = xs.numElements()
      var i = 0
      while (i < n) {
        val x = if (xs.isNullAt(i)) 0L else xs.getLong(i)
        var j = 0
        while (j < 64) {
          if (((x >>> j) & 1L) == 1L) cnt(j) += 1 else cnt(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (cnt(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, xs => {
        // Fresh names — see DotProductDouble.doGenCode.
        val cnt = ctx.freshName("cnt")
        val n   = ctx.freshName("n")
        val i   = ctx.freshName("i")
        val j   = ctx.freshName("j")
        val x   = ctx.freshName("x")
        val out = ctx.freshName("out")
        s"""
           |int[] $cnt = new int[64];
           |int $n = $xs.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $xs.isNullAt($i) ? 0L : $xs.getLong($i);
           |  for (int $j = 0; $j < 64; $j++) {
           |    if ((($x >>> $j) & 1L) == 1L) $cnt[$j]++; else $cnt[$j]--;
           |  }
           |}
           |long $out = 0L;
           |for (int $j = 0; $j < 64; $j++) {
           |  if ($cnt[$j] > 0) $out |= (1L << $j);
           |}
           |${ev.value} = $out;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sign-LSH band keys from an array<double> vector: bit p of the
    * signature is `sign(v · planes[p])`, packed into
    * `planes.length / bandBits` keys (bit j of key k is plane
    * `k·bandBits + j`). One kernel node with the plane matrix as a
    * REFERENCE OBJECT — the declarative rendering (one `dotD` node per
    * plane, each with a `dim`-literal array) put nPlanes·dim ≈ 4 096
    * literals into the plan, and ANALYSIS + codegen of that tree, not
    * execution, dominated every banded-LSH query at bench scale
    * (measured r9: the pair stage of q_semdedup_prod at 2 200 vectors
    * spent ~3.5 s/run almost entirely in planning). Arithmetic is the
    * same left-to-right dot fold as [[DotProductDouble]], so keys are
    * bit-identical to the per-plane rendering.
    */
  case class SignBandKeys(child: Expression, planes: Array[Array[Double]],
                          bandBits: Int)
      extends UnaryExpression {

    require(planes.nonEmpty && planes.length % bandBits == 0,
      "nPlanes must divide into bands")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "sign_band_keys"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val nPlanes = planes.length
      val keys = new Array[Long](nPlanes / bandBits)
      var p = 0
      while (p < nPlanes) {
        val row = planes(p)
        val n = math.min(v.numElements(), row.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * row(i); i += 1 }
        if (s >= 0) keys(p / bandBits) |= (1L << (p % bandBits))
        p += 1
      }
      ArrayData.toArrayData(keys)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("signPlanes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, v => {
        // Fresh names — see DotProductDouble.doGenCode.
        val keys = ctx.freshName("keys")
        val p    = ctx.freshName("p")
        val row  = ctx.freshName("row")
        val n    = ctx.freshName("n")
        val s    = ctx.freshName("s")
        val i    = ctx.freshName("i")
        s"""
           |long[] $keys = new long[${planes.length / bandBits}];
           |for (int $p = 0; $p < ${planes.length}; $p++) {
           |  double[] $row = $planesRef[$p];
           |  int $n = java.lang.Math.min($v.numElements(), $row.length);
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $s += $v.getDouble($i) * $row[$i]; }
           |  if ($s >= 0) $keys[$p / $bandBits] |= (1L << ($p % $bandBits));
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($keys);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`nprobe` IVF cells for an array<double> vector: indices of the
    * `nprobe` centroids with the highest cosine (score `dot/|c|` — the
    * vector's own norm is a common factor and cannot change the
    * ranking), ties to the lower index. One kernel node with the
    * centroid matrix as a REFERENCE OBJECT — the [[SignBandKeys]]
    * lesson: per-centroid literal arrays put nlist·dim literals into
    * the plan and analysis+codegen dominates, which is exactly what
    * stops `nlist` from scaling with the corpus. Selection is
    * `nprobe` repeated argmax scans (nprobe ≪ nlist), deterministic.
    */
  case class IvfCells(child: Expression, cents: Array[Array[Double]],
                      norms: Array[Double], nprobe: Int)
      extends UnaryExpression {

    require(cents.nonEmpty && cents.length == norms.length, "centroid/norm shape")
    require(nprobe >= 1 && nprobe <= cents.length, "1 <= nprobe <= nlist")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "ivf_cells"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val nlist = cents.length
      val sims = new Array[Double](nlist)
      var j = 0
      while (j < nlist) {
        val c = cents(j)
        val n = math.min(v.numElements(), c.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * c(i); i += 1 }
        sims(j) = if (norms(j) == 0.0) Double.NegativeInfinity else s / norms(j)
        j += 1
      }
      val out = new Array[Long](nprobe)
      var p = 0
      while (p < nprobe) {
        var best = -1
        var bs = Double.NegativeInfinity
        var k = 0
        while (k < nlist) {
          if (sims(k) > bs) { bs = sims(k); best = k }
          k += 1
        }
        out(p) = best.toLong
        sims(best) = Double.NegativeInfinity
        p += 1
      }
      ArrayData.toArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val normsRef = ctx.addReferenceObj("ivfNorms", norms, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val sims = ctx.freshName("sims")
        val outA = ctx.freshName("outA")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val i = ctx.freshName("i")
        val p = ctx.freshName("p")
        val best = ctx.freshName("best")
        val bs = ctx.freshName("bs")
        val k = ctx.freshName("k")
        s"""
           |double[] $sims = new double[${cents.length}];
           |for (int $j = 0; $j < ${cents.length}; $j++) {
           |  double[] $c = $centsRef[$j];
           |  int $n = java.lang.Math.min($v.numElements(), $c.length);
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $s += $v.getDouble($i) * $c[$i]; }
           |  $sims[$j] = $normsRef[$j] == 0.0
           |    ? java.lang.Double.NEGATIVE_INFINITY : $s / $normsRef[$j];
           |}
           |long[] $outA = new long[$nprobe];
           |for (int $p = 0; $p < $nprobe; $p++) {
           |  int $best = -1;
           |  double $bs = java.lang.Double.NEGATIVE_INFINITY;
           |  for (int $k = 0; $k < ${cents.length}; $k++) {
           |    if ($sims[$k] > $bs) { $bs = $sims[$k]; $best = $k; }
           |  }
           |  $outA[$p] = (long) $best;
           |  $sims[$best] = java.lang.Double.NEGATIVE_INFINITY;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($outA);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def dotD(a: Column, b: Column): Column =
    GraftBridge.column(DotProductDouble(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def minhashSig(xs: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(xs), as, bs, prime))

  def simhashSig(xs: Column): Column =
    GraftBridge.column(SimHashSig(GraftBridge.expression(xs)))

  def signBandKeys(v: Column, planes: Array[Array[Double]], bandBits: Int): Column =
    GraftBridge.column(SignBandKeys(GraftBridge.expression(v), planes, bandBits))

  def ivfCells(v: Column, cents: Array[Array[Double]], norms: Array[Double],
               nprobe: Int): Column =
    GraftBridge.column(IvfCells(GraftBridge.expression(v), cents, norms, nprobe))
}
