package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Product-quantization kernels (Jégou, Douze, Schmid — "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): a vector is
  * split into M subvectors, each quantized to one of K codebook
  * centroids, so a dim-D float vector compresses to M code indices.
  * With M ≤ 8 and K ≤ 256 the whole code packs into ONE BIGINT — a
  * 64-dim float corpus (256 B/row + array headers) becomes 8 B/row,
  * which is the difference between a corpus that fits executor memory
  * and one that doesn't, and an 8-byte shuffle payload per row instead
  * of a 256-byte array.
  *
  * Scoring uses ADC (asymmetric distance computation): the QUERY stays
  * exact; per query a lookup table of subvector·centroid partial dots
  * is built ONCE (M·K dot products), after which each corpus candidate
  * scores in M table lookups — not D multiplies. Both kernels are
  * codegen'd with `ctx.freshName` locals (the r2 collision lesson).
  */
object PqExpressions {

  /** Encode an `array<double>` vector to a packed PQ code: for each of
    * M subspaces, the index (< K) of the L2-nearest codebook centroid,
    * packed little-endian in 8-bit lanes of one long. `codebook` layout:
    * `[m][k][d]` flattened, length M·K·dsub.
    */
  case class PqEncode(child: Expression, codebook: Array[Double],
                      m: Int, k: Int, dsub: Int)
      extends UnaryExpression {
    require(m >= 1 && m <= 8, "M subspaces must pack into one long (M <= 8)")
    require(k >= 2 && k <= 256, "K centroids per subspace must fit 8 bits")
    require(codebook.length == m * k * dsub, "codebook is [m][k][dsub] flattened")

    override def dataType: DataType = LongType
    override def prettyName: String = "pq_encode"

    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      var code = 0L
      var mi = 0
      while (mi < m) {
        var best = 0; var bestD = Double.MaxValue
        var ki = 0
        while (ki < k) {
          var d2 = 0.0; var di = 0
          val base = (mi * k + ki) * dsub
          while (di < dsub) {
            val diff = v.getDouble(mi * dsub + di) - codebook(base + di)
            d2 += diff * diff; di += 1
          }
          if (d2 < bestD) { bestD = d2; best = ki }
          ki += 1
        }
        code |= best.toLong << (8 * mi)
        mi += 1
      }
      code
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      nullSafeCodeGen(ctx, ev, v => {
        val code = ctx.freshName("code")
        val mi = ctx.freshName("mi"); val ki = ctx.freshName("ki")
        val di = ctx.freshName("di"); val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD"); val d2 = ctx.freshName("d2")
        val base = ctx.freshName("base"); val diff = ctx.freshName("diff")
        s"""
           |long $code = 0L;
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  int $best = 0; double $bestD = Double.MAX_VALUE;
           |  for (int $ki = 0; $ki < $k; $ki++) {
           |    double $d2 = 0.0;
           |    int $base = ($mi * $k + $ki) * $dsub;
           |    for (int $di = 0; $di < $dsub; $di++) {
           |      double $diff = $v.getDouble($mi * $dsub + $di) - $cb[$base + $di];
           |      $d2 += $diff * $diff;
           |    }
           |    if ($d2 < $bestD) { $bestD = $d2; $best = $ki; }
           |  }
           |  $code |= ((long) $best) << (8 * $mi);
           |}
           |${ev.value} = $code;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC score from a per-query lookup table: `left` is the LUT
    * (`array<double>` of length M·K, entry m·K+k = q_m · c_{m,k}),
    * `right` the packed code. Approximate dot(q, x) in M lookups.
    */
  case class PqAdcDot(left: Expression, right: Expression, m: Int, k: Int)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_dot"

    override protected def nullSafeEval(lut: Any, code: Any): Any = {
      val t = lut.asInstanceOf[ArrayData]
      val c = code.asInstanceOf[Long]
      var s = 0.0
      var mi = 0
      while (mi < m) {
        s += t.getDouble(mi * k + ((c >>> (8 * mi)) & 0xFF).toInt)
        mi += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (lut, code) => {
        val s = ctx.freshName("s")
        val mi = ctx.freshName("mi")
        s"""
           |double $s = 0.0;
           |for (int $mi = 0; $mi < $m; $mi++) {
           |  $s += $lut.getDouble($mi * $k + (int)(($code >>> (8 * $mi)) & 0xFFL));
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def pqEncode(v: Column, codebook: Array[Double], m: Int, k: Int, dsub: Int): Column =
    GraftBridge.column(PqEncode(GraftBridge.expression(v), codebook, m, k, dsub))

  def pqAdcDot(lut: Column, code: Column, m: Int, k: Int): Column =
    GraftBridge.column(PqAdcDot(GraftBridge.expression(lut), GraftBridge.expression(code), m, k))
}
