package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftBridge}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom filter build + probe for semi-join reduction.
  *
  * The 100 TB play: when a join's small side fits a few hundred KB of
  * bitset but NOT a broadcast hash table, build a Bloom filter over the
  * small side's join keys (one partial-aggregatable pass), ship the
  * bitset to every task, and filter the big side BEFORE its shuffle —
  * rows that cannot have a match never enter the exchange. False
  * positives only cost wasted shuffle volume; the join itself
  * re-verifies every surviving row, so results are exact by
  * construction. This is the user-facing rendering of the engine-
  * internal runtime filters Spark injects under AQE; making it explicit
  * lets a pipeline build the filter ONCE and reuse it across many
  * queries (the recurring-ETL shape, where the dim subset is stable).
  *
  * Determinism: both sides hash with `xxhash64` (Spark's codegen'd
  * 64-bit hash) and derive the k probe positions by double hashing
  * (Kirsch–Mitzenmacher: h_i = h1 + i·h2), so a filter built in one
  * session matches probes in another. `m` is forced to a power of two
  * so index reduction is a mask, not a Java `%` (which is negative-
  * hostile and slower).
  */
object BloomExpressions {

  /** Number of hash probes for a given bits-per-key budget (k = ln2 · b,
    * clamped to [1, 16]).
    */
  def numHashes(bitsPerKey: Int): Int =
    math.max(1, math.min(16, math.round(0.6931472 * bitsPerKey).toInt))

  /** Smallest power-of-two bit count >= expectedKeys * bitsPerKey
    * (min 1024 bits, max 2^30 — 128 MB of bitset is past the point
    * where a real broadcast join wins).
    */
  def numBits(expectedKeys: Long, bitsPerKey: Int): Int = {
    val want = math.max(1024L, expectedKeys * bitsPerKey)
    require(want <= (1L << 30), s"bloom filter of $want bits — use a broadcast join instead")
    java.lang.Long.highestOneBit(math.max(1024L, want * 2 - 1)).toInt
  }

  private def mix(x: Long): Long = {
    // splitmix64 finalizer — decorrelates h2 from h1
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits of `hash` in `bits` (mutates). */
  private[graft] def setBits(bits: Array[Long], hash: Long, k: Int): Unit = {
    val mask = bits.length * 64 - 1
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < k) {
      val idx = (h & Long.MaxValue) & mask
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      h += h2
      i += 1
    }
  }

  private[graft] def testBits(bits: Array[Long], hash: Long, k: Int): Boolean = {
    val mask = bits.length * 64 - 1
    val h2 = mix(hash) | 1L
    var i = 0
    var h = hash
    while (i < k) {
      val idx = (h & Long.MaxValue) & mask
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  /** Partial-aggregatable Bloom build over pre-hashed keys
    * (`xxhash64(key)` rows in, one `Array[Long]` bitset out; merge is a
    * bitwise OR). Map-side partials mean the shuffle carries one bitset
    * per task, never the keys.
    */
  class BloomAgg(nBits: Int, k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(Integer.bitCount(nBits) == 1 && nBits >= 64, "nBits must be a power of two >= 64")
    override def zero: Array[Long] = new Array[Long](nBits / 64)
    override def reduce(b: Array[Long], hash: Long): Array[Long] = {
      setBits(b, hash, k); b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** `bits` probe of a pre-hashed key — a codegen'd k-probe bit test
    * (the bitset rides the generated class as a reference object, so
    * executors see it once per task, not once per row).
    */
  case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override protected def nullSafeEval(input: Any): Any =
      testBits(bits, input.asInstanceOf[Long], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      nullSafeCodeGen(ctx, ev, x => {
        val mask = bits.length * 64 - 1
        val h  = ctx.freshName("h")
        val h2 = ctx.freshName("h2")
        val z  = ctx.freshName("z")
        val i  = ctx.freshName("i")
        val idx = ctx.freshName("idx")
        val hit = ctx.freshName("hit")
        s"""
           |long $z = $x + 0x9E3779B97F4A7C15L;
           |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |long $h2 = ($z ^ ($z >>> 31)) | 1L;
           |long $h = $x;
           |boolean $hit = true;
           |for (int $i = 0; $i < $k; $i++) {
           |  long $idx = ($h & Long.MAX_VALUE) & ${mask}L;
           |  if (($bitsRef[(int)($idx >>> 6)] & (1L << ($idx & 63))) == 0L) { $hit = false; break; }
           |  $h += $h2;
           |}
           |${ev.value} = $hit;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Build the bitset from a frame's key column. The returned array is
    * the only thing collected to the driver — `nBits/8` bytes,
    * independent of row count.
    */
  def buildBloom(df: org.apache.spark.sql.DataFrame, keyCol: String,
                 expectedKeys: Long, bitsPerKey: Int = 10): (Array[Long], Int) = {
    val nBits = numBits(expectedKeys, bitsPerKey)
    val k = numHashes(bitsPerKey)
    val agg = udaf(new BloomAgg(nBits, k), Encoders.scalaLong)
    val bits = df.select(xxhash64(col(keyCol)).as("h"))
      .agg(agg(col("h")).as("bits"))
      .head().getSeq[Long](0).toArray
    (bits, k)
  }

  def mightContain(hashed: Column, bits: Array[Long], k: Int): Column =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(hashed), bits, k))
}
