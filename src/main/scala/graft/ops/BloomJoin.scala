package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

/** Semi-join reduction: prune the BIG side of an equi-join with a Bloom
  * filter built from the small side's keys, BEFORE the big side enters
  * its shuffle.
  *
  * When to reach for it at 100 TB:
  *   - the small side is too large (or too late-materializing) for a
  *     broadcast hash join, but its KEY SET fits a bitset;
  *   - the join is selective — most big-side rows have no partner —
  *     so the exchange volume, not the join CPU, is the bottleneck.
  *
  * Exactness: the filter admits false positives (bounded by the
  * bits-per-key budget) and never false negatives; the equi-join after
  * it re-checks every surviving row, so output equals the unpruned
  * join row-for-row. The oracle entry (`q_bloom_join`) pins that.
  */
object BloomJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, with the big side
    * bloom-pruned first. `expectedKeys` sizes the bitset (count the
    * small side beforehand, or pass an upper bound — oversizing only
    * costs bitset bytes, undersizing only raises the FP rate).
    */
  def prunedJoin(big: DataFrame, small: DataFrame, key: String,
                 expectedKeys: Long, bitsPerKey: Int = 10): DataFrame = {
    val (bits, k) = BloomExpressions.buildBloom(small, key, expectedKeys, bitsPerKey)
    val pruned = big.filter(
      BloomExpressions.mightContain(xxhash64(col(key)), bits, k))
    pruned.join(small, key)
  }
}
