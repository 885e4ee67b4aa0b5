package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join: the structural answer to a HOT KEY whose rows
  * exceed one shuffle partition (the viral-track / null-bucket / power-
  * law shape at 100 TB).
  *
  * AQE's skew-join split only rescues sort-merge joins whose skewed
  * side can be sub-split by file offsets; salting works for ANY join
  * shape and composes with bucketing. Mechanics: the skewed side gets a
  * deterministic salt in [0, salts) hashed from a per-row discriminator
  * column, the dim side is replicated once per salt value, and the join
  * key becomes (key, salt) — the hot key's rows now spread over `salts`
  * shuffle partitions instead of serializing one task.
  *
  * Correctness is salt-independent by construction: every skewed row
  * joins exactly the one dim replica carrying its salt, so the output
  * is row-for-row the plain join (pinned by the `q_salted_join` oracle
  * entry). The price is a `salts`× blow-up of the REPLICATED side's
  * shuffle volume — use for genuinely small dims (or pair with
  * `BloomJoin` to shrink the skewed side first).
  */
object SkewJoin {

  /** Inner equi-join `skewed ⋈ dim` on `key`, with the skewed side
    * spread over `salts` sub-partitions per key. `discriminator` is any
    * column whose values vary within a hot key (an event id, an offset
    * — uniqueness not required, variety is what spreads rows).
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val salted = skewed.withColumn("_salt", pmod(xxhash64(discriminator), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
