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
  /** Join-explosion preflight: BEFORE running an equi-join, estimate
    * its per-key output exactly from the two sides' key histograms —
    * `out_rows(k) = n_left(k) · n_right(k)` — and report the `topK`
    * hottest keys. The 3 AM incident this prevents ("the join that
    * output 400 B rows") is always one hot key on both sides; this is
    * the cheap diagnostic to run when a join's input sizes look sane
    * but the stage never finishes, and the measurement that decides
    * between a plain join, [[saltedJoin]], or dropping the key.
    *
    * Cost: two per-key count aggs (map-side combined) + a join of the
    * two HISTOGRAM frames (|keys| rows, not data rows) + a bounded
    * top-k heap (`TakeOrderedAndProject`) — strictly cheaper than the
    * join it predicts, by the output factor. Keys on one side only
    * produce 0 (inner-join contribution), still reported when they
    * make the heap — a 0-row hot key is how you notice a filter
    * already killed the explosion.
    * Output: (key, n_left, n_right, out_rows) — top `topK` by
    * out_rows, id-tiebroken for determinism.
    */
  def joinPreflight(left: DataFrame, right: DataFrame, keyCol: String,
                    topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be positive")
    val l = left.filter(col(keyCol).isNotNull)
      .groupBy(keyCol).agg(count(lit(1)).as("n_left"))
    val r = right.filter(col(keyCol).isNotNull)
      .groupBy(keyCol).agg(count(lit(1)).as("n_right"))
    l.join(r, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      // try_multiply, not `*`: under ANSI mode (Spark 4 default) a plain
      // product over ~9.2e18 (≈3e9 rows of one key on EACH side) would make
      // the diagnostic itself throw on exactly the explosion it exists to
      // detect. Saturate to Long.MaxValue instead so the pathological key is
      // REPORTED — and sorts first, where a diagnostic wants it.
      .withColumn("out_rows",
        coalesce(try_multiply(col("n_left"), col("n_right")), lit(Long.MaxValue)))
      .orderBy(col("out_rows").desc, col(keyCol))
      .limit(topK)
  }

  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 discriminator: Column, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val salted = skewed.withColumn("_salt", pmod(xxhash64(discriminator), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
