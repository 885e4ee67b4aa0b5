package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guards for CPU-dense per-row stages (r12 probe finding).
  *
  * Scan parallelism is a function of FILE BYTES (`maxPartitionBytes`,
  * row-group boundaries), but several operator families run work per
  * row that is orders of magnitude denser than the bytes suggest:
  * banded-DP verification behind a blocked join, O(nlist·d) centroid
  * assignment, 64-plane signature folds, per-vector projections,
  * whole-document tokenization. A corpus that fits one parquet
  * row-group scans as ONE partition, and everything between the scan
  * and the first shuffle — including broadcast-join fanout that AQE
  * cannot see (it sizes by scan bytes, not post-join rows) — runs on
  * one core. Measured on the fair 10× corpus: a single task ground
  * banded levenshtein for 15+ minutes while 31 cores idled.
  *
  * The guard: when the INPUT scans narrower than the session's shuffle
  * width, round-robin the dense frame out once. Properties that make
  * this safe and cheap:
  *   - one exchange of the bounded frame, paid only when the scan is
  *     narrow — on a real-scale corpus (wide scan) it is a NO-OP and
  *     adds no exchange;
  *   - `repartition(n)` with an explicit n is preserved by AQE (never
  *     coalesced back down by byte size);
  *   - round-robin repartition is deterministic (Spark sorts partitions
  *     locally before distributing, for retry determinism), and no
  *     operator in this library depends on input ROW ORDER anyway —
  *     codebook/centroid training samples are `orderBy(id).limit(n)`,
  *     deterministic under any partitioning.
  */
object Par {

  /** Spread `dense` to the session shuffle width when `input`'s scan
    * gives fewer partitions; identity otherwise. `input` is the frame
    * whose SCAN sets the inherited parallelism (usually the operator's
    * raw input), `dense` the derived frame about to do per-row work.
    */
  def spreadToShuffleWidth(dense: DataFrame, input: DataFrame): DataFrame = {
    val width = dense.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (input.rdd.getNumPartitions >= width) dense else dense.repartition(width)
  }
}
