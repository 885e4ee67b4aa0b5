package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketching with a DETERMINISTIC estimate.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value to
  * a uniform point in [0, 2⁵²) and keep only the k smallest DISTINCT
  * hashes per group. If the k-th smallest hash is h_k, the distinct
  * count estimate is (k−1) · 2⁵² / h_k — the classic order-statistics
  * estimator; with fewer than k distinct hashes the sketch IS the
  * distinct set and the count is exact.
  *
  * Why this over `countDistinct` at 100 TB: exact distinct shuffles one
  * row per distinct value per group; the KMV buffer is ≤ k longs, the
  * merge (union, keep k smallest) is associative and commutative, so
  * the whole computation is one map-side-combined hash agg whose
  * exchange traffic is k·|groups| longs — independent of cardinality.
  * Why this over `approx_count_distinct` (HLL): same scale posture, but
  * the KMV estimate is a pure function of the value SET via md5 — no
  * engine-private hash, so a DuckDB oracle reproduces it bit-for-bit,
  * and two sketches built by different engines can be merged.
  *
  * Determinism contract: the hash is the top 13 hex chars of
  * `md5(value)` (52 bits — small enough that `(k−1)·2⁵²` stays inside
  * BIGINT for k ≤ 2047), the estimate uses integer division, and a
  * duplicate value maps to the SAME hash so multiplicity never matters.
  */
object Sketch {

  /** Bits of the hash domain (13 hex chars). */
  val HashBits = 52
  private val HashDomain = 1L << HashBits

  /** Bounded KMV buffer: a sorted array of ≤ k distinct hash values.
    * `reduce` inserts only when the hash beats the current k-th minimum
    * (or the buffer is not yet full); `merge` is a sorted-array union
    * truncated to k. Both keep the buffer sorted so the common case —
    * a hash above the k-th minimum — is one comparison.
    */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k >= 2 && k <= 2047, "2 <= k <= 2047 (estimator + BIGINT bound)")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], hv: Long): Array[Long] = {
      if (buf.length == k && hv >= buf(k - 1)) buf
      else {
        val i = java.util.Arrays.binarySearch(buf, hv)
        if (i >= 0) buf // already present — KMV is duplicate-insensitive
        else {
          val at = -i - 1
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, at)
          out(at) = hv
          System.arraycopy(buf, at, out, at + 1, n - at - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
          else { val v = b(j); j += 1; v }
        if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    /** Exact when the sketch is not full; (k−1)·2⁵² div h_k otherwise. */
    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else (k - 1).toLong * HashDomain / buf(k - 1)

    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** The 52-bit md5 point for `c`, the hash both engines share:
    * Spark `conv(substr(md5(c), 1, 13), 16, 10)`, DuckDB
    * `('0x' || substr(md5(c), 1, 13))::BIGINT`. Null values hash to
    * null and are ignored by the aggregation (distinct-of-non-null,
    * `countDistinct` semantics).
    */
  def kmvHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 13), 16, 10).cast("long")

  /** Approximate distinct `valueCol` per `groupCol`:
    * (group, est_distinct). One hash agg, ≤ k longs of state per group.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    val agg = udaf(new KmvAgg(k))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("group_key"), kmvHash(col(valueCol)).as("hv"))
      .groupBy("group_key")
      .agg(agg(col("hv")).as("est_distinct"))
  }

  /** [[KmvAgg]] with the BUFFER as the result: the sorted ≤ k smallest
    * distinct hashes, as an `array<bigint>` column — the mergeable
    * sketch itself, for persistence and set algebra ([[kmvOverlap]]).
    */
  class KmvBufAgg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    private val inner = new KmvAgg(k)
    override def zero: Array[Long] = inner.zero
    // negative = null sentinel (md5-52-bit points are non-negative):
    // lets callers that must keep null rows in the agg frame (e.g.
    // Profile.colStatsState counting rows AND sketching one pass) pass
    // coalesce(hv, -1) instead of pre-filtering
    override def reduce(buf: Array[Long], hv: Long): Array[Long] =
      if (hv < 0) buf else inner.reduce(buf, hv)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** (group_key, sketch) — one KMV sketch per group, built by the same
    * bounded hash agg as [[kmvDistinct]].
    */
  def kmvSketches(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    val agg = udaf(new KmvBufAgg(k))
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("group_key"), kmvHash(col(valueCol)).as("hv"))
      .groupBy("group_key")
      .agg(agg(col("hv")).as("sketch"))
  }

  /** The order-statistics estimate recomputed declaratively from a
    * sketch array — the Column twin of [[KmvAgg.finish]].
    */
  def kmvEstimate(sketch: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    // `div` = IntegralDivide: (k−1)·2⁵² exceeds 2⁵³, so double `/` + cast
    // would round — BIGINT div is the only exact (and oracle-matching) path
    val kk = lit((k - 1).toLong * HashDomain)
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(call_function("div", kk, element_at(sketch, k)).cast("long"))
  }

  /** Approximate quantiles from a DETERMINISTIC bottom-k-by-hash row
    * sample — the numeric companion to the KMV distinct sketch for
    * incremental / cross-engine profiling. The k rows with the
    * smallest `(md5(key), key)` form an order-independent uniform row
    * sample (each row's membership depends only on its key), so the
    * same call on any engine, any partitioning, any day picks the SAME
    * rows; quantiles are then type-1 (discrete) selections over the
    * sample — actual data values, no interpolation floats.
    *
    * Mergeable by construction: the k smallest hashes of a union live
    * inside the union of each part's k smallest, so per-batch samples
    * re-cut to k compose exactly like KMV sketches (same argument as
    * [[kmvOverlap]]'s union sketch).
    *
    * Output: one row per requested p: (p, n_sample, value).
    *
    * Scale posture: the sample is `TakeOrderedAndProject` — a bounded
    * k-heap per partition, k rows to the final cut, nothing resembling
    * a global sort of the data. The quantile selection then runs on k
    * rows. Contrast `approxQuantile`'s Greenwald–Khanna: similar cost,
    * but its sketch is engine-private and run-order dependent —
    * useless for a cross-engine parity gate or persisted state.
    * Sampling error is the classic order-statistic bound (±O(1/√k)
    * quantile rank error); k = 4096 holds every p to ~±1.5 rank points.
    */
  def hashSampleQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                          ps: Seq[Double], k: Int = 4096): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), "each p in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val key = col(keyCol); val v = col(valueCol)
    val sample = df.filter(key.isNotNull && v.isNotNull)
      .select(key.as("_k"), v.as("_v"))
      .withColumn("_h", md5(col("_k").cast("string").cast("binary")))
      .orderBy(col("_h"), col("_k"))
      .limit(k)
    val ranked = sample
      .withColumn("_rn", row_number().over(Window.orderBy(col("_v"))))
      .withColumn("_n", count(lit(1)).over())
    ranked
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("_rn") === ceil(col("p") * col("_n")))
      .select(col("p"), col("_n").cast("long").as("n_sample"),
        col("_v").as("value"))
  }

  /** Pairwise distinct-overlap estimation between groups (sources,
    * snapshots, shards) by KMV set algebra — "how many distinct user
    * ids do source A and source B share" WITHOUT ever shuffling the
    * values: the k smallest hashes of A ∪ B are always contained in
    * sketch(A) ∪ sketch(B), so a union sketch merges from the two
    * k-arrays alone, and the intersection follows by
    * inclusion–exclusion (clamped at 0). When the merged array holds
    * fewer than k hashes all three sketches were exact and so are the
    * reported counts.
    *
    * Output: (group_a, group_b, est_a, est_b, est_union, est_inter),
    * group_a < group_b — all BIGINT, integer-div estimates, no floats.
    *
    * Scale posture: the data-sized work is [[kmvSketches]]'s bounded
    * hash agg (k longs of exchange per group); the pair algebra is a
    * self-join of the |groups|-row sketch frame — |groups|²·k array
    * cells, data-size independent. The exact alternative (distinct
    * values co-shuffled per group pair) moves the corpus; this moves
    * kilobytes.
    */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
                 k: Int = 64): DataFrame = {
    // both join sides derive from the same data-sized agg — cache the
    // |groups|-row sketch frame so the corpus scans once, not twice
    val sk = kmvSketches(df, groupCol, valueCol, k).cache()
    val a = sk.select(col("group_key").as("group_a"), col("sketch").as("_sa"))
    val b = sk.select(col("group_key").as("group_b"), col("sketch").as("_sb"))
    val u = slice(array_sort(array_union(col("_sa"), col("_sb"))), 1, k)
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("est_a", kmvEstimate(col("_sa"), k))
      .withColumn("est_b", kmvEstimate(col("_sb"), k))
      .withColumn("est_union", kmvEstimate(u, k))
      .select(col("group_a"), col("group_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_inter"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) with a
    * deterministic md5 hash family, built AND queried in one pass
    * shape: `depth` seeded buckets per row stack map-side (explode over
    * the constant seed range — no shuffle until the agg), the sketch is
    * the (depth × width)-cell count grid (one bounded hash agg, cells
    * add under union — mergeable across shards/streams like [[KmvAgg]]),
    * and each key's estimate is the MIN over its `depth` cells (never
    * under the true count; over-counts come from bucket collisions,
    * which the small default width makes visible at test scale).
    *
    * The query side joins the keys' cells against the broadcast-sized
    * sketch frame and compares the estimate with the exact per-key
    * count — the self-audit a sketch deployment wants (at 100 TB the
    * exact leg is the thing you DROP; it rides along here because the
    * audit is the point of the entry).
    *
    * Determinism: cell row r of key k hashes `md5(r || ':' || k)` via
    * [[Sampling.hashBucket]]'s idiom — bit-reproducible in any engine.
    * Output: (key, n_exact, est, overcount) — all BIGINT.
    */
  def countMinAudit(df: DataFrame, keyCol: String,
                    depth: Int = 3, width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 8, "1 <= depth <= 8")
    require(width >= 1, "width >= 1")
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).as("key"))
    val cells = keyed
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket",
        Sampling.hashBucket(concat_ws(":", col("r"), col("key")), width))
    val sketch = cells.groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
    val exact = keyed.groupBy("key").agg(count(lit(1)).as("n_exact"))
    exact
      .select(col("key"), col("n_exact"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket",
        Sampling.hashBucket(concat_ws(":", col("r"), col("key")), width))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("key", "n_exact").agg(min(col("cnt")).as("est"))
      .select(col("key"), col("n_exact"), col("est"),
        (col("est") - col("n_exact")).as("overcount"))
  }

  /** Deterministic HyperLogLog registers (Flajolet et al. 2007) —
    * [[kmvDistinct]]'s fixed-memory sibling, built on the SAME
    * engine-portable md5 so a DuckDB oracle reproduces every register
    * bit-for-bit (Spark's own `approx_count_distinct` is HLL too, but
    * over an engine-private hash no other system can verify or merge).
    *
    * Hash = top 12 hex chars of md5 (48 bits): the top `b` bits pick
    * the register, the low `48−b` bits feed `ρ` = 1 + leading-zero
    * count (via `48−b − bitlength`, exact integer ops — no float log).
    * Register value = max ρ — monotone under union, so the register
    * frame is mergeable across shards/streams by construction.
    * Output: (group, bucket, r) — one row per NON-EMPTY register,
    * ≤ 2^b rows per group regardless of cardinality.
    */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, "4 <= b <= 16")
    val w = 48 - b
    val h = conv(substring(md5(col(valueCol).cast("string").cast("binary")),
      1, 12), 16, 10).cast("long")
    df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), h.as("_h"))
      .select(col("grp"), shiftright(col("_h"), w).as("bucket"),
        (col("_h") % lit(1L << w)).as("_rem"))
      .withColumn("_rho", lit(1 + w) -
        when(col("_rem") === 0, lit(0)).otherwise(length(bin(col("_rem")))))
      .groupBy("grp", "bucket").agg(max(col("_rho")).cast("long").as("r"))
  }

  /** HLL estimate from a register frame: harmonic-mean raw estimate
    * `α_m · m² / (V + Σ 2^−r)` with the standard small-range
    * linear-counting switch (`E ≤ 2.5m` and empty registers exist →
    * `m · ln(m/V)`). Every `2^−r` term is an exact power-of-two double
    * and the sum folds over the BUCKET-SORTED register array, so the
    * raw estimate is engine-bit-identical; `ln` enters only via the
    * linear-counting branch (rounded 6 dp at the output like the LM
    * scores). Output: (group, n_used, est).
    */
  def hllEstimate(regs: DataFrame, b: Int = 8): DataFrame = {
    val m = 1 << b
    val perG = regs.groupBy("grp")
      .agg(array_sort(collect_list(struct(col("bucket"), col("r")))).as("_arr"))
      .select(col("grp"), size(col("_arr")).cast("long").as("n_used"),
        (lit(m.toLong) - size(col("_arr"))).as("_v"),
        expr("aggregate(_arr, cast(0.0 as double), (a, s) -> " +
          "a + cast(1.0 as double) / cast(shiftleft(cast(1 as bigint), s.r) as double))")
          .as("_sum"))
    val s = col("_v").cast("double") + col("_sum")
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit((m.toLong * m).toDouble) / s
    val est = when(raw <= lit(2.5 * m) && col("_v") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("_v").cast("double")))
      .otherwise(raw)
    perG.select(col("grp"), col("n_used"), round(est, 6).as("est"))
  }

  /** [[hllRegisters]] + [[hllEstimate]] + the exact distinct count the
    * audit compares against (the exact leg is what a 100 TB run drops;
    * see [[countMinAudit]]). Output: (group, n_exact, n_used, est).
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  b: Int = 8): DataFrame = {
    val est = hllEstimate(hllRegisters(df, groupCol, valueCol, b), b)
    val exact = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(est, "grp")
      .select(col("grp").as(groupCol), col("n_exact"), col("n_used"), col("est"))
  }
}
