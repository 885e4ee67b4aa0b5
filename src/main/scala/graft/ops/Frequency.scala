package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Heavy-hitter (φ-frequent item) detection with EXACT output at
  * sketch cost: a mergeable Misra–Gries summary finds the candidate
  * set in one map-side-combined pass, then a second exact-count pass
  * over only those candidates restores precise frequencies.
  *
  * Why not plain `groupBy(col).count`? At 100 TB the full group-by
  * shuffles one row per DISTINCT value — for web-scale token/URL/user
  * columns that is billions of groups through the exchange to answer a
  * question whose output is dozens of rows. The MG summary caps
  * per-partition state at `k` counters, the merge is associative, and
  * the candidate set it ships is ≤ k rows per partition. The guarantee
  * (Misra–Gries 1982): any value with true frequency > n/(k+1) SURVIVES
  * the summary — so with `k + 1 ≥ 1/minShare` the candidate set is a
  * superset of every item the query must return, and the exact
  * verification pass (a broadcast semi-join + count over the matching
  * rows only) makes the final counts — and therefore the result set —
  * identical to the full group-by's.
  */
object Frequency {

  /** Mergeable Misra–Gries summary over strings: at most `k` counters.
    * `reduce` admits a new value by decrementing all counters when the
    * map is full (the classic "pair off" step); `merge` adds counts
    * then subtracts the (k+1)-largest combined count from every entry,
    * dropping non-positive ones (Agarwal et al., "Mergeable Summaries",
    * PODS 2012) — both keep the ≤ k bound and the undercount-by-at-most
    * n/(k+1) guarantee.
    */
  class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "k must be positive")
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) buf
      else buf.get(v) match {
        case Some(c) => buf.updated(v, c + 1)
        case None if buf.size < k => buf.updated(v, 1L)
        case None => // decrement-all: drop zeros, the new item cancels out
          buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering.Long.reverse).apply(k) // (k+1)-largest
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf
    override def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Values of `valueCol` whose exact frequency exceeds
    * `minShare · n`, with exact counts and shares.
    * Output: (value, n_rows, share), share = n_rows / n rounded to 6.
    *
    * `k` defaults to `ceil(1/minShare)` so the MG guarantee covers the
    * threshold; raise it to tighten the candidate set's slack (fewer
    * false candidates to recount, same exact result).
    */
  def heavyHitters(df: DataFrame, valueCol: String, minShare: Double,
                   k: Int = 0): DataFrame = {
    require(minShare > 0 && minShare < 1, "minShare in (0,1)")
    val kk = if (k > 0) k else math.ceil(1.0 / minShare).toInt
    require(kk + 1 >= 1.0 / minShare, s"k=$kk too small for minShare=$minShare")
    val mg = udaf(new MisraGriesAgg(kk), Encoders.STRING)
    // one pass: MG summary (map-side partial) + exact total row count,
    // kept as a LAZY one-row frame — no driver action at build time, so
    // every execution of the returned plan re-sketches the data it
    // actually reads (a head()-and-bake-literals variant would freeze
    // candidates/n from build time while re-counting fresh data).
    val sketch = df.select(mg(col(valueCol).cast("string")).as("_cand"),
      count(col(valueCol)).as("_n"))
    // candidate keys carry the total along, so the sketch is ONE
    // subtree evaluated once per execution (≤ k rows, broadcast)
    val candidates = sketch.select(
      explode(map_keys(col("_cand"))).as("value"), col("_n"))
    // exact verification pass: only candidate rows are counted
    df.select(col(valueCol).cast("string").as("value"))
      .join(broadcast(candidates), Seq("value"))
      .groupBy("value").agg(count(lit(1)).as("n_rows"), first("_n").as("_n"))
      .filter(col("n_rows") > lit(minShare) * col("_n"))
      .select(col("value"), col("n_rows"),
        round(col("n_rows") / col("_n").cast("double"), 6).as("share"))
  }
}
