package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic top-principal-component extraction over an embedding
  * column, by fixed-round power iteration — the engine side of
  * "all-but-the-top" (Mu & Viswanath 2018) embedding post-processing:
  * dense embedding spaces concentrate a large share of variance in one
  * dominant direction (frequency/length artifacts); removing the
  * projection onto it measurably improves cosine-similarity tasks, so
  * a pipeline that dedups or mines by cosine wants this audit/repair
  * step.
  *
  * Algorithm: mean-center, then `iters` rounds of `w = Σᵢ (xᵢ·v)·xᵢ`,
  * `v ← w/‖w‖`, from the uniform start `v₀ = (2^−⌈log₂√d⌉, …)` — here
  * d = 64 so v₀ = 0.125 exactly. Per round the only driver state is
  * the d-vector (the bounded-codebook precedent): means and the
  * iterated direction are collected (d doubles), normalized with the
  * SAME fold tree an oracle uses, and re-injected as literals, so each
  * round is ONE distributed pass.
  *
  * Determinism: every per-dim sum is a TWO-LEVEL ordered fold —
  * vec-id-sorted within `cells` hash cells, then cell-sorted across
  * partials — so double addition order is fixed without any
  * single-sequence O(N) array (the scalable form of the sorted-fold
  * parity rule; per-group state is N/cells, tune `cells` to the
  * corpus). Row-side dots fold in dim order over the array itself.
  * float→double widening, power-of-two init, and IEEE sqrt are exact;
  * the sign is fixed by dim 0 of the final vector.
  */
object Pca {

  /** Per-dim two-level ordered-fold sum of `termCol` over frame
    * (_id, _j, term) → (_j, total). Addition order: vec-id within
    * cell, then cell — deterministic and bounded per group.
    *
    * `ordered = false` is the PRODUCTION fold-swap knob: plain
    * partial+final `sum` (map-side combine, no collect_list state,
    * no per-group sort). It gives up cross-engine bit-equality of the
    * double addition tree — the oracle regime keeps `ordered = true`;
    * a 100 TB run that only needs ~1e-12-relative stability takes the
    * swap (measured at fair 100× in PERF.md r10).
    */
  private def dimSums(slots: DataFrame, cells: Int,
                      ordered: Boolean = true): DataFrame =
    if (!ordered)
      slots.groupBy(col("_j")).agg(sum(col("_t")).as("total"))
    else slots
      .groupBy(col("_j"), pmod(col("_id"), lit(cells)).as("_cell"))
      .agg(array_sort(collect_list(struct(col("_id"), col("_t")))).as("_a"))
      .select(col("_j"), col("_cell"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._t)").as("_p"))
      .groupBy(col("_j"))
      .agg(array_sort(collect_list(struct(col("_cell"), col("_p")))).as("_a"))
      .select(col("_j"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._p)").as("total"))

  /** (means, n): per-dim mean as an Array[Double] in dim order. */
  def dimMeans(df: DataFrame, idCol: String, vecCol: String,
               cells: Int = 256, ordered: Boolean = true): (Array[Double], Long) = {
    val base = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
    val n = base.count()
    // cells key on pmod(_id) and folds sort by id: partitioning-safe
    val slots = Par.spreadToShuffleWidth(base, df)
      .select(col(idCol).as("_id"),
        posexplode(col(vecCol)).as(Seq("_j", "_x")))
      .select(col("_id"), col("_j"), col("_x").cast("double").as("_t"))
    val sums = dimSums(slots, cells, ordered).orderBy("_j").collect()
    (sums.map(r => r.getDouble(1) / n.toDouble), n)
  }

  /** The centered matrix as (id, cvec) with cvec = x − mean, computed
    * map-side from the injected mean literal (no join).
    */
  private def centered(df: DataFrame, idCol: String, vecCol: String,
                       means: Array[Double]): DataFrame =
    Par.spreadToShuffleWidth( // d-wide per-row math feeds every consumer
      df.filter(col(idCol).isNotNull && col(vecCol).isNotNull), df)
      .select(col(idCol).as("_id"),
        zip_with(col(vecCol), typedlit(means.toSeq),
          (x, mu) => x.cast("double") - mu).as("_cv"))

  private def dot(vec: org.apache.spark.sql.Column, v: Array[Double]) =
    aggregate(zip_with(vec, typedlit(v.toSeq), (a, b) => a * b),
      lit(0.0), (acc, t) => acc + t)

  /** Power-iterate the dominant direction; returns (v, means), both
    * length-d, sign-fixed so v(0) ≥ 0.
    */
  def topDirection(df: DataFrame, idCol: String, vecCol: String,
                   iters: Int = 3, cells: Int = 256,
                   ordered: Boolean = true): (Array[Double], Array[Double]) = {
    require(iters >= 1 && iters <= 10, "1 <= iters <= 10")
    val (means, _) = dimMeans(df, idCol, vecCol, cells, ordered)
    val d = means.length
    val c = centered(df, idCol, vecCol, means).cache()
    try {
      var v = Array.fill(d)(0.125) // exact for d = 64; any 2^-k works
      for (_ <- 1 to iters) {
        val slots = c.select(col("_id"), dot(col("_cv"), v).as("_s"),
            posexplode(col("_cv")).as(Seq("_j", "_xc")))
          .select(col("_id"), col("_j"), (col("_s") * col("_xc")).as("_t"))
        val w = dimSums(slots, cells, ordered).orderBy("_j").collect()
          .map(_.getDouble(1))
        // same tree as the oracle: fold j ascending from 0.0, IEEE sqrt
        val norm = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
        v = w.map(_ / norm)
      }
      if (v(0) < 0) v = v.map(x => -x)
      (v, means)
    } finally { c.unpersist() }
  }

  /** Entry surface: the final direction as (dim, loading). */
  def topComponent(spark: SparkSession, df: DataFrame, idCol: String,
                   vecCol: String, iters: Int = 3, cells: Int = 256,
                   ordered: Boolean = true): DataFrame = {
    val (v, _) = topDirection(df, idCol, vecCol, iters, cells, ordered)
    import spark.implicits._
    v.zipWithIndex.map { case (x, j) => (j.toLong, x) }.toSeq
      .toDF("dim", "_l")
      .select(col("dim"), round(col("_l"), 6).as("loading"))
  }

  /** Per-vector projection onto the dominant direction (the quantity
    * "all-but-the-top" subtracts): proj = (x − μ)·v. One map-side
    * pass with v and μ injected as literals. Output: (id, proj).
    */
  def projections(df: DataFrame, idCol: String, vecCol: String,
                  iters: Int = 3, cells: Int = 256,
                  ordered: Boolean = true): DataFrame = {
    val (v, means) = topDirection(df, idCol, vecCol, iters, cells, ordered)
    centered(df, idCol, vecCol, means)
      .select(col("_id").as(idCol), round(dot(col("_cv"), v), 6).as("proj"))
  }
}
