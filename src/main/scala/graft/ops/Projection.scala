package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Johnson–Lindenstrauss sign random projection
  * (Achlioptas 2003: ±1 entries preserve pairwise distances in
  * expectation at k = O(log n / ε²) dims) — the cheap-embedding
  * counterpart to [[Pca]]: where PCA finds the data's OWN dominant
  * direction, JL compresses to a data-independent sketch that any
  * worker (or any other engine) can regenerate from the seed string
  * alone, which is what makes it the 100 TB tool: no training pass,
  * no model to ship, and two independently-computed projections of the
  * same corpus are directly comparable.
  *
  * The sign matrix is derived from md5 — `s(j,i) = ±1` by the parity
  * of the first 8 hex chars of `md5("j_i")` — the repo's
  * engine-portable hash idiom, so a DuckDB oracle regenerates the
  * SAME matrix symbolically. Projection `y_j = Σᵢ xᵢ·s(j,i)` folds in
  * dim order (zip_with + in-order aggregate ≡ DuckDB's in-order
  * list_sum), float→double widening is exact, and ±1 products flip
  * sign bits only, so `proj` gates raw, unrounded.
  *
  * Scale posture: the k×d sign matrix is built once on k generator
  * rows and broadcast (k rows; never data-sized); the projection
  * itself is a single 0-shuffle map-side pass over the vectors.
  */
object Projection {

  /** (j, sign array of length d): +1.0/−1.0 from md5 parity. Shared
    * with [[Similarity.e2lshPairs]] (its hash tables are one sign
    * projection each — the same engine-portable matrix).
    */
  private[graft] def signFrame(spark: SparkSession, k: Int, d: Int): DataFrame =
    spark.range(k).select(col("id").as("comp"))
      .withColumn("_s", expr(
        s"""transform(sequence(0, ${d - 1}), i ->
           |  CASE WHEN cast(conv(substring(md5(cast(concat_ws('_', comp, i) as binary)), 1, 8), 16, 10) as bigint) % 2 = 0
           |       THEN cast(1.0 as double) ELSE cast(-1.0 as double) END)""".stripMargin))

  /** Project each vector to k sign-sketch components.
    * Output: (idCol, comp, proj) — k rows per vector, raw doubles.
    */
  def jlProject(spark: SparkSession, df: DataFrame, idCol: String,
                vecCol: String, d: Int, k: Int = 16): DataFrame = {
    require(k >= 1 && d >= 1, "k >= 1, d >= 1")
    df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("_v"))
      .crossJoin(broadcast(signFrame(spark, k, d)))
      .select(col(idCol), col("comp"),
        aggregate(zip_with(col("_v"), col("_s"), (x, s) => x * s),
          lit(0.0), (a, t) => a + t).as("proj"))
  }

  /** Per-vector JL norm-distortion audit: `(d/k)·‖y‖²/‖x‖²` — the
    * quantity the JL lemma bounds near 1. Folds ‖y‖² in component
    * order and ‖x‖² in dim order; zero vectors mask to NULL (Spark
    * and DuckDB disagree on 0/0). Output: (idCol, ratio).
    */
  def jlDistortion(spark: SparkSession, df: DataFrame, idCol: String,
                   vecCol: String, d: Int, k: Int = 16): DataFrame = {
    val proj = jlProject(spark, df, idCol, vecCol, d, k)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("comp"), col("proj")))).as("_ys"))
      .select(col(idCol), expr(
        "aggregate(_ys, cast(0.0 as double), (a, s) -> a + s.proj * s.proj)")
        .as("_yn"))
    val xn = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol),
        aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
          lit(0.0), (a, t) => a + t).as("_xn"))
    xn.join(proj, idCol)
      .select(col(idCol),
        when(col("_xn") === 0.0, lit(null).cast("double"))
          .otherwise(lit(d.toDouble / k.toDouble) * col("_yn") / col("_xn"))
          .as("ratio"))
  }
}
