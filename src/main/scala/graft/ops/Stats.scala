package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-exact statistical tests over categorical data.
  *
  * The χ² independence test is the workhorse audit for "did this
  * categorical distribution move?" — A/B assignment vs outcome,
  * source vs language mix drift between two crawl snapshots, event
  * type vs cohort. All sufficient statistics here are exact integer
  * counts; the only floating-point work is the final fold over the
  * (tiny) contingency table, done over a SORTED cell array with an
  * expression tree the DuckDB oracle states identically — the same
  * determinism discipline as `TextAnalysis.tokenDistributionShift`.
  */
object Stats {

  /** Pearson χ² test of independence between two categorical columns,
    * plus Cramér's V effect size. Output is ONE row:
    * (n, n_rows_cat, n_cols_cat, dof, chi2, cramers_v).
    *
    * The contingency table includes structural ZERO cells (observed
    * pairs only would bias χ² low): the cell frame is the cross join
    * of the distinct row and column category sets — both tiny aggs —
    * left-joined against observed counts. Expected e = rt·ct/n in
    * doubles; each zero cell contributes e.
    *
    * Scale posture: two scans collapse the data to |R| and |C| rows
    * plus one (r,c) hash agg; everything after operates on ≤ |R|·|C|
    * rows (a contingency table a human would read — bounded by
    * construction). The χ² fold runs over the sorted cell array in one
    * row, so partial-sum order can never perturb the double.
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val r = col(rowCol); val c = col(colCol)
    val obs = df.filter(r.isNotNull && c.isNotNull)
      .select(r.as("rv"), c.as("cv"))
    val cells = obs.groupBy("rv", "cv").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("rv").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("cv").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    // full grid incl. zero cells: tiny cross join of the two category sets
    val grid = rowTot.crossJoin(colTot)
      .join(cells, Seq("rv", "cv"), "left")
      .select(col("rv"), col("cv"), coalesce(col("o"), lit(0L)).as("o"),
        col("rt"), col("ct"))
    val folded = grid
      .agg(array_sort(collect_list(struct(col("rv"), col("cv"), col("o"),
        col("rt"), col("ct")))).as("arr"),
        countDistinct("rv").as("n_rows_cat"),
        countDistinct("cv").as("n_cols_cat"))
      .crossJoin(broadcast(n))
    def e(s: Column) =
      s.getField("rt").cast("double") * s.getField("ct").cast("double") /
        col("n").cast("double")
    val chi2 = aggregate(col("arr"), lit(0.0), (a, s) => {
      val ee = e(s)
      val d = s.getField("o").cast("double") - ee
      a + d * d / ee
    })
    folded.select(
      col("n"),
      col("n_rows_cat"),
      col("n_cols_cat"),
      ((col("n_rows_cat") - 1) * (col("n_cols_cat") - 1)).as("dof"),
      round(chi2, 6).as("chi2"),
      round(sqrt(chi2 / (col("n").cast("double") *
        least(col("n_rows_cat") - 1, col("n_cols_cat") - 1).cast("double"))), 6)
        .as("cramers_v"))
  }

  /** Mutual information I(R; C) in nats between two categorical
    * columns — χ²'s information-theoretic sibling, the standard
    * dependence measure for feature selection and drift audits.
    * Only OBSERVED cells enter (lim p→0 of p·ln(...) = 0, so zero
    * cells contribute nothing — unlike [[chiSquare]], no grid needed):
    *
    *   I = Σ_cells (o/n) · ln( (o/n) / ((rt/n)·(ct/n)) )
    *
    * Same determinism discipline as [[chiSquare]]: integer sufficient
    * statistics, one sorted-cell fold for the double sum, expression
    * tree stated identically in the oracle. Output: ONE row
    * (n, n_cells, mi_nats).
    */
  def mutualInformation(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val r = col(rowCol); val c = col(colCol)
    val cells = df.filter(r.isNotNull && c.isNotNull)
      .select(r.as("rv"), c.as("cv"))
      .groupBy("rv", "cv").agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy("rv").agg(sum("o").as("rt"))
    val colTot = cells.groupBy("cv").agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    val folded = cells
      .join(broadcast(rowTot), Seq("rv"))
      .join(broadcast(colTot), Seq("cv"))
      .agg(array_sort(collect_list(struct(col("rv"), col("cv"), col("o"),
        col("rt"), col("ct")))).as("arr"),
        count(lit(1)).as("n_cells"))
      .crossJoin(broadcast(n))
    def p(s: Column) = s.getField("o").cast("double") / col("n").cast("double")
    val mi = aggregate(col("arr"), lit(0.0), (a, s) =>
      a + p(s) * log(p(s) /
        ((s.getField("rt").cast("double") / col("n").cast("double")) *
         (s.getField("ct").cast("double") / col("n").cast("double")))))
    folded.select(col("n"), col("n_cells"), round(mi, 6).as("mi_nats"))
  }
}
