package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit over a table — the constraint-checking
  * step a training-data pipeline runs before admitting a batch
  * (completeness / uniqueness / bounds / accepted-values, in the style
  * of the published constraint-verification systems, e.g. Deequ's
  * "unit tests for data").
  *
  * Execution shape: ALL checks compile into ONE aggregation pass over
  * the input (a single row of metric columns), which is then exploded
  * into one row per check. Cost is one scan + one 1-row shuffle no
  * matter how many checks run — at 100 TB the audit is exactly as
  * expensive as one `count()`, never #checks scans. No UDFs, no
  * driver-side evaluation; thresholds fold into the plan as literals.
  */
object Quality {

  sealed trait Check {
    def column: String
    /** Human-stable check name (becomes the output `check` value). */
    def name: String
    /** Metric in [0, 1]; evaluated inside the single agg pass. */
    def metric: Column
    def threshold: Double
  }

  /** Fraction of rows with a non-null value. */
  final case class Completeness(column: String, threshold: Double = 1.0) extends Check {
    def name = "completeness"
    def metric: Column = count(col(column)) / count(lit(1))
  }

  /** Distinct values over non-null values (1.0 = unique key). */
  final case class Uniqueness(column: String, threshold: Double = 1.0) extends Check {
    def name = "uniqueness"
    def metric: Column = count_distinct(col(column)) / count(col(column))
  }

  /** Fraction of NON-NULL values inside [lo, hi] (completeness is its
    * own check; bounds should not double-report nulls).
    */
  final case class Bounds(column: String, lo: Double, hi: Double,
                          threshold: Double = 1.0) extends Check {
    def name = "bounds"
    def metric: Column =
      count(when(col(column) >= lo && col(column) <= hi, lit(1))) / count(col(column))
  }

  /** Fraction of non-null values inside an accepted domain. */
  final case class AcceptedValues(column: String, values: Seq[String],
                                  threshold: Double = 1.0) extends Check {
    def name = "accepted_values"
    def metric: Column =
      count(when(col(column).isin(values.map(v => v: Any): _*), lit(1))) /
        count(col(column))
  }

  /** Run the audit: one row per check —
    * (check, column, metric, threshold, passed).
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val metricCols = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"_m$i") }
    val one = df.agg(metricCols.head, metricCols.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        lit(c.column).as("column"),
        round(col(s"_m$i"), 6).as("metric"),
        lit(c.threshold).as("threshold"),
        (col(s"_m$i") >= lit(c.threshold)).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
