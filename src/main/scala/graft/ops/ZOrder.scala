package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * dimensions so ONE range-partitioned sort clusters the data in BOTH —
  * the multi-dimensional data-skipping play (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, and the space-filling-curve literature behind them).
  *
  * Why it matters at 100 TB: parquet readers prune row groups and files
  * by min/max stats. A single-column sort gives perfect pruning on that
  * column and none on any other; writing in z-value order gives
  * near-tight min/max boxes in BOTH dimensions, so a `WHERE a BETWEEN …
  * AND b BETWEEN …` query skips all but the files whose box intersects
  * the query box. The z-value is a pure codegen'd bit-spread projection
  * — the layout costs one `repartitionByRange` (sampled range exchange,
  * no skew collapse) + in-partition sort, both linear.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a long
    * (classic magic-mask doubling; 4 shift/mask steps, all codegen'd).
    */
  private def spread16(x: Column): Column = {
    def step(c: Column, shift: Int, mask: Long): Column =
      c.bitwiseOR(shiftleft(c, shift)).bitwiseAND(lit(mask))
    val s1 = step(x, 8, 0x00FF00FFL)
    val s2 = step(s1, 4, 0x0F0F0F0FL)
    val s3 = step(s2, 2, 0x33333333L)
    step(s3, 1, 0x55555555L)
  }

  /** Morton z-value of two dimensions' low 16 bits (inputs must already
    * be non-negative; callers quantize/`pmod` first). a gets the even
    * bits, b the odd bits — a 32-bit z in a BIGINT.
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long").bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(b.cast("long").bitwiseAND(lit(0xFFFFL))), 1))

  /** Quantize a numeric column to [0, 2^16) against known [lo, hi]
    * bounds (rank-preserving affine map; ties keep file stats valid —
    * quantization only affects clustering quality, never correctness).
    */
  def quantize16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
    least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * 65535.0).cast("long")))
  }

  /** Z-order `df` by two numeric columns: one tiny stats pass for the
    * bounds (4 scalars to the driver), then a single range exchange on
    * the z-value + in-partition sort. `numFiles` bounds output file
    * count (each range partition becomes one file on write).
    */
  def zOrderByRange(df: DataFrame, colA: String, colB: String,
                    numFiles: Int = 32): DataFrame = {
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2), "z-order needs non-null bounds")
    val z = zValue(
      quantize16(col(colA), b.getDouble(0), b.getDouble(1)),
      quantize16(col(colB), b.getDouble(2), b.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Write `df` z-ordered by (colA, colB) — downstream scans with box
    * predicates on either/both columns prune by file min/max stats.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
                    numFiles: Int = 32): Unit =
    zOrderByRange(df, colA, colB, numFiles).write.mode("overwrite").parquet(path)
}
