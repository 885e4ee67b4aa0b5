package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet datasets — the maintenance
  * operator every long-running ingest pipeline needs: streaming /
  * per-batch writers leave thousands of KB-scale files, and at 100 TB
  * the resulting task-per-file scheduling and footer overhead dominate
  * scan time long before the data does.
  *
  * Mechanics: size the target file count from the dataset's ACTUAL
  * byte size (listing only — no data pass), rewrite once through a
  * single repartition, and swap directories (write to
  * `<path>._compact_tmp`, then rename path → `._compact_old`,
  * tmp → path). No half-written data is ever visible, but the
  * two-rename swap is NOT atomic: there is a brief window in which
  * `path` is absent, and a crash inside that window strands the data
  * at `<path>._compact_old`. [[compact]] detects and repairs that
  * state on its next invocation (restore `._compact_old` → path when
  * path is missing; drop it when the swap had already published).
  * The rewrite preserves rows exactly — compaction is layout-only.
  */
object Compact {

  /** Total bytes of data files under `path` (recursive, dot-files
    * excluded) — a namenode listing, not a read.
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(path), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        total += f.getLen
    }
    total
  }

  /** Number of data files under `path`. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(path), true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        n += 1
    }
    n
  }

  /** Compact the parquet dataset at `path` into
    * `ceil(bytes / targetBytes)` files (min 1). Returns the new file
    * count. No-op (returns current count) if the dataset already has
    * no more than `ceil` files.
    */
  /** Repair the aftermath of a compact() that crashed mid-swap: if a
    * `._compact_old` exists and `path` is gone, the crash hit between
    * the two renames — restore the original data; if both exist, the
    * swap had published and only the cleanup was lost — drop the old
    * copy. Returns true if any repair action was taken.
    */
  def recoverCrashedSwap(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + "._compact_old")
    if (!fs.exists(old)) false
    else if (!fs.exists(new Path(path))) fs.rename(old, new Path(path))
    else fs.delete(old, true)
  }

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0)
    recoverCrashedSwap(spark, path)
    val bytes = dataBytes(spark, path)
    val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val have = dataFileCount(spark, path)
    if (have <= want) return have

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "._compact_tmp")
    val old = new Path(path + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)

    spark.read.parquet(path).repartition(want).write.parquet(tmp.toString)
    // swap: current -> old, tmp -> current, drop old
    if (!fs.rename(new Path(path), old))
      sys.error(s"compact: could not move $path aside")
    if (!fs.rename(tmp, new Path(path))) {
      fs.rename(old, new Path(path)) // restore
      sys.error(s"compact: could not publish compacted data for $path")
    }
    fs.delete(old, true)
    dataFileCount(spark, path)
  }
}
