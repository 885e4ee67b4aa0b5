package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the LATEST right row with
  * `right.ts <= left.ts` within the same key (ties on ts broken by the
  * largest `tieCol`). The canonical temporal-enrichment operator (price
  * as of trade time, profile as of event time) that Spark lacks as a
  * built-in.
  *
  * Construction: union both sides tagged, one window per key partition
  * carrying the running `last(right value, ignoreNulls)` in
  * (ts, side, tie) order — right rows sort BEFORE a left row with the
  * same ts, so the match is inclusive. One shuffle + one sort per key
  * partition, O(n log n) — never a per-row probe or a range cross
  * join. Key-partition skew behaves like any window: bucket the key
  * space (cf. `KpiQueries.trendingKpisBucketed`) if one key dominates.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, tieCol: String): DataFrame = {
    require(keys.nonEmpty)
    val rightVals = right.columns.filterNot((keys :+ tsCol).contains).toSeq
    require(rightVals.nonEmpty, "right side carries no value columns")
    val leftCols = left.columns.toSeq

    // The right row travels as ONE struct, so the carried match is
    // row-atomic: even if some right value columns are null, all
    // asof_* outputs come from the SAME (latest) right row — carrying
    // columns individually with last(ignoreNulls) would mix rows.
    val rStruct = struct(rightVals.map(col): _*)
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_l", struct(leftCols.map(col): _*))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_r", lit(null).cast(right.select(rStruct).schema.head.dataType))
      .select(keys.map(col) :+ col(tsCol).as("_ts") :+ col("_side") :+ col("_tie") :+
        col("_l") :+ col("_r"): _*)
    // SQL equi-join semantics: a NULL key never matches. Window
    // .partitionBy groups nulls into one partition, so without this
    // filter null-key left rows would "match" null-key right rows.
    // Null-key LEFT rows stay (it's a left join) — their partition then
    // holds no right rows, so their asof_* columns come out null.
    val matchableRight = keys.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
    val r = matchableRight
      .withColumn("_side", lit(0))
      .withColumn("_l", lit(null).cast(l.schema("_l").dataType))
      .withColumn("_tie", col(tieCol).cast("long"))
      .withColumn("_r", rStruct)
      .select(keys.map(col) :+ col(tsCol).as("_ts") :+ col("_side") :+ col("_tie") :+
        col("_l") :+ col("_r"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightVals.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
