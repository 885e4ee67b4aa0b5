package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: SCD Type-2 history build and
  * merge/upsert application. The reference's CDC surface is a
  * checksum-gated full-refresh of reference data
  * (`dags/music_streaming_pipeline.py` `check_reference_data_updates`);
  * these operators are what a warehouse does with the changes once it
  * tracks them row-wise instead of file-wise.
  */
object Cdc {

  /** Build an SCD Type-2 version history from an attribute event
    * stream: one row per (key, attribute-run) with
    * `valid_from` = first ts of the run, `valid_to` = start of the next
    * run (null = open), `is_current` = no successor. Consecutive equal
    * attribute values collapse into one version.
    *
    * `tieCol` breaks equal-timestamp orderings deterministically.
    *
    * Scale posture: two per-key ordered windows (change detection via
    * lag, expiry via lead) — one shuffle by key, partition size bounded
    * by a key's OWN event count (human/entity-bounded like
    * [[Sessionize]]), never by table size. No join at all.
    */
  def scd2(df: DataFrame, keyCol: String, attrCol: String, tsCol: String,
           tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("_prev", lag(col(attrCol), 1).over(ord))
      .withColumn("_first", row_number().over(ord) === 1)
      .filter(col("_first") || !(col("_prev") <=> col(attrCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1)
        .over(Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Apply a CDC changeset to a base snapshot. `changes` carries the
    * base's columns plus `opCol` ∈ {I, U, D}: rows whose key appears in
    * the changeset are replaced (U) or dropped (D); I rows append.
    * Exactly one change row per key is assumed (the usual "latest change
    * wins" compaction happens upstream).
    *
    * Implementation is anti-join + union — deliberately NOT a full
    * outer join: the base never materializes null-padded rows, and at
    * 100 TB the typically-small changeset broadcasts into the anti
    * join, making the apply a single map-side pass over the base plus
    * an append.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
                  opCol: String = "op"): DataFrame = {
    val survivors = base.join(changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    val applied = changes.filter(col(opCol) =!= "D").drop(opCol)
    survivors.unionByName(applied.select(survivors.columns.map(col): _*))
  }

  /** Changelog compaction: keep each key's LATEST row by
    * (`tsCol`, `tieCol`) — the collapse step before applying a CDC feed
    * or serving a snapshot ("last write wins"). The tie column makes
    * the winner deterministic under equal timestamps (a raw
    * `row_number` over ts alone hash-verifies only by luck).
    *
    * Scale posture: one per-key window, rank-1 filter → planned as
    * two-phase `WindowGroupLimit` (per-partition bounded top-1 BEFORE
    * the exchange), so the shuffle carries at most one row per
    * (partition, key), not the key's whole history.
    */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String): DataFrame =
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc, col(tieCol).desc)))
      .filter(col("_rn") === 1)
      .drop("_rn")

  /** Row-level diff of two snapshots of the same table: one row per key
    * that was `added` (new only), `removed` (old only), or `changed`
    * (both, any non-key column differs under null-safe compare).
    * Unchanged keys emit nothing. Non-key columns come back twice,
    * prefixed `old_` / `new_` (null on the absent side).
    *
    * This is the inverse of [[mergeUpsert]]: `snapshotDiff(base,
    * mergeUpsert(base, cs, k), k)` recovers `cs`'s effect exactly —
    * the property the oracle entry checks.
    *
    * Scale posture: ONE full shuffle join on the key with both sides
    * hash-partitioned identically (Catalyst plans a single sort-merge
    * or shuffled-hash join; there is no cheaper way to compare 100 TB
    * against 100 TB row-wise). The change test is a null-safe struct
    * comparison — codegen'd, no per-column join or second pass. If the
    * snapshots are written bucketed by the key ([[graft.io.ParquetIO
    * .writeBucketed]]), the exchange disappears entirely.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String): DataFrame = {
    val dataCols = oldSnap.columns.filter(_ != keyCol).toSeq
    require(dataCols.toSet == newSnap.columns.filter(_ != keyCol).toSet,
      "snapshots must share one schema")
    val o = oldSnap.select(col(keyCol),
      struct(dataCols.map(col): _*).as("_old"))
    val n = newSnap.select(col(keyCol),
      struct(dataCols.map(col): _*).as("_new"))
    val joined = o.join(n, Seq(keyCol), "full_outer")
    val oldAbsent = col("_old").isNull
    val newAbsent = col("_new").isNull
    joined
      .withColumn("change_type",
        when(oldAbsent, lit("added"))
          .when(newAbsent, lit("removed"))
          .when(!(col("_old") <=> col("_new")), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(col(keyCol) +: col("change_type") +:
        dataCols.flatMap(c => Seq(
          col(s"_old.$c").as(s"old_$c"), col(s"_new.$c").as(s"new_$c"))): _*)
  }
}
