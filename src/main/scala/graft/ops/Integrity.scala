package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the corpus-wide sibling of
  * `SkewJoin.joinPreflight`: for every declared FK relation, how many
  * child rows point at a parent that does not exist? Orphans silently
  * become row LOSS under inner joins and NULL fan-in under left joins;
  * a pipeline wants the count measured BEFORE a join plan bakes the
  * loss in, and wants it per relation so a bad extract (one table
  * delivered stale) is localized in one glance.
  */
object Integrity {

  /** One row per relation: (relation, n_child, n_orphan, orphan_ppm).
    *
    * `relations` entries are (name, child, childKeyCol, parent,
    * parentKeyCol); pass a pre-transformed child frame to audit a
    * derived key. NULL child keys are excluded from both counts (NULL
    * is a missingness question, not an orphan — `Expectations` owns
    * that); `orphan_ppm` is exact integer arithmetic.
    *
    * Scale posture, per relation: child keys collapse to a (key, count)
    * agg FIRST, so the anti-join probes |distinct keys| rows rather
    * than |child|, against a distinct parent keyset (AQE broadcasts
    * the smaller side). Relations never scan each other's tables: the
    * output is a union of independent 1-row aggs.
    */
  def orphanAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "at least one relation")
    relations.map { case (name, child, ck, parent, pk) =>
      val ckeys = child.filter(col(ck).isNotNull)
        .groupBy(col(ck).as("_k")).agg(count(lit(1)).as("_n"))
      // ONE pass: a left join against the distinct parent keyset marks
      // hits, and a single agg derives both totals from the collapsed
      // |distinct keys| frame — no second child-table scan, no cache
      val marked = ckeys.join(
        parent.filter(col(pk).isNotNull)
          .select(col(pk).as("_k"), lit(1).as("_hit")).distinct(),
        Seq("_k"), "left")
      marked.agg(
          coalesce(sum(col("_n")), lit(0L)).cast("long").as("n_child"),
          coalesce(sum(when(col("_hit").isNull, col("_n"))), lit(0L))
            .cast("long").as("n_orphan"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphan"),
          when(col("n_child") === 0, lit(null).cast("long"))
            .otherwise(expr("n_orphan * 1000000L div n_child")).as("orphan_ppm"))
    }.reduce(_ unionByName _)
  }
}
