package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, Exchange}

/** Dev tool (optimization round): find registry entries whose PHYSICAL plan
  * evaluates the same expensive subtree more than once.
  *
  * Spark's ReuseExchange/ReuseSubquery only dedupe IDENTICAL exchange or
  * subquery nodes; a subtree that feeds both a BroadcastExchange (a 1-row
  * count, a threshold array) and the main shuffle path is computed once PER
  * PARENT — e.g. `bhFdr` re-ran its data-sized permutation-test input three
  * times (broadcast m, cache fill under kStar, the null-p union branch).
  *
  * Detection: walk the executed plan INCLUDING subquery plans, canonicalize
  * every subtree, and count how many times each canonical form containing at
  * least one parquet scan appears, skipping subtrees under ReusedExchange
  * (those are free). Reports the max duplicate count and the table names of
  * the duplicated scans, per entry. `runMain graft.DupScan [sfDir] [query…]`.
  */
object DupScan {

  private def subqueryPlans(p: SparkPlan): Seq[SparkPlan] =
    p.expressions.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.ScalarSubquery => e.plan
      case e: org.apache.spark.sql.execution.InSubqueryExec => e.plan
    })

  /** All evaluated subtrees: children of every node + roots of subqueries,
    * not descending into ReusedExchange (its child is shared, not re-run)
    * and visiting each AQE query stage ONCE (AQE represents stage reuse as
    * repeated QueryStageExec nodes with the same id, not ReusedExchange).
    */
  private def walk(p: SparkPlan, acc: scala.collection.mutable.Buffer[SparkPlan],
                   seenStages: scala.collection.mutable.Set[Int]): Unit = {
    p match {
      case _: ReusedExchangeExec => // shared — not a second evaluation
      case a: AdaptiveSparkPlanExec =>
        walk(a.executedPlan, acc, seenStages)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        if (seenStages.add(q.id)) walk(q.plan, acc, seenStages)
      case other =>
        acc += other
        other.children.foreach(walk(_, acc, seenStages))
        subqueryPlans(other).foreach(walk(_, acc, seenStages))
    }
  }

  private def scanTables(p: SparkPlan): Seq[String] = p.collect {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
  }

  def report(name: String, plan: SparkPlan): Option[String] = {
    val all = scala.collection.mutable.Buffer[SparkPlan]()
    walk(plan, all, scala.collection.mutable.Set[Int]())
    // count canonical forms of subtrees that contain a scan AND at least
    // one exchange or aggregate (i.e. real work, not a bare column prune)
    val interesting = all.filter { st =>
      scanTables(st).nonEmpty &&
        st.collect { case e: Exchange => e
                     case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }.nonEmpty
    }
    val byCanon = interesting.groupBy(_.canonicalized)
    val dups = byCanon.filter(_._2.size > 1)
    if (dups.isEmpty) None
    else {
      // deepest duplicated subtree (the real cost), its count, its tables
      val worst = dups.maxBy { case (c, occ) => c.collect { case x => x }.size }
      val (canon, occ) = worst
      val size = canon.collect { case x => x }.size
      Some(s"$name: ${occ.size}x duplicated subtree of $size nodes over " +
        s"tables=${scanTables(canon).distinct.mkString(",")} " +
        s"(total dup groups: ${dups.size})")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark: SparkSession = GraftSession.get("graft-dupscan")
    var flagged = 0
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // materialize through noop so AQE finalizes and subqueries exist
        df.write.format("noop").mode("overwrite").save()
        report(n, df.queryExecution.executedPlan).foreach { r =>
          flagged += 1; println(s"[dup] $r")
        }
      } catch { case e: Throwable => println(s"[dup] $n FAILED: ${e.getMessage.take(120)}") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    println(s"[dup] done: $flagged flagged of ${names.size}")
    spark.stop()
  }
}
