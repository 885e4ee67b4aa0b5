package graft

/** Dev tool: train a BPE merge table from a corpus dir's `documents`
  * table and print it as a Scala literal — how the pinned merge table in
  * [[SparkEntry]] was produced (offline bounded-iteration training, then
  * the table is a constant both the Spark query and the DuckDB oracle
  * derive from).
  *
  * Usage: runMain graft.BpeTrain <sfDir> [numMerges]
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val n = if (args.length > 1) args(1).toInt else 48
    val spark = GraftSession.get("graft-bpe-train")
    val docs = TestTables.table(spark, sfDir, "documents")
    val merges = graft.ops.Bpe.train(docs, "text", numMerges = n)
    println("val bpeMerges: Seq[(String, String)] = Seq(")
    println(merges.map { case (x, y) => s"""  ("$x", "$y")""" }.mkString(",\n"))
    println(")")
    spark.stop()
  }
}
