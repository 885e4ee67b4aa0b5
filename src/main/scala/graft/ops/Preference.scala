package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF / reward-model) data quality: a preference
  * corpus is a directed multigraph per prompt — `winner → loser`
  * edges — and its pathologies are graph shapes: the same unordered
  * pair annotated in BOTH directions (contradiction), directed
  * 3-cycles (intransitivity a reward model cannot fit), and items
  * whose win rate collapses to 0 or 1 (no ranking signal). All three
  * audits are prompt-keyed equi-joins/aggregations — the prompt id is
  * the shuffle key, so per-prompt item counts (tens) bound every
  * intermediate, never the corpus size.
  */
object Preference {

  private def edges(prefs: DataFrame, promptCol: String, chosenCol: String,
                    rejectedCol: String): DataFrame =
    prefs
      .filter(col(promptCol).isNotNull && col(chosenCol).isNotNull &&
        col(rejectedCol).isNotNull && col(chosenCol) =!= col(rejectedCol))
      .select(col(promptCol).as("prompt_id"), col(chosenCol).as("winner"),
        col(rejectedCol).as("loser"))

  /** Unordered pairs asserted in both directions within a prompt:
    * `(p, a≻b)` annotated `n_ab` times and `(p, b≻a)` `n_ba` times,
    * both positive. Output one row per conflicted unordered pair,
    * `item_a < item_b`: (prompt_id, item_a, item_b, n_ab, n_ba).
    */
  def contradictions(prefs: DataFrame, promptCol: String, chosenCol: String,
                     rejectedCol: String): DataFrame = {
    val e = edges(prefs, promptCol, chosenCol, rejectedCol)
      .groupBy("prompt_id", "winner", "loser").agg(count(lit(1)).as("n"))
    val fwd = e.filter(col("winner") < col("loser"))
      .select(col("prompt_id"), col("winner").as("item_a"),
        col("loser").as("item_b"), col("n").as("n_ab"))
    val bwd = e.filter(col("winner") > col("loser"))
      .select(col("prompt_id"), col("loser").as("item_a"),
        col("winner").as("item_b"), col("n").as("n_ba"))
    fwd.join(bwd, Seq("prompt_id", "item_a", "item_b"))
      .select("prompt_id", "item_a", "item_b", "n_ab", "n_ba")
  }

  /** Directed 3-cycles `a≻b≻c≻a` within a prompt — the intransitive
    * triples that make a Bradley–Terry fit impossible to satisfy.
    * Distinct edges first (multiplicity is [[contradictions]]' job),
    * then two prompt-keyed hops; each cycle reports once, rotated so
    * `item_a` is the smallest member. Output: (prompt_id, item_a,
    * item_b, item_c).
    */
  def cycles3(prefs: DataFrame, promptCol: String, chosenCol: String,
              rejectedCol: String): DataFrame = {
    val e = edges(prefs, promptCol, chosenCol, rejectedCol).distinct()
    val e1 = e.select(col("prompt_id"), col("winner").as("item_a"),
      col("loser").as("item_b"))
    val e2 = e.select(col("prompt_id"), col("winner").as("item_b"),
      col("loser").as("item_c"))
    val e3 = e.select(col("prompt_id"), col("winner").as("item_c"),
      col("loser").as("item_a"))
    e1.join(e2, Seq("prompt_id", "item_b"))
      .filter(col("item_c") =!= col("item_a"))
      .join(e3, Seq("prompt_id", "item_c", "item_a"))
      // canonical rotation: emit each directed cycle once
      .filter(col("item_a") < col("item_b") && col("item_a") < col("item_c"))
      .select("prompt_id", "item_a", "item_b", "item_c")
  }

  /** Per-(prompt, item) win/loss record with an integer-ppm win rate —
    * the degenerate-item report (win_ppm 0 or 1e6 means the item never
    * loses/wins and contributes no ranking gradient). One union + one
    * agg. Output: (prompt_id, item, n_wins, n_losses, win_ppm).
    */
  def winRates(prefs: DataFrame, promptCol: String, chosenCol: String,
               rejectedCol: String): DataFrame = {
    val e = edges(prefs, promptCol, chosenCol, rejectedCol)
    e.select(col("prompt_id"), col("winner").as("item"), lit(1L).as("_w"))
      .unionAll(e.select(col("prompt_id"), col("loser").as("item"),
        lit(0L).as("_w")))
      .groupBy("prompt_id", "item")
      .agg(sum(col("_w")).as("n_wins"),
        sum(lit(1L) - col("_w")).as("n_losses"))
      .withColumn("win_ppm",
        expr("(n_wins * 1000000L) div (n_wins + n_losses)"))
  }
}
