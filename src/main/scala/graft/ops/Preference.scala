package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
                     rejectedCol: String): DataFrame =
    pairNet(prefs, promptCol, chosenCol, rejectedCol)
      .filter(col("n_ab") > 0 && col("n_ba") > 0)
      .select("prompt_id", "item_a", "item_b", "n_ab", "n_ba")

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
    // winner + loser rows via ONE explode — a self-unionAll plans and
    // re-runs the vote-edge derivation twice (the nearDupClusters lesson)
    e.select(col("prompt_id"), explode(array(
        struct(col("winner").as("item"), lit(1L).as("_w")),
        struct(col("loser").as("item"), lit(0L).as("_w")))).as("_wl"))
      .select(col("prompt_id"), col("_wl.item").as("item"), col("_wl._w").as("_w"))
      .groupBy("prompt_id", "item")
      .agg(sum(col("_w")).as("n_wins"),
        sum(lit(1L) - col("_w")).as("n_losses"))
      .withColumn("win_ppm",
        expr("(n_wins * 1000000L) div (n_wins + n_losses)"))
  }

  /** Undirected game counts per prompt: (prompt_id, item_a, item_b,
    * n_ab, n_ba) for every unordered pair with at least one vote in
    * either direction, `item_a < item_b`, missing direction 0.
    */
  private def pairNet(prefs: DataFrame, promptCol: String, chosenCol: String,
                      rejectedCol: String): DataFrame = {
    val e = edges(prefs, promptCol, chosenCol, rejectedCol)
      .groupBy("prompt_id", "winner", "loser").agg(count(lit(1)).as("n"))
    val fwd = e.filter(col("winner") < col("loser"))
      .select(col("prompt_id"), col("winner").as("item_a"),
        col("loser").as("item_b"), col("n").as("n_ab"))
    val bwd = e.filter(col("winner") > col("loser"))
      .select(col("prompt_id"), col("loser").as("item_a"),
        col("winner").as("item_b"), col("n").as("n_ba"))
    fwd.join(bwd, Seq("prompt_id", "item_a", "item_b"), "full_outer")
      .select(col("prompt_id"), col("item_a"), col("item_b"),
        coalesce(col("n_ab"), lit(0L)).as("n_ab"),
        coalesce(col("n_ba"), lit(0L)).as("n_ba"))
  }

  /** Length-bias audit — the classic RLHF failure mode: annotators (and
    * reward models trained on them) systematically prefer the LONGER
    * response, and a corpus with a strong length signal teaches verbosity
    * instead of quality. Joins each vote to the two responses' token
    * counts and reports, per prompt, how often the winner was the longer
    * response (integer-ppm). Both joins are (prompt, item)-keyed
    * equi-joins against the bounded response table.
    * Output: (prompt_id, n_votes, n_longer_wins, n_shorter_wins,
    * n_equal, longer_win_ppm).
    */
  def lengthBias(prefs: DataFrame, responses: DataFrame,
                 promptCol: String, chosenCol: String, rejectedCol: String,
                 rPromptCol: String, itemCol: String, lenCol: String): DataFrame = {
    val r = responses.select(col(rPromptCol).as("prompt_id"),
      col(itemCol).as("_item"), col(lenCol).cast("long").as("_len"))
    edges(prefs, promptCol, chosenCol, rejectedCol)
      .join(r.withColumnRenamed("_item", "winner")
        .withColumnRenamed("_len", "_wlen"), Seq("prompt_id", "winner"))
      .join(r.withColumnRenamed("_item", "loser")
        .withColumnRenamed("_len", "_llen"), Seq("prompt_id", "loser"))
      .groupBy("prompt_id").agg(
        count(lit(1)).as("n_votes"),
        sum(when(col("_wlen") > col("_llen"), 1L).otherwise(0L))
          .as("n_longer_wins"),
        sum(when(col("_wlen") < col("_llen"), 1L).otherwise(0L))
          .as("n_shorter_wins"),
        sum(when(col("_wlen") === col("_llen"), 1L).otherwise(0L))
          .as("n_equal"))
      .withColumn("longer_win_ppm",
        expr("(n_longer_wins * 1000000L) div n_votes"))
  }

  /** Copeland ranking: an item's score is (opponents it beats on net
    * directed votes) − (opponents it loses to); ties on net count score
    * zero. Robust to vote multiplicity and well-defined even on the
    * intransitive corpora [[cycles3]] flags (where Bradley–Terry's
    * likelihood surface fights itself). Pairwise nets are bounded by
    * per-prompt item counts; the final rank is a per-prompt window.
    * Output: (prompt_id, item, n_opp, wins, losses, score, rnk).
    */
  def copeland(prefs: DataFrame, promptCol: String, chosenCol: String,
               rejectedCol: String): DataFrame = {
    val net = pairNet(prefs, promptCol, chosenCol, rejectedCol)
    // both sides of each game via ONE explode — a self-unionAll plans
    // and re-runs the vote aggregation twice (the nearDupClusters lesson)
    val perItem = net.select(col("prompt_id"), explode(array(
        struct(col("item_a").as("item"),
          (col("n_ab") > col("n_ba")).cast("long").as("_w"),
          (col("n_ab") < col("n_ba")).cast("long").as("_l")),
        struct(col("item_b").as("item"),
          (col("n_ba") > col("n_ab")).cast("long").as("_w"),
          (col("n_ba") < col("n_ab")).cast("long").as("_l")))).as("_s"))
      .select(col("prompt_id"), col("_s.item").as("item"),
        col("_s._w").as("_w"), col("_s._l").as("_l"))
    perItem.groupBy("prompt_id", "item")
      .agg(count(lit(1)).as("n_opp"), sum(col("_w")).as("wins"),
        sum(col("_l")).as("losses"))
      .withColumn("score", col("wins") - col("losses"))
      .withColumn("rnk", dense_rank().over(Window.partitionBy("prompt_id")
        .orderBy(col("score").desc, col("item"))))
  }

  /** Bradley–Terry strengths by `iters` fixed minorize–maximize rounds
    * from the uniform start: s_i ← W_i / Σ_j N_ij/(s_i+s_j). Fixed
    * iteration count (not convergence-tested) keeps the computation a
    * static dataflow — `iters` joins+aggregations, every intermediate
    * prompt-keyed and bounded by per-prompt item counts. The per-item
    * denominator folds over the opponent list SORTED by opponent id
    * (cross-engine bit-reproducible double sums — the repo-wide
    * in-order-fold discipline); zero-win items converge to strength 0,
    * which is the honest fit. Output: (prompt_id, item, n_games,
    * n_wins, strength).
    */
  def bradleyTerry(prefs: DataFrame, promptCol: String, chosenCol: String,
                   rejectedCol: String, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 8, "iters in [1, 8]")
    val net = pairNet(prefs, promptCol, chosenCol, rejectedCol)
    // both orientations: (prompt, i, j, games-between). CACHED: every
    // MM round references this frame twice and each strength frame is
    // rebuilt from it — uncached, the lineage re-derives the whole
    // corpus-side aggregation per round and the plan grows
    // exponentially in `iters`. The frame itself is bounded by
    // prompts × per-prompt-item-pairs, never the vote volume.
    val pairs = net.select(col("prompt_id"), col("item_a").as("i"),
        col("item_b").as("j"), (col("n_ab") + col("n_ba")).as("nij"))
      .unionAll(net.select(col("prompt_id"), col("item_b").as("i"),
        col("item_a").as("j"), (col("n_ab") + col("n_ba")).as("nij")))
      .cache()
    val stats = pairs.groupBy("prompt_id", "i").agg(sum("nij").as("n_games"))
      .join(edges(prefs, promptCol, chosenCol, rejectedCol)
          .groupBy("prompt_id", "winner").agg(count(lit(1)).as("n_wins"))
          .withColumnRenamed("winner", "i"),
        Seq("prompt_id", "i"), "left")
      .select(col("prompt_id"), col("i"),  col("n_games"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"))
      .cache()
    var s = stats.select(col("prompt_id"), col("i"), lit(1.0d).as("s"))
    for (_ <- 1 to iters) {
      val terms = pairs
        .join(s.withColumnRenamed("s", "_si"), Seq("prompt_id", "i"))
        .join(s.select(col("prompt_id"), col("i").as("j"), col("s").as("_sj")),
          Seq("prompt_id", "j"))
        .select(col("prompt_id"), col("i"), col("j"),
          (col("nij").cast("double") / (col("_si") + col("_sj"))).as("_t"))
      s = terms.groupBy("prompt_id", "i")
        .agg(aggregate(
          array_sort(collect_list(struct(col("j"), col("_t")))),
          lit(0.0d), (acc, x) => acc + x.getField("_t")).as("_denom"))
        .join(stats, Seq("prompt_id", "i"))
        .select(col("prompt_id"), col("i"),
          (col("n_wins").cast("double") / col("_denom")).as("s"))
    }
    stats.join(s, Seq("prompt_id", "i"))
      .select(col("prompt_id"), col("i").as("item"), col("n_games"),
        col("n_wins"), col("s").as("strength"))
  }
}
