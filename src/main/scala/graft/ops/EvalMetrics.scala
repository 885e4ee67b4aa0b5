package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text generation metrics (BLEU, ROUGE-N) over
  * candidate/reference token-array pairs — the eval-harness side of a
  * training-data pipeline: scoring model outputs against references,
  * regression-gating a fine-tune, or ranking synthetic rewrites of a
  * corpus against their sources.
  *
  * Both metrics ride ONE shared primitive: clipped n-gram multiset
  * overlap (`matched_n = Σ_g min(cf(g), rf(g))`), computed per ROW by
  * a native kernel — the cand/ref pair is colocated on its row, so
  * nothing shuffles until a corpus rollup pools the per-pair sums
  * (one 1-row agg). Nothing is quadratic, nothing broadcasts but
  * literals, and per-row state is the pair's own gram map.
  *
  * Determinism: every count is an exact long; ratios and logs are one
  * fixed double tree per output (engine-bit-identical); only the
  * ln-derived BLEU score is rounded (6 dp), the pure-rational ROUGE
  * ratios ship raw per the never-round-exact-derived-doubles rule.
  *
  * Reference behavior studied: the reference pipeline has no eval
  * module; this extends the engine's curation surface (quality
  * scoring family, `scripts/compute_kpis.py`-style derived metrics)
  * with the standard corpus-eval definitions.
  */
object EvalMetrics {

  /** Per-pair lengths + per-n clipped matches, pivoted wide:
    * (id, len_cand, len_ref, m_1..m_maxN, t_1..t_maxN) — computed
    * entirely MAP-SIDE by the
    * [[graft.functions.TextExpressions.ClippedTokenGramCounts]] kernel
    * (the pair is colocated on its row; the former side-tagged
    * explode→(id,n,gram)-agg lattice shuffled ~8 gram slots per token
    * through two hash aggs to arrive at the same per-pair counts).
    * The kernel is consumed through a Generate barrier so
    * CollapseProject can never re-inline it per field reference.
    */
  private def overlapWide(pairs: DataFrame, idCol: String, candCol: String,
                          refCol: String, maxN: Int): DataFrame =
    pairs.select(col(idCol),
        explode(array(graft.functions.TextExpressions.clippedTokenGramCounts(
          col(candCol), col(refCol), maxN))).as("_st"))
      .select(col(idCol),
        col("_st").getField("len_cand").as("len_cand"),
        col("_st").getField("len_ref").as("len_ref"),
        col("_st").getField("m").as("_m"))
      .select(col(idCol) +: col("len_cand") +: col("len_ref") +:
        ((1 to maxN).map(n => element_at(col("_m"), n).as(s"m$n")) ++
         (1 to maxN).map(n =>
           greatest(col("len_cand") - lit(n - 1L), lit(0L)).as(s"t$n"))): _*)

  /** Log-space brevity penalty + geometric-mean precision term over
    * exact longs: `min(0, 1 - len_r/len_c) + (1/N) Σ_n ln((m_n+1)/(t_n+1))`
    * with `t_n = max(len_c - n + 1, 0)`. Add-one smoothing is applied
    * to EVERY order (documented deviation from Chen–Cherry smooth-1,
    * which leaves n=1 raw) so the score is total even on disjoint
    * pairs. Kept in log space: `exp` is not cross-engine
    * bit-reproducible, `ln` of identical doubles is.
    */
  private def logBleuExpr(maxN: Int): org.apache.spark.sql.Column = {
    val prec = (1 to maxN).map { n =>
      log((col(s"m$n").cast("double") + lit(1.0)) /
          (col(s"t$n").cast("double") + lit(1.0)))
    }.reduce(_ + _)
    least(lit(0.0),
      lit(1.0) - col("len_ref").cast("double") / col("len_cand").cast("double")) +
      lit(1.0 / maxN) * prec
  }

  /** Sentence-level (per-pair) smoothed log-BLEU-4.
    * Output: (id, len_cand, len_ref, m1..m4, log_bleu).
    */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 4): DataFrame =
    overlapWide(pairs, idCol, candCol, refCol, maxN)
      .withColumn("log_bleu", round(logBleuExpr(maxN), 6))
      .select(col(idCol) +: col("len_cand") +: col("len_ref") +:
        ((1 to maxN).map(n => col(s"m$n")) :+ col("log_bleu")): _*)

  /** Corpus-level BLEU: the standard pooled form — per-pair clipped
    * matches `m_n` and slot totals `t_n = max(len_c − n + 1, 0)` are
    * summed over all pairs FIRST, then one log tree runs on the exact
    * long sums. One row: (n_pairs, len_cand, len_ref, m1..m4,
    * log_bleu). Integer sums are order-free.
    */
  def bleuCorpus(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String, maxN: Int = 4): DataFrame = {
    val wide = overlapWide(pairs, idCol, candCol, refCol, maxN)
    val aggs = sum("len_cand").as("len_cand") +:
      sum("len_ref").as("len_ref") +:
      ((1 to maxN).map(n => sum(s"m$n").as(s"m$n")) ++
       (1 to maxN).map(n => sum(s"t$n").as(s"t$n")))
    wide.agg(count(lit(1)).as("n_pairs"), aggs: _*)
      .withColumn("log_bleu", round(logBleuExpr(maxN), 6))
      .select(col("n_pairs") +: col("len_cand") +: col("len_ref") +:
        ((1 to maxN).map(n => col(s"m$n")) :+ col("log_bleu")): _*)
  }

  /** chrF (Popović 2015): character-n-gram F-score per pair, the
    * tokenizer-independent companion to BLEU/ROUGE (robust to
    * morphology and segmentation — the reason WMT reports it alongside
    * BLEU). Whitespace is removed entirely (the chrF definition), the
    * remaining character sequence feeds the SAME side-tagged gram
    * lattice as [[bleu]] (chars as 1-token "words"), and per order
    * n = 1..maxN:
    *
    *   P_n = m_n / t_n,  R_n = m_n / r_n,
    *   F_n = (1 + β²)·P·R / (β²·P + R)    (0 when m_n = 0)
    *
    * with t_n/r_n the cand/ref n-gram slot counts and β = 2
    * (recall-weighted, the chrF2 standard). The score is the plain
    * average of F_n over the orders — every operand is an exact long,
    * the score one fixed double tree, shipped raw.
    * Output: (id, len_cand, len_ref, chrf2).
    */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 6, betaSq: Int = 4): DataFrame = {
    // the clipped overlap is computed per ROW by the
    // ClippedCharGramCounts kernel — the cand/ref pair is colocated on
    // one row, so the explode→(id,n,gram)-agg lattice (right for the
    // CORPUS-pooled BLEU) only multiplied 6 slots/char into ~18M
    // shuffled rows here; the kernel's per-row hash-clip carries
    // identical counts with ZERO shuffles (21.4 s → ~2 s at sf0.1)
    def stripped(c: String) = regexp_replace(col(c), "\\s+", "")
    val p = pairs.select(col(idCol), stripped(candCol).as("_cs"),
      stripped(refCol).as("_rs"))
    // Generate barrier: explode(array(kernel)) pins ONE kernel
    // evaluation per row — projected field references stay attribute
    // reads instead of re-inlined kernel calls (see the kernel's doc)
    val wide = p.select(col(idCol),
        explode(array(graft.functions.TextExpressions.clippedCharGramCounts(
          col("_cs"), col("_rs"), maxN))).as("_st"))
      .select(col(idCol),
        col("_st").getField("len_cand").as("len_cand"),
        col("_st").getField("len_ref").as("len_ref"),
        col("_st").getField("m").as("_m"))
      .select(col(idCol) +: col("len_cand") +: col("len_ref") +:
        ((1 to maxN).map(n => element_at(col("_m"), n).as(s"m$n")) ++
         (1 to maxN).map(n =>
           greatest(col("len_cand") - lit(n - 1L), lit(0L)).as(s"t$n"))): _*)
    val fns = (1 to maxN).map { n =>
      val m = col(s"m$n").cast("double")
      val t = col(s"t$n").cast("double")
      val r = greatest(col("len_ref") - lit(n - 1L), lit(0L)).cast("double")
      val prF = (lit(1.0 + betaSq) * (m / t) * (m / r)) /
        (lit(betaSq.toDouble) * (m / t) + (m / r))
      when(col(s"m$n") > 0, prF).otherwise(lit(0.0))
    }
    wide.select(col(idCol), col("len_cand"), col("len_ref"),
      (fns.reduce(_ + _) / lit(maxN.toDouble)).as("chrf2"))
  }

  /** ROUGE-1/ROUGE-2 precision / recall / F1 per pair, from the same
    * clipped-overlap primitive: `p_n = m_n / t_cand_n`,
    * `r_n = m_n / t_ref_n`, `f_n = 2 p r / (p + r)` (0 when m = 0).
    * All ratios are fixed trees over exact longs — shipped raw,
    * unrounded. Output: (id, len_cand, len_ref,
    * r1_p, r1_r, r1_f, r2_p, r2_r, r2_f).
    */
  def rouge(pairs: DataFrame, idCol: String, candCol: String,
            refCol: String): DataFrame = {
    val wide = overlapWide(pairs, idCol, candCol, refCol, 2)
    def pr(n: Int) = {
      val m = col(s"m$n").cast("double")
      val tc = greatest(col("len_cand") - lit(n - 1L), lit(0L)).cast("double")
      val tr = greatest(col("len_ref") - lit(n - 1L), lit(0L)).cast("double")
      val p = when(col(s"m$n") === 0, lit(0.0)).otherwise(m / tc)
      val r = when(col(s"m$n") === 0, lit(0.0)).otherwise(m / tr)
      val f = when(col(s"m$n") === 0, lit(0.0))
        .otherwise(lit(2.0) * (m / tc) * (m / tr) / (m / tc + m / tr))
      Seq(p.as(s"r${n}_p"), r.as(s"r${n}_r"), f.as(s"r${n}_f"))
    }
    wide.select(col(idCol) +: col("len_cand") +: col("len_ref") +:
      (pr(1) ++ pr(2)): _*)
  }

  /** Unbiased pass@k estimator (Chen et al., "Evaluating Large
    * Language Models Trained on Code", 2021) — THE sampled-eval
    * metric for generation benchmarks: from n attempts per task with
    * c successes, the probability that at least one of k random
    * attempts passes,
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0..k−1} (n−c−i)/(n−i)
    *
    * computed as the finite ASCENDING-i product (never the naive
    * 1 − (1 − c/n)^k, which is biased high, and never factorials —
    * the product form is exact and overflow-free). Tasks with fewer
    * than k attempts are excluded (the estimator is undefined);
    * n − c < k short-circuits to exactly 1.0 before any division.
    * Sufficient statistics (n, c) are exact longs; the product fold
    * order is pinned on both engines. Output: one row per task
    * (task, n_attempts, n_correct, pass_at_k).
    *
    * Scale posture: one map-side-combinable hash agg to (task, n, c);
    * the k-term fold is per-row arithmetic.
    */
  def passAtK(df: DataFrame, taskCol: String, successCol: Column,
              k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val per = df.filter(col(taskCol).isNotNull)
      .groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).as("n_attempts"),
        sum(when(successCol, 1L).otherwise(0L)).cast("long").as("n_correct"))
      .filter(col("n_attempts") >= k)
    val nD = col("n_attempts").cast("double")
    val cD = col("n_correct").cast("double")
    val prod = aggregate(sequence(lit(0L), lit((k - 1).toLong)), lit(1.0),
      (acc, i) => acc * ((nD - cD - i) / (nD - i)))
    per.select(col("task"), col("n_attempts"), col("n_correct"),
      when(col("n_attempts") - col("n_correct") < k, lit(1.0))
        .otherwise(round(lit(1.0) - prod, 6)).as("pass_at_k"))
  }
}
