package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-reproducible sampling and splitting for
  * training-data curation. Assignment depends ONLY on the row's key —
  * an md5-derived bucket — never on partitioning, row order, or an RNG
  * seed, so:
  *
  *   - the same row lands in the same split on every run, every engine,
  *     and every cluster size (the property a train/held-out split must
  *     have at 100 TB — `df.sample()`/`rand()` is partition-order
  *     dependent and unrepeatable after a repartition);
  *   - membership is checkable in SQL anywhere md5 exists, so an
  *     auditor can recompute the split without Spark;
  *   - sampling composes with incremental ingest: newly arrived rows
  *     join the same split their key dictates, no global state.
  *
  * Everything is a pure `Column` expression (codegen'd, map-side, no
  * shuffle).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the key rendered as a
    * string: the first 8 hex chars parsed as an unsigned 32-bit int, mod
    * `buckets`. Reproducible anywhere: DuckDB spells it
    * `('0x' || substr(md5(k::VARCHAR), 1, 8))::BIGINT % buckets`.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column = {
    require(buckets > 0, "buckets must be positive")
    conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
  }

  /** Keep rows whose bucket falls below `keepBuckets` — a deterministic
    * `keepBuckets / buckets` fraction of the keyspace.
    */
  def sampleByHash(df: DataFrame, keyCol: String, keepBuckets: Int,
                   buckets: Int = 100): DataFrame = {
    require(keepBuckets >= 0 && keepBuckets <= buckets, "keepBuckets out of range")
    df.filter(hashBucket(col(keyCol), buckets) < keepBuckets)
  }

  /** Label each row `train` / `test`: the top `testBuckets` of the
    * keyspace become the held-out set. Split before dedup/filtering so
    * leakage can't move a key across the boundary.
    */
  def trainTestSplit(df: DataFrame, keyCol: String, testBuckets: Int,
                     buckets: Int = 100, splitCol: String = "split"): DataFrame = {
    require(testBuckets >= 0 && testBuckets <= buckets, "testBuckets out of range")
    df.withColumn(splitCol,
      when(hashBucket(col(keyCol), buckets) >= buckets - testBuckets, lit("test"))
        .otherwise(lit("train")))
  }

  /** Temporal train/test split with an EMBARGO gap — the
    * time-respecting split for forecasting / sequence models, where a
    * hash split leaks future information into training. Rows at or
    * before `cutoff` are `train`; rows inside `(cutoff,
    * cutoff + embargo]` are `embargo` (discarded by the caller —
    * label windows and rolling features straddling the cutoff leak
    * across it; the gap is the standard purge, cf. combinatorial
    * purged CV); rows after the embargo are `test`. Pure map-side
    * projection — no shuffle, no state, trivially reproducible.
    * Output: every input row (tie, ts, split).
    */
  def temporalSplit(df: DataFrame, tsCol: String, tieCol: String,
                    cutoff: String, embargo: String): DataFrame =
    df.filter(col(tsCol).isNotNull && col(tieCol).isNotNull)
      .select(col(tieCol), col(tsCol),
        when(col(tsCol) <= to_timestamp(lit(cutoff)), "train")
          .when(col(tsCol) <=
            to_timestamp(lit(cutoff)) + expr(s"interval $embargo"), "embargo")
          .otherwise("test").as("split"))

  /** K-fold cross-validation assignment: fold ∈ [0, k) from the key's
    * md5 bucket. Map-side, no shuffle, and leakage-safe by construction
    * when `keyCol` is the GROUP key (a user id, a dedup-cluster id): all
    * rows sharing the key land in the same fold, so no group straddles a
    * train/validation boundary. Fold sizes are hash-proportional
    * (±binomial noise); use [[kfoldStratified]] when exact balance
    * matters.
    */
  def kfoldAssign(df: DataFrame, keyCol: String, k: Int,
                  foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    df.withColumn(foldCol, hashBucket(col(keyCol), k))
  }

  /** Stratified EXACTLY-balanced k-fold: within each stratum, rows are
    * ranked in hash order and fold = (rank−1) mod k — every stratum's
    * fold sizes differ by at most one row, so a rare language/class is
    * represented in every fold (plain hash assignment can starve a
    * 30-row stratum's fold entirely). Deterministic under any
    * partitioning: the rank orders by (md5(key), key).
    *
    * Output: input columns + `foldCol`.
    *
    * Scale posture: one ranked window per stratum — the same shape as
    * [[capPerGroup]]; skew ceiling is the largest stratum. When strata
    * are huge and balance can stay approximate, [[kfoldAssign]] is the
    * windowless map-side path.
    */
  def kfoldStratified(df: DataFrame, keyCol: String, strataCol: String,
                      k: Int, foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    df.withColumn(foldCol, ((hashRank(strataCol, keyCol) - 1) % k).cast("long"))
  }

  /** Stratified deterministic sampling: per-stratum keep thresholds
    * (buckets out of `buckets`), strata not listed keep nothing. The
    * per-class rebalancing move of a training-data pipeline (e.g. keep
    * 100% of rare languages, 5% of English) — same hash, so a row's
    * fate still never depends on order or partitioning.
    */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, strataCol: String,
                             keepBuckets: Map[String, Int],
                             buckets: Int = 100): DataFrame = {
    require(keepBuckets.values.forall(k => k >= 0 && k <= buckets), "keepBuckets out of range")
    val threshold = keepBuckets.foldLeft(lit(0)) { case (el, (stratum, keep)) =>
      when(col(strataCol) === stratum, lit(keep)).otherwise(el)
    }
    df.filter(hashBucket(col(keyCol), buckets) < threshold)
  }

  /** Deterministic hash-order rank within a group: 1 = the group's
    * first-kept row. Ordering by (md5(key), key) is stable under any
    * partitioning AND engine-reproducible (the key tiebreak covers the
    * measure-zero md5-collision case).
    */
  private def hashRank(groupCol: String, keyCol: String): Column = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string").cast("binary"))
    row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(h, col(keyCol))).cast("long")
  }

  /** Cap each group at `maxRows` rows, chosen by hash order — the
    * per-source quota of a corpus-curation pipeline ("at most N docs
    * per domain"), with the same determinism contract as the splits:
    * which rows survive depends only on their keys, so re-runs and
    * incremental appends agree (a row that made the cut can only be
    * displaced by a lower-hash newcomer, never by reordering).
    *
    * Scale posture: one window per group (shuffle by group; rank
    * truncation is a WindowGroupLimit pushdown — per-partition bounded
    * heaps when `maxRows` is small), no join, no driver state.
    */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  maxRows: Int): DataFrame = {
    require(maxRows >= 1, "cap must keep at least one row")
    // null keys are dropped, not ranked: md5(null) is null, which would
    // sort FIRST and fill the quota with rows whose inter-se order is
    // partition-dependent — exactly the nondeterminism this operator
    // promises away. A row without identity has no stable fate.
    df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("_hr", hashRank(groupCol, keyCol))
      .filter(col("_hr") <= maxRows)
      .drop("_hr")
  }

  /** Multi-way weighted split (train/val/test/...): the keyspace's
    * [0, buckets) hash range is carved into contiguous slices sized by
    * integer `parts` (e.g. `Seq("train" -> 90, "val" -> 5, "test" -> 5)`
    * with buckets = 100), assigned in listed order. All arithmetic is
    * integer, so split membership is bit-reproducible on any engine
    * that has md5 — the auditability contract of [[trainTestSplit]],
    * generalized past two ways. Rows keep every input column plus
    * `splitCol`. A NULL key lands in the FIRST listed part (the same
    * fate [[trainTestSplit]] gives it — its `otherwise` branch is
    * `train`), never in a held-out slice: without this guard the
    * null-propagating `when` chain would fall through to the LAST
    * part and quietly seed the eval split with identityless rows.
    */
  def splitByWeights(df: DataFrame, keyCol: String,
                     parts: Seq[(String, Int)], buckets: Int = 100,
                     splitCol: String = "split"): DataFrame = {
    require(parts.nonEmpty && parts.forall(_._2 >= 0), "parts must be non-negative")
    require(parts.map(_._2).sum == buckets,
      s"parts must sum to buckets=$buckets (got ${parts.map(_._2).sum})")
    val b = hashBucket(col(keyCol), buckets)
    val cums = parts.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assign = parts.zip(cums).init.foldRight(lit(parts.last._1)) {
      case (((name, _), cum), el) => when(b < cum, lit(name)).otherwise(el)
    }
    df.withColumn(splitCol,
      when(b.isNull, lit(parts.head._1)).otherwise(assign))
  }

  /** The LARGEST exactly-proportioned mixture a corpus can serve by
    * downsampling: given integer mixture parts per source (e.g. web 7,
    * books 2, code 1), find the max total `N` with `n_s ≥ parts_s·N/P`
    * for every listed source (`P` = Σ parts), then keep exactly
    * `floor(parts_s·N/P)` rows per source, chosen by hash order.
    * Sources not listed are dropped; all quota arithmetic is BIGINT
    * (multiply before divide), so quotas are engine-exact.
    *
    * This is the pretraining-mixture primitive: "give me the biggest
    * corpus that is exactly 70/20/10 web/books/code" — determined
    * entirely by row keys, so re-runs, engines, and cluster sizes
    * agree row-for-row.
    *
    * Scale posture: per-source counts are one hash agg (|sources|
    * rows); capacity is an agg over THAT frame, broadcast back; the
    * membership test is the same per-source hash-rank window as
    * [[capPerGroup]]. No driver math, no collect.
    */
  def mixToProportions(df: DataFrame, sourceCol: String, keyCol: String,
                       parts: Map[String, Int]): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0), "parts must be positive")
    val totalParts = parts.values.sum
    val partsExpr = parts.foldLeft(lit(null).cast("long")) {
      case (el, (s, p)) => when(col(sourceCol) === s, lit(p.toLong)).otherwise(el)
    }
    val listed = df
      .filter(col(sourceCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("_parts", partsExpr)
      .filter(col("_parts").isNotNull)
    // right-join the full parts list so a LISTED source with ZERO rows
    // still constrains capacity (n = 0 → cap 0 → empty output, per the
    // "every listed source" contract above); an agg over present rows
    // only would silently ship a mixture missing one ingredient
    val declared = df.sparkSession.createDataFrame(
      parts.toSeq.map { case (s, p) => (s, p.toLong) })
      .toDF(sourceCol, "_parts")
    val sizes = listed.groupBy(col(sourceCol), col("_parts"))
      .agg(count(lit(1)).as("_n"))
      .join(declared, Seq(sourceCol, "_parts"), "right")
      .withColumn("_n", coalesce(col("_n"), lit(0L)))
    // capacity: max N with floor(parts_s * N / P) <= n_s for all s,
    // i.e. N = min over s of floor(n_s * P / parts_s)
    val capacity = sizes
      .agg(min(expr(s"_n * $totalParts div _parts")).as("_cap"))
    val quotas = sizes.crossJoin(broadcast(capacity))
      .select(col(sourceCol),
        expr(s"_parts * _cap div $totalParts").as("_quota"))
    listed
      .withColumn("_hr", hashRank(sourceCol, keyCol))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("_hr") <= col("_quota"))
      .drop("_hr", "_quota", "_parts")
  }

  /** Per-source epoch repetition — the UPSAMPLING half of mixture
    * building ("repeat the rare source 2.5×"): each row of source `s`
    * is emitted with epoch indices `0 .. ceil(e_s)-1`, where the final
    * partial epoch keeps the deterministic `frac(e_s)` slice of the
    * keyspace by hash bucket. Epochs are given in basis points
    * (`25000` = 2.5 epochs) so the partial-epoch membership test is
    * pure integer: `hashBucket(key, 10000) < e_bp mod 10000`.
    * Output: every kept (row, epoch) pair with an `epoch` column —
    * downstream shuffles by (key, epoch) spread the copies.
    *
    * Scale posture: a generator expression per row (`explode` of a
    * 0..ceil(e)-1 sequence) — map-side, no shuffle, no window; output
    * volume is the mixture designer's stated blow-up factor, reached
    * without ever materializing a driver-side plan.
    */
  def epochRepeat(df: DataFrame, sourceCol: String, keyCol: String,
                  epochsBp: Map[String, Int],
                  epochCol: String = "epoch"): DataFrame = {
    require(epochsBp.values.forall(_ > 0), "epochs must be positive")
    val bpExpr = epochsBp.foldLeft(lit(null).cast("long")) {
      case (el, (s, bp)) => when(col(sourceCol) === s, lit(bp.toLong)).otherwise(el)
    }
    val full = expr("_bp div 10000")                   // whole epochs (int div)
    val partialBp = col("_bp") % 10000L                // leftover fraction
    df.filter(col(sourceCol).isNotNull && col(keyCol).isNotNull)
      .withColumn("_bp", bpExpr)
      .filter(col("_bp").isNotNull)
      .withColumn("_ne", // number of epochs this ROW emits
        full + when(hashBucket(col(keyCol), 10000) < partialBp, 1L).otherwise(0L))
      // explode of the empty array drops zero-epoch rows (a key outside
      // the partial slice of a sub-1-epoch source); sequence(0, -1)
      // would instead generate a DESCENDING [0, -1]
      .withColumn(epochCol,
        explode(when(col("_ne") > 0, sequence(lit(0L), col("_ne") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .drop("_bp", "_ne")
  }

  /** Fill a TOKEN budget across sources — the final assembly step of a
    * pretraining mixture: given a total budget `budget` (tokens) and
    * integer source weights, each source gets the floor-integer quota
    * `w_s · budget / Σw`, and keeps the maximal HASH-ORDER PREFIX of
    * its documents whose running token sum stays within quota. Rows
    * need a precomputed `tokensCol` (> 0; compose with
    * `TextAnalysis.tokenCount` / `bpeishTokenCount` upstream), and
    * membership depends only on keys + token counts, so re-runs,
    * engines, and cluster layouts agree row-for-row. Sub-quota floor
    * loss is < Σw tokens total (documented, not redistributed); a doc
    * straddling the quota boundary is dropped, leaving ≤ one doc's
    * worth of slack per source.
    *
    * Scale posture: the naive plan (one running-sum window per source)
    * serializes a source's billions of rows through one task — the
    * same skew failure as the trending window. Here the prefix sum is
    * TWO-LEVEL: the top md5 byte buckets each source into 256 slices
    * whose lexicographic order EQUALS the global hash order (the
    * bucket is a prefix of the sort key), so per-(source, bucket)
    * token masses aggregate map-side into a |sources|·256-row frame,
    * bucket offsets are a window over that tiny frame, and the
    * within-bucket running sum runs 256-way parallel per source. The
    * offset join broadcasts. Identical output to the naive plan,
    * none of its skew.
    */
  def fillTokenBudget(df: DataFrame, sourceCol: String, keyCol: String,
                      tokensCol: String, budget: Long,
                      weights: Map[String, Int]): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(weights.values.max.toLong <= Long.MaxValue / math.max(budget, 1L),
      "w * budget must not overflow a long")
    import org.apache.spark.sql.expressions.Window
    val totalW = weights.values.sum
    val wExpr = weights.foldLeft(lit(null).cast("long")) {
      case (el, (s, p)) => when(col(sourceCol) === s, lit(p.toLong)).otherwise(el)
    }
    val listed = df
      .filter(col(sourceCol).isNotNull && col(keyCol).isNotNull &&
        col(tokensCol).isNotNull && col(tokensCol) > 0)
      .withColumn("_w", wExpr)
      .filter(col("_w").isNotNull)
      .withColumn("_h", md5(col(keyCol).cast("string").cast("binary")))
      // top byte of the hash: lowercase-hex lexicographic order is
      // numeric order, so (bucket, hash) sorts identically to (hash)
      .withColumn("_hb", conv(substring(col("_h"), 1, 2), 16, 10).cast("long"))
    val bucketSums = listed.groupBy(col(sourceCol), col("_hb"))
      .agg(sum(col(tokensCol)).as("_bt"))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("_hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("_off", coalesce(sum("_bt").over(wOff), lit(0L)))
      .select(col(sourceCol), col("_hb"), col("_off"))
    val wIn = Window.partitionBy(col(sourceCol), col("_hb"))
      .orderBy(col("_h"), col(keyCol))
    listed
      .join(broadcast(offsets), Seq(sourceCol, "_hb"))
      .withColumn("_cum", col("_off") + sum(col(tokensCol)).over(wIn))
      .withColumn("_quota", expr(s"_w * ${budget}L div $totalW"))
      .filter(col("_cum") <= col("_quota"))
      .drop("_w", "_h", "_hb", "_off", "_cum", "_quota")
  }

  /** Balance classes by downsampling every class to the size of the
    * smallest one, hash-ordered: the cheap de-bias step before
    * training when one label dominates. Exact — every class emits
    * exactly `min(class sizes)` rows (assuming distinct keys).
    *
    * Scale posture: class sizes are one hash agg (|classes| rows,
    * broadcast as a scalar min); membership is the same per-class
    * window as [[capPerGroup]]. Nothing driver-side, nothing
    * order-dependent.
    */
  def balanceClasses(df: DataFrame, labelCol: String, keyCol: String): DataFrame = {
    // null keys dropped for the same determinism reason as capPerGroup
    val clean = df.filter(col(labelCol).isNotNull && col(keyCol).isNotNull)
    val sizes = clean.groupBy(col(labelCol)).agg(count(lit(1)).as("_n"))
    val minN = sizes.agg(min("_n").as("_min_n"))
    clean
      .withColumn("_hr", hashRank(labelCol, keyCol))
      .crossJoin(broadcast(minN))
      .filter(col("_hr") <= col("_min_n"))
      .drop("_hr", "_min_n")
  }

  /** Weighted sampling WITHOUT replacement, k rows, deterministic: the
    * Efraimidis–Spirakis A-ES scheme with the uniform draw derived from
    * the row key's md5 instead of an RNG. Each row gets
    * `u = (hv + 1) / 2⁵²` (hv = 52-bit md5 point; +1 keeps u in (0,1])
    * and priority `-ln(u) / w` — the exponential-race form of
    * "key = u^(1/w)"; the k SMALLEST priorities win. Inclusion
    * probability is proportional-to-weight in the without-replacement
    * sense, yet the draw is reproducible on any engine with md5 and
    * `ln`, repartition-proof, and auditable row-by-row in SQL.
    *
    * Determinism note: priorities are doubles, but they only ORDER the
    * rows (never land in the output), so cross-engine agreement needs
    * only that no two rows' priorities straddle an ulp — measure-zero
    * for md5-derived draws. Ties (identical key text) break by key.
    *
    * Scale posture: priority is a pure map-side expression; the k-of-n
    * cut is `orderBy.limit` → TakeOrderedAndProject (bounded
    * per-partition heaps, one k·partitions merge), never a global sort.
    * Output: (key, weight) for the k winners.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val cand = df
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(keyCol).as("key"), col(weightCol).cast("long").as("weight"))
      .withColumn("_hv",
        conv(substring(md5(col("key").cast("string").cast("binary")), 1, 13),
          16, 10).cast("long"))
      .withColumn("_pri",
        -log((col("_hv") + 1).cast("double") / lit(4503599627370496.0)) /
          col("weight").cast("double"))
    cand.orderBy(col("_pri"), col("key")).limit(k)
      .select(col("key"), col("weight"))
  }

  /** Quality-ranked selection under a token budget: take rows in
    * (score desc, key asc) order while the running token total stays
    * ≤ `budget` — the "keep the best N tokens" step of a data-selection
    * pipeline (DSIR/quality-classifier scores in, training corpus out).
    * Greedy prefix by rank, not knapsack: a row that would cross the
    * budget is dropped and LATER (worse) rows that still fit are NOT
    * admitted — the cut is a clean score threshold, which is the
    * curation semantics people actually want (admitting worse docs
    * because a better one was large inverts the ranking).
    *
    * The naive rendering is one global `ORDER BY score DESC` running
    * sum — a single-partition window over every candidate row, the
    * trending-style skew ceiling. Here the cumsum is TWO-LEVEL, the
    * [[fillTokenBudget]] trick keyed by score instead of hash: level 1
    * buckets rows by `score_ppm >> bucketShift` (arithmetic shift =
    * floor-division by 2^shift on BOTH engines, so negative scores
    * bucket consistently), aggregates per-bucket token totals (tiny
    * frame, one small window for exclusive bucket offsets); level 2
    * runs the running sum per bucket, `2^shift`-odd buckets in
    * parallel. Because bucket order is score order (floor-div is
    * monotone), offset + within-bucket cumsum ≡ the global cumsum —
    * bit-identically, these are BIGINT sums.
    *
    * Output: the selected rows as (key, score_ppm, n_tokens).
    * Rows with null key/score/tokens or tokens ≤ 0 are not candidates.
    * Callers pick `bucketShift` so a bucket ≈ one score "tier"
    * (default 16: 65 536 ppm ≈ 6.5 % of score mass per bucket).
    */
  def selectByScoreBudget(df: DataFrame, keyCol: String, scorePpmCol: String,
                          tokensCol: String, budget: Long,
                          bucketShift: Int = 16): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(bucketShift >= 0 && bucketShift <= 48, "bucketShift in [0, 48]")
    import org.apache.spark.sql.expressions.Window
    val cand = df
      .filter(col(keyCol).isNotNull && col(scorePpmCol).isNotNull &&
        col(tokensCol).isNotNull && col(tokensCol) > 0)
      .select(col(keyCol).as("key"),
        col(scorePpmCol).cast("long").as("score_ppm"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("_bk", shiftright(col("score_ppm"), bucketShift))
    val bucketSums = cand.groupBy("_bk").agg(sum("n_tokens").as("_bt"))
    val wOff = Window.orderBy(col("_bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("_off", coalesce(sum("_bt").over(wOff), lit(0L)))
      .select(col("_bk"), col("_off"))
    val wIn = Window.partitionBy(col("_bk"))
      .orderBy(col("score_ppm").desc, col("key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cand
      .join(broadcast(offsets), Seq("_bk"))
      .withColumn("_cum", col("_off") + sum("n_tokens").over(wIn))
      .filter(col("_cum") <= budget)
      .select(col("key"), col("score_ppm"), col("n_tokens"))
  }

  /** 2-D Pareto front (skyline): the rows not dominated under
    * (minimize `costCol`, maximize `scoreCol`) — the data-selection
    * frontier question "which documents are the best quality you can
    * get at each token cost?" that a greedy budget cut
    * ([[selectByScoreBudget]]) answers only for ONE budget. A row is
    * dominated iff some other row has cost ≤ AND score ≥ with at least
    * one strict; equal (cost, score) duplicates survive together
    * (neither dominates).
    *
    * The textbook rendering — sort by cost, keep rows whose score
    * exceeds the running max — is a single-partition global window.
    * Here the running max is TWO-LEVEL, the [[selectByScoreBudget]]
    * bucket trick on the cost axis: per-bucket max scores (tiny frame)
    * give exclusive prefix maxes over buckets; within a bucket a
    * RANGE-frame window (`cost` strictly preceding) supplies the
    * intra-bucket prefix max, `2^shift`-odd buckets in parallel; a
    * per-cost window supplies the max at the row's own cost. Survive =
    * score > every strictly-cheaper row's max AND score = own-cost max.
    * All comparisons are BIGINT — no float ordering to pin.
    *
    * Output: the frontier as (key, cost, score), the keeps only.
    */
  def paretoFront(df: DataFrame, keyCol: String, costCol: String,
                  scoreCol: String, bucketShift: Int = 16): DataFrame = {
    require(bucketShift >= 0 && bucketShift <= 48, "bucketShift in [0, 48]")
    import org.apache.spark.sql.expressions.Window
    val cand = df
      .filter(col(keyCol).isNotNull && col(costCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(keyCol).as("key"), col(costCol).cast("long").as("cost"),
        col(scoreCol).cast("long").as("score"))
      .withColumn("_bk", shiftright(col("cost"), bucketShift))
    val bucketMax = cand.groupBy("_bk").agg(max("score").as("_bm"))
    val wOff = Window.orderBy(col("_bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketMax
      .withColumn("_om", max("_bm").over(wOff)) // null for the first bucket
      .select(col("_bk"), col("_om"))
    val wIn = Window.partitionBy(col("_bk")).orderBy(col("cost"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wAt = Window.partitionBy(col("_bk"), col("cost"))
    cand
      .join(broadcast(offsets), Seq("_bk"))
      .withColumn("_pm", greatest(coalesce(col("_om"), lit(Long.MinValue)),
        coalesce(max("score").over(wIn), lit(Long.MinValue))))
      .withColumn("_am", max("score").over(wAt))
      .filter(col("score") > col("_pm") && col("score") === col("_am"))
      .select(col("key"), col("cost"), col("score"))
  }

  /** Deterministic contrastive negative sampling: for each anchor row,
    * `k` rows with a DIFFERENT label, drawn from a bounded
    * hash-selected candidate pool — the random-negatives companion to
    * `Similarity.hardNegatives` (uniform negatives for InfoNCE-style
    * training; hard negatives for metric refinement). Which negatives
    * an anchor gets depends only on (anchor key, candidate key): the
    * per-pair md5 re-ranks the pool per anchor, so negatives vary
    * across anchors yet every engine, run, and partitioning agrees.
    *
    * Output: (anchor, negative, rank), rank 1..≤k (fewer when the pool
    * holds < k other-label rows).
    *
    * Scale posture: the pool is `TakeOrderedAndProject` (bottom
    * `poolSize` by (md5(key), key) — bounded heap per partition),
    * collapsed to ONE array row and broadcast; per-anchor selection is
    * a map-side array transform + sort + slice over ≤ poolSize
    * elements — NO shuffle, no window: n_anchors·k output rows from a
    * single pass. The pool bound is the sampling trade: negatives come
    * from a fixed poolSize-row universe per run (standard practice —
    * in-batch negatives have the same property).
    */
  def negativeSample(df: DataFrame, keyCol: String, labelCol: String,
                     k: Int, poolSize: Int = 1024): DataFrame = {
    require(k >= 1 && poolSize >= k, "need 1 <= k <= poolSize")
    val key = col(keyCol); val label = col(labelCol)
    val pool = df.filter(key.isNotNull && label.isNotNull)
      .select(key.as("_pk"), label.as("_pl"),
        md5(key.cast("string").cast("binary")).as("_h"))
      .orderBy(col("_h"), col("_pk"))
      .limit(poolSize)
      .agg(collect_list(struct(col("_pk"), col("_pl"))).as("_pool"))
    df.filter(key.isNotNull && label.isNotNull)
      .select(key.as("anchor"), label.as("_al"))
      .crossJoin(broadcast(pool))
      .withColumn("_ranked", slice(array_sort(transform(
        filter(col("_pool"), p => p.getField("_pl") =!= col("_al")),
        p => struct(
          md5(concat_ws("|", col("anchor").cast("string"),
            p.getField("_pk").cast("string")).cast("binary")).as("h"),
          p.getField("_pk").as("pk")))), 1, k))
      .select(col("anchor"), posexplode(col("_ranked")))
      .select(col("anchor"), col("col.pk").as("negative"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Temperature-scaled source mixture — the multilingual-rebalancing
    * sampler (XLM-R/mT5-style α-sampling): source `s` gets a share of
    * the row `budget` proportional to `n_s^α`, flattening the natural
    * distribution so head languages/domains stop drowning the tail
    * (α = 1 keeps natural proportions; α → 0 approaches uniform).
    *
    * α is quantized to quarters (`alphaQuarters`/4 ∈ {¼, ½, ¾, 1})
    * deliberately: those powers are built from `sqrt` alone (¾ = one
    * multiply of two sqrt results), and IEEE-754 requires sqrt to be
    * correctly rounded — so `floor(1e6 · n^α)` is BIT-IDENTICAL on any
    * compliant engine, where a libm `pow` would not be. Weights and
    * quotas are then pure BIGINT: `quota_s = budget·w_s div Σw`,
    * capped at `n_s` (no redistribution — a tail source smaller than
    * its temperature share contributes everything it has, and the
    * output may undershoot `budget` by the deficit; upsampling the
    * tail instead is [[epochRepeat]]'s job). Membership per source is
    * the same hash-rank prefix as [[capPerGroup]], so the selection is
    * deterministic, append-stable, and SQL-auditable end to end.
    *
    * Scale posture: per-source counts are one map-side-combined hash
    * agg (|sources| rows); weights/quotas live on that tiny frame and
    * broadcast back; membership is one window per source. Nothing
    * data-sized shuffles except the per-source rank, which is the
    * operator's contract.
    */
  /** One multiplicative-weights update of a domain-mixture
    * distribution — the exponentiated-gradient step at the core of
    * DoReMi-style mixture tuning (Xie et al., "DoReMi: Optimizing Data
    * Mixtures Speeds Up Language Model Pretraining", 2023): domains
    * where the per-row loss signal runs high get up-weighted,
    *
    *   w'_d ∝ w_d · exp(η · mean_loss_d),   w_d = n_d / N,
    *
    * renormalized to sum 1. This emits the UPDATED REFERENCE
    * DISTRIBUTION; materializing a corpus at those weights is
    * [[temperatureMix]]/[[epochRepeat]]'s job — the two compose into
    * the reweight-then-resample loop.
    *
    * Determinism contract: `loss` must be integral per row (token
    * counts, ppm-scaled scores — the [[graft.ops.Stats.metricLong]]
    * convention), so n_d and Σloss_d are exact longs and mean_loss is
    * one division. exp() is engine-ulp-sensitive, so the normalizer
    * folds the raw terms in DOMAIN-SORTED order and the weights round
    * to 6 dp — the ln() discipline applied to its inverse. Output:
    * one row per domain (domain, n_rows, mean_loss, w_old, w_new).
    *
    * Scale posture: one map-side-combined hash agg to |domains| rows;
    * the fold and update are a tiny-frame computation.
    */
  def mixtureReweight(df: DataFrame, domainCol: String, loss: Column,
                      eta: Double): DataFrame = {
    require(eta > 0.0, "eta must be positive")
    val per = df.filter(col(domainCol).isNotNull && loss.isNotNull)
      .groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_rows"),
        sum(loss.cast("long")).cast("long").as("_sl"))
    val meanLoss = col("_sl").cast("double") / col("n_rows").cast("double")
    val folded = per
      .withColumn("_mean", meanLoss)
      .agg(sum(col("n_rows")).cast("long").as("_nn"),
        array_sort(collect_list(struct(col("domain"), col("n_rows"),
          col("_mean")))).as("_a"))
    def raw(n: Column, m: Column) =
      n.cast("double") / col("_nn").cast("double") * exp(lit(eta) * m)
    val z = aggregate(col("_a"), lit(0.0), (a, s) =>
      a + raw(s.getField("n_rows"), s.getField("_mean")))
    folded
      .select(col("_nn"), col("_a"), z.as("_z"))
      .select(col("_nn"), col("_z"), explode(col("_a")).as("_s"))
      .select(col("_s").getField("domain").as("domain"),
        col("_s").getField("n_rows").as("n_rows"),
        round(col("_s").getField("_mean"), 6).as("mean_loss"),
        round(col("_s").getField("n_rows").cast("double") /
          col("_nn").cast("double"), 6).as("w_old"),
        round(raw(col("_s").getField("n_rows"),
          col("_s").getField("_mean")) / col("_z"), 6).as("w_new"))
  }

  def temperatureMix(df: DataFrame, sourceCol: String, keyCol: String,
                     budget: Long, alphaQuarters: Int = 2): DataFrame = {
    require(budget >= 1, "budget must be positive")
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alphaQuarters must be 1..4 (α = quarters/4), got $alphaQuarters")
    val rows = df.filter(col(sourceCol).isNotNull && col(keyCol).isNotNull)
    val sizes = rows.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
    val nD = col("_n").cast("double")
    // α = 1 stays in pure BIGINT arithmetic: `floor(1e6 · n)` through a
    // double stops being exact above n ≈ 2^53/1e6 ≈ 9e9 rows per
    // source, while `n * 1 000 000L` is exact to ~9.2e12 (past which
    // Spark's ANSI overflow check fails LOUDLY instead of drifting).
    // The sqrt branches keep the double route — sqrt is IEEE-correctly
    // rounded, and their magnitudes are √n ≤ ~3e6 ppm-scaled, far
    // inside the exact-double range.
    val wPpm: Column = alphaQuarters match {
      case 1 => floor(lit(1000000.0) * sqrt(sqrt(nD))).cast("long")
      case 2 => floor(lit(1000000.0) * sqrt(nD)).cast("long")
      case 3 => floor(lit(1000000.0) * (sqrt(nD) * sqrt(sqrt(nD)))).cast("long")
      case _ => col("_n") * lit(1000000L)
    }
    val weights = sizes.withColumn("_w_ppm", wPpm)
    val totalW = weights.agg(sum(col("_w_ppm")).as("_tw"))
    // quota in DECIMAL(38,0): budget × w_ppm overflows LONG at roughly
    // budget·√n > 9.2e12 (e.g. a 1e8-row budget against a 1e10-row
    // source) — exactly the scale the operator claims; decimal div
    // keeps the arithmetic exact and engine-reproducible at any size
    val quotas = weights.crossJoin(broadcast(totalW))
      .select(col(sourceCol),
        least(col("_n"), expr(
          s"CAST(CAST(${budget} AS DECIMAL(38,0)) * _w_ppm div _tw AS BIGINT)"))
          .as("_quota"))
    rows.withColumn("_hr", hashRank(sourceCol, keyCol))
      .join(broadcast(quotas), Seq(sourceCol))
      .filter(col("_hr") <= col("_quota"))
      .drop("_hr", "_quota")
  }

  /** Neyman-allocation stratified sampling: the budget splits across
    * strata ∝ N_h·σ_h — variance-OPTIMAL for estimating a mean of
    * `valueCol` under a fixed sample budget, where proportional
    * allocation ([[stratifiedSample]]'s regime) wastes draws on large
    * homogeneous strata. The textbook allocation, made engine-exact:
    *
    *   w_h     = floor(√(N_h·Q_h − S_h²))      (= N_h·σ_h, integerized)
    *   quota_h = min(N_h, budget·w_h div Σw)
    *
    * S/Q are exact BIGINT sufficient stats; √ of an exact integer is
    * IEEE-correctly-rounded on every engine, so the floor is
    * deterministic; the quota division runs in DECIMAL(38,0) (the
    * [[temperatureMix]] overflow discipline). Zero-variance strata get
    * w = 0 — Neyman assigns them nothing beyond the floor-div residue
    * (one draw tells you everything about a constant stratum; callers
    * wanting a minimum take `greatest(quota, lit(1))` downstream).
    * Membership is hash-rank (the append-stable [[capPerGroup]]
    * contract).
    *
    * Scale posture: stats are one map-side-combined agg (|strata|
    * rows); quotas broadcast back; the only data-sized shuffle is the
    * per-stratum rank window — [[temperatureMix]]'s exact shape.
    * Output: input rows that made their stratum's quota.
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, keyCol: String,
                       valueCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val rows = df.filter(col(stratumCol).isNotNull && col(keyCol).isNotNull &&
      valueCol.isNotNull)
    val stats = rows.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("_nh"),
        sum(valueCol.cast("long")).as("_s"),
        sum(valueCol.cast("long") * valueCol.cast("long")).as("_q"))
      // N_h·Q_h and S_h² overflow BIGINT once strata pass ~10⁵ rows of
      // ~10⁵-scale values (cents of TPC-H prices do at sf0.1 already) —
      // the products run in DECIMAL(38,0), exact to 10³⁸; the decimal →
      // double conversion is correctly rounded on every engine, so the
      // floor(sqrt(·)) below stays deterministic even past 2^53
      .withColumn("_w",
        floor(sqrt((col("_nh").cast("decimal(38,0)") * col("_q") -
            col("_s").cast("decimal(38,0)") * col("_s"))
          .cast("double"))).cast("long"))
    val totalW = stats.agg(sum(col("_w")).as("_tw"))
    val quotas = stats.crossJoin(broadcast(totalW))
      .select(col(stratumCol),
        when(col("_tw") > 0,
          least(col("_nh"), expr(
            s"CAST(CAST($budget AS DECIMAL(38,0)) * _w div _tw AS BIGINT)")))
          .otherwise(lit(0L)).as("_quota"))
    rows.withColumn("_hr", hashRank(stratumCol, keyCol))
      .join(broadcast(quotas), Seq(stratumCol))
      .filter(col("_hr") <= col("_quota"))
      .drop("_hr", "_quota")
  }

  /** Deterministic shard manifest for training-data output: every row
    * gets a `shard` in [0, shards) (hash bucket of its key) and a
    * 1-based `pos` within the shard (hash order) — the layout contract
    * a 100 TB corpus needs before it becomes training input, where
    * "shard 17, position 2 041 223" must mean the same example on every
    * rebuild, resume, and engine. Shard membership and order depend
    * only on keys (the [[hashBucket]]/hash-rank discipline), so adding
    * rows later never reorders existing (shard, pos) prefixes relative
    * to each other — a newcomer only splices in at its hash position.
    *
    * Scale posture: bucket assignment is map-side; the position window
    * shuffles once by shard and runs `shards`-way parallel with ~n/S
    * rows per partition — pick `shards` ≥ cluster parallelism and no
    * single task holds more than a shard. No global window, no driver
    * state.
    */
  def shardManifest(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    require(shards >= 1, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string").cast("binary"))
    df.filter(col(keyCol).isNotNull)
      .withColumn("shard", hashBucket(col(keyCol), shards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(h, col(keyCol))).cast("long"))
  }

  /** Shard-balance audit over a manifest — the straggler check a
    * training-data layout passes before a run: with W workers each
    * reading one shard, epoch time is the MAX shard, so a manifest
    * whose largest shard is 2× its median wastes half the fleet at
    * the epoch barrier. Reports exact per-shard extremes plus
    * `skew_ppm` = 10⁶ · max / median (median carried as the DOUBLED
    * order-statistic sum, so everything stays integer — no float in
    * the audit at all; 1 000 000 = perfectly balanced-by-median).
    * Missing shard ids (a bucket no key hashed into) count as zero
    * only in `n_shards` being below the configured count — a gap is
    * itself a finding for the caller to compare against its `shards`
    * parameter. Output: ONE row
    * (n_shards, rows_total, rows_min, rows_max, skew_ppm).
    *
    * Scale posture: one hash agg to |shards| rows; the fold is a
    * bounded sorted-array pick.
    */
  def shardBalance(manifest: DataFrame, shardCol: String): DataFrame = {
    val per = manifest.filter(col(shardCol).isNotNull)
      .groupBy(col(shardCol)).agg(count(lit(1)).as("_n"))
    per.agg(count(lit(1)).as("n_shards"),
        sum(col("_n")).cast("long").as("rows_total"),
        min(col("_n")).as("rows_min"), max(col("_n")).as("rows_max"),
        array_sort(collect_list(col("_n"))).as("_a"))
      .withColumn("_med2",
        element_at(col("_a"), expr("cast((n_shards + 1) div 2 as int)")) +
          element_at(col("_a"), expr("cast((n_shards + 2) div 2 as int)")))
      .select(col("n_shards"), col("rows_total"), col("rows_min"),
        col("rows_max"),
        expr("(2 * rows_max * 1000000) div _med2").as("skew_ppm"))
  }

  /** Per-epoch reshuffle of the training order — [[shardManifest]]'s
    * twin with the hash salted by the epoch number: each epoch sees a
    * DIFFERENT permutation (SGD wants fresh order every pass) that is
    * still fully deterministic and SQL-auditable (resume/replay
    * reproduces epoch k's order exactly, on any engine). The salt
    * always participates (`key || ':' || epoch`), so no epoch is
    * accidentally the unsalted [[shardManifest]] order. Same scale
    * posture: map-side bucket, `shards`-way-parallel position windows.
    * Output: input rows + (epoch, shard, pos).
    */
  def epochShuffle(df: DataFrame, keyCol: String, shards: Int,
                   epoch: Int): DataFrame = {
    require(shards >= 1, "need at least one shard")
    require(epoch >= 0, "epoch must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val salted = concat(col(keyCol).cast("string"), lit(s":$epoch"))
    val h = md5(salted.cast("binary"))
    df.filter(col(keyCol).isNotNull)
      .withColumn("epoch", lit(epoch.toLong))
      .withColumn("shard", hashBucket(salted, shards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(h, col(keyCol))).cast("long"))
  }

  /** Curriculum-ordered shard manifest — [[shardManifest]]'s sibling
    * where within-shard order follows a DIFFICULTY signal instead of
    * pure hash order: position ascends by (`scoreCol`, md5(key), key),
    * so each shard's read order walks the curriculum (short-to-long
    * docs, clean-to-noisy, however the caller scores difficulty) while
    * shard MEMBERSHIP stays the hash bucket — every worker sees the
    * same easy-first ramp over an unbiased slice of the corpus, which
    * is what curriculum training wants (a score-ordered SPLIT would
    * give worker 0 all the easy data instead). Hash tiebreak keeps
    * equal-score runs deterministic and append-stable.
    *
    * Use an exact integer score (token count, integer-ppm quality) for
    * engine-reproducible order; pass `descending = true` to start from
    * high scores. Same scale posture as [[shardManifest]]: map-side
    * bucket, `shards`-way-parallel position windows.
    * Output: input rows + (shard, pos).
    */
  def curriculumManifest(df: DataFrame, keyCol: String, scoreCol: String,
                         shards: Int, descending: Boolean = false): DataFrame = {
    require(shards >= 1, "need at least one shard")
    import org.apache.spark.sql.expressions.Window
    val h = md5(col(keyCol).cast("string").cast("binary"))
    val lead = if (descending) col(scoreCol).desc else col(scoreCol).asc
    df.filter(col(keyCol).isNotNull && col(scoreCol).isNotNull)
      .withColumn("shard", hashBucket(col(keyCol), shards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(lead, h, col(keyCol))).cast("long"))
  }

  /** Probability-proportional-to-size (PPS) Poisson sampling — the
    * curation sampler that keeps token/char MASS representative rather
    * than document count: unit i enters the sample independently with
    * inclusion probability pi_i = min(1, n·s_i/S) (Poisson PPS
    * sampling; downstream estimators reweight by 1/pi_i — Horvitz–
    * Thompson), so a 100-row sample of a corpus dominated by a few
    * huge documents still covers them with pi = 1 while the long tail
    * enters proportionally. The inclusion draw is the seeded md5
    * inverse-CDF uniform shared with the DP family
    * ([[Privacy.noisyCounts]]): bit-reproducible run to run and engine
    * to engine (a production deployment swaps the seed for entropy,
    * same plan). `pi` is emitted alongside each sampled row for HT
    * reweighting; null/non-positive sizes are excluded (they carry no
    * mass and an inclusion probability of 0).
    * Output: (unit_id, size, pi).
    *
    * Scale posture: one exact-long size aggregate broadcast back as a
    * 1-row frame; the draw + filter is map-side — the sampler never
    * shuffles the corpus.
    */
  def ppsSample(df: DataFrame, idCol: String, sizeCol: String,
                nTarget: Int, seed: Long = 7L): DataFrame = {
    require(nTarget >= 1, "nTarget must be positive")
    val base = df.filter(col(idCol).isNotNull && col(sizeCol).isNotNull &&
        col(sizeCol).cast("long") > 0)
      .select(col(idCol).as("unit_id"), col(sizeCol).cast("long").as("size"))
    val tot = base.agg(sum(col("size")).cast("long").as("_tot"))
    val key = concat_ws("\u0001", col("unit_id").cast("string"), lit(seed.toString))
    val h = conv(substring(md5(key.cast("binary")), 1, 13), 16, 10).cast("long")
    val u = (h + lit(0.5)) / lit(4503599627370496.0)
    val pi = least(lit(1.0), lit(nTarget.toDouble) * col("size").cast("double") /
      col("_tot").cast("double"))
    base.crossJoin(broadcast(tot))
      .withColumn("_pi", pi)
      .filter(u < col("_pi"))
      // pi is a WEIGHT (downstream HT reweight divides by it), never a
      // display column: emit it unrounded — at production scale
      // (huge S, small nTarget) pi falls below 5e-7, where 6-decimal
      // rounding would return 0.0 and 1/pi would blow up (r12 advice).
      // Parity oracles round at the comparison edge instead.
      .select(col("unit_id"), col("size"), col("_pi").as("pi"))
  }
}
