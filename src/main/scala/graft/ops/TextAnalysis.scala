package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language
  * identification (marker-word heuristic), and canonical document
  * fingerprinting.
  *
  * Everything is a Catalyst `Column` expression over `functions._` —
  * no UDFs — so the whole pipeline stays inside whole-stage codegen and
  * scales linearly with input splits (no shuffle except where an operator
  * explicitly aggregates). Beyond the reference's surface (its jobs are
  * pure relational ETL, SURVEY §2.10); part of the 100 TB extension scope
  * (SURVEY §7.5).
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped (split on `\s+` leaves a
    * leading "" for text starting with whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > lit(0))

  /** Token count via a single regexp pass — no array materialization. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** Zipf rank–frequency fit per corpus slice — the one-number
    * naturalness diagnostic: natural language's term frequencies fall
    * as ~rank^−α with α ≈ 1; machine-generated or templated text bends
    * the curve (flat head = keyword stuffing, cliff tail = boilerplate
    * vocabulary). Per group, OLS of ln(freq) on ln(rank) over the top
    * `topK` ranks: `alpha = −slope`, plus r² for fit quality.
    *
    * Determinism: freqs are exact BIGINTs; ranks are `row_number` by
    * (freq DESC, term) — tied freqs may permute terms across adjacent
    * ranks but carry the same y, so every regression sum is invariant;
    * the five sums fold over the RANK-SORTED array (one in-order fold
    * each). `ln` itself is the one NON-portable ingredient: Java's
    * `Math.log` and glibc's (DuckDB's) `log` disagree by 1 ulp on some
    * inputs (measured here: ln 3, ln 48) — the first counterexample to
    * the repo's "ln of identical doubles matches" rule — so alpha/r²
    * are rounded to 6 dp at the output, the sanctioned remedy when the
    * folded INPUTS can differ between engines.
    * Output: (group, n_terms, alpha, r2).
    *
    * Scale posture: one (group, term) hash agg over the token explode,
    * one per-group top-K window (heap-bounded by `topK`), then a
    * ≤topK-element array fold per group. Groups with < 3 ranks, or
    * whose top-rank freqs are ALL tied (zero y-variance — the fit is
    * undefined and the fp residual engine-unstable), mask to NULL.
    */
  /** Per-document n-gram NOVELTY against a reference corpus half: the
    * share of the doc's DISTINCT word n-grams that appear nowhere in
    * the reference — the generation-side mirror of the contamination
    * audit (contamination asks "is eval text in train?"; novelty asks
    * "how much of this candidate text is new vs the corpus it claims
    * to extend?" — the memorization/novelty screen a synthetic-data
    * pipeline runs before admitting generated docs).
    *
    * Plan: candidate docs explode to DISTINCT (doc, gram) pairs
    * (per-doc state = the doc's own gram set); the reference half
    * collapses to a distinct gram vocabulary; one left join + per-doc
    * agg. Counts exact; `novel_ppm` is BIGINT-div. Docs too short for
    * one n-gram emit (0, 0, NULL) — total coverage, the
    * [[graft.ops.Similarity]] neighborVote discipline.
    * Output: (doc_id, n_grams, n_novel, novel_ppm) for every candidate
    * (non-reference) doc.
    */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   refFilter: Column, n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram order must be positive")
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumn("_toks", tokens(lower(col(textCol))))
    def grams(c: Column): Column =
      when(size(c) >= n,
        array_distinct(transform(sequence(lit(1), size(c) - lit(n - 1)),
          i => array_join(slice(c, i, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
    val refVocab = base.filter(refFilter)
      .select(explode(grams(col("_toks"))).as("_g")).distinct()
    val cand = base.filter(!refFilter)
      .select(col(idCol).as("doc_id"), explode_outer(grams(col("_toks"))).as("_g"))
    cand.join(refVocab.withColumn("_seen", lit(1)), Seq("_g"), "left")
      .groupBy("doc_id")
      .agg(count(col("_g")).as("n_grams"),
        sum(when(col("_g").isNotNull && col("_seen").isNull, 1L)
          .otherwise(0L)).as("n_novel"))
      .withColumn("novel_ppm",
        when(col("n_grams") > 0,
          expr("(n_novel * 1000000L) div n_grams")))
  }

  /** Term burstiness (Church–Gale): per term, the variance-to-mean
    * ratio (Fano factor) of its per-document count over ALL documents
    * — a Poisson scatter has VMR ≈ 1; topical/bursty terms (and
    * template spam) land far above, and the statistic separates them
    * from merely-frequent function words where raw df cannot. With
    * S = Σ c_d, Q = Σ c_d² over all N docs (zeros included — they ride
    * the closed form, never materialize):
    *
    *   vmr = (N·Q − S²) / (S·N)
    *
    * S, Q, N are exact BIGINTs (one (term, doc) agg + one term agg +
    * a 1-row doc-count broadcast); vmr is a fixed double tree over
    * them, raw. Terms in fewer than `minDf` docs are dropped (their
    * VMR is noise). Output: (term, df, total, vmr).
    */
  def termBurstiness(docs: DataFrame, idCol: String, textCol: String,
                     minDf: Long = 5L): DataFrame = {
    val perDoc = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("_doc"), explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("_doc", "term").agg(count(lit(1)).as("_c"))
    val nDocs = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .agg(countDistinct(col(idCol)).as("_n"))
    perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("_c")).as("total"),
        sum(col("_c") * col("_c")).as("_q"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("df"), col("total"),
        ((col("_n") * col("_q") - col("total") * col("total")).cast("double") /
          (col("total") * col("_n")).cast("double")).as("vmr"))
  }

  def zipfFit(docs: DataFrame, groupCol: String, textCol: String,
              topK: Int = 200): DataFrame = {
    require(topK >= 3 && topK <= 10000, "3 <= topK <= 10000")
    val tf = docs.filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("_g"),
        explode(tokens(lower(col(textCol)))).as("_t"))
      .groupBy("_g", "_t").agg(count(lit(1)).as("_f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_g").orderBy(col("_f").desc, col("_t"))
    val ranked = tf.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= topK)
      .select(col("_g"), col("_f"), col("_r").cast("long").as("_r"),
        log(col("_r").cast("double")).as("_x"),
        log(col("_f").cast("double")).as("_y"))
    val folded = ranked.groupBy("_g")
      .agg(count(lit(1)).as("n_terms"),
        min(col("_f")).as("_fmin"), max(col("_f")).as("_fmax"),
        array_sort(collect_list(struct(col("_r"), col("_x"), col("_y"))))
          .as("_a"))
      .select(col("_g"), col("n_terms"), col("_fmin"), col("_fmax"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._x)").as("_sx"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._y)").as("_sy"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._x * s._y)").as("_sxy"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._x * s._x)").as("_sxx"),
        expr("aggregate(_a, cast(0.0 as double), (a, s) -> a + s._y * s._y)").as("_syy"))
    val n = col("n_terms").cast("double")
    val covN = n * col("_sxy") - col("_sx") * col("_sy")
    val varXN = n * col("_sxx") - col("_sx") * col("_sx")
    val varYN = n * col("_syy") - col("_sy") * col("_sy")
    // Degenerate-variance mask must be DISCRETE (all top-rank freqs
    // tied), not `varYN === 0.0`: with all-tied freqs the variance is a
    // pure cancellation residual that one engine's ln can leave at
    // exactly 0.0 and the other's 1-ulp-shifted ln at a tiny ±δ — a
    // NULL-vs-±0.0 gate mismatch the 6-dp rounding cannot repair. With
    // UNTIED integer freqs the true varYN is bounded below by
    // ~n·(1/fmax)², which clears the fp cancellation floor for any
    // corpus with fmax ≲ 1e7 — documented regime, so no fp guard needed.
    val degenerate = col("n_terms") < 3 || col("_fmin") === col("_fmax")
    folded.select(col("_g").as(groupCol), col("n_terms"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(-(covN / varXN), 6)).as("alpha"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(covN * covN / (varXN * varYN), 6)).as("r2"))
  }

  /** Default stopword list for quality scoring. */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(toks: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  /** Length/punctuation/stopword quality signals + a composite score in
    * [0,1]. All ratios divide by `greatest(n_tokens, 1)` so empty docs
    * yield 0-ratios instead of nulls/divide-by-zero.
    */
  def qualitySignals(df: DataFrame, text: Column, stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(text)
    df.withColumn("n_chars", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("_n_tok_safe", greatest(col("n_tokens"), lit(1)))
      .withColumn("punct_ratio", punctCount(text) / col("_n_tok_safe"))
      .withColumn("stopword_ratio", stopwordCount(toks, stopwords) / col("_n_tok_safe"))
      .withColumn("avg_token_len",
        length(regexp_replace(text, "\\s+", "")) / col("_n_tok_safe"))
      .withColumn("quality_score",
        lit(0.4) * least(lit(1.0), col("n_tokens") / 100.0) +
          lit(0.3) * (lit(1.0) - least(lit(1.0), col("punct_ratio") * 5.0)) +
          lit(0.3) * least(lit(1.0), col("stopword_ratio") * 5.0))
      .drop("_n_tok_safe")
  }

  /** Readability scores — Flesch reading ease and Flesch–Kincaid grade
    * level, the curation-filter signals for "is this text natural
    * prose at a sane complexity" (wordlist-free, so they run on any
    * Latin-script corpus). Classic published formulas over three exact
    * integer counts, each ONE regexp pass, no explode:
    *
    *   - words: `\S+` runs ([[tokenCount]]);
    *   - sentences: `[^.!?\s][^.!?]*` runs — content runs between
    *     terminator clusters, the same segmentation contract as
    *     [[splitSentences]] (terminator-free text = 1 sentence);
    *   - syllables: `[aeiouy]+` vowel GROUPS in the lowercased text —
    *     the standard heuristic; groups never span words (any
    *     non-vowel breaks the run), so a whole-text scan equals the
    *     per-word sum without materializing words.
    *
    * The scores are one fixed double tree over those integers
    * (`206.835 − 1.015·w/s − 84.6·syl/w`; grade `0.39·w/s +
    * 11.8·syl/w − 15.59`) — identical trees are bit-identical across
    * engines, so the raw doubles ship unrounded (the parity
    * discipline: never round a double derived purely from exact
    * integers through a fixed tree). Wordless docs yield null scores,
    * never NaN/Inf. Pure map-side — rides the scan at any corpus size.
    *
    * Output: doc frame + (n_words, n_sentences, n_syllables, flesch,
    * fk_grade).
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        readabilityStruct(col(textCol)).as("_r"))
      .select(col("doc_id"), col("_r.*"))

  /** The [[readability]] kernel as ONE struct-typed Column — the tree the
    * DataFrame op and the SQL macro (`readability(text)`, see
    * [[graft.functions.GraftExtensions]]) share, so pure-SQL users get
    * bit-identical scores (the `canonical_url` discipline). Count
    * subtrees repeat inside the struct; whole-stage codegen's
    * subexpression elimination evaluates each regexp pass once per row —
    * the same shape `CollapseProject` produced for the old two-stage
    * projection.
    */
  def readabilityStruct(text: Column): Column = {
    val w = tokenCount(text).cast("long")
    val s = size(regexp_extract_all(text, lit("[^.!?\\s][^.!?]*"), lit(0))).cast("long")
    val syl = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast("long")
    val wD = w.cast("double")
    val sD = greatest(s, lit(1L)).cast("double")
    val sylD = syl.cast("double")
    struct(
      w.as("n_words"), s.as("n_sentences"), syl.as("n_syllables"),
      when(w > 0,
        lit(206.835) - lit(1.015) * (wD / sD) - lit(84.6) * (sylD / wD))
        .as("flesch"),
      when(w > 0,
        lit(0.39) * (wD / sD) + lit(11.8) * (sylD / wD) - lit(15.59))
        .as("fk_grade"))
  }

  /** Unicode-script profile — the multilingual curation signal the
    * marker-word language ID cannot give: per-document counts and
    * integer-ppm shares of Latin / Cyrillic / CJK / Arabic characters
    * over the non-whitespace total. Script shares are how a 100-TB
    * multilingual pipeline routes documents to per-script tokenizers
    * and drops mojibake (no script reaching a majority) BEFORE any
    * model-based language ID spends compute.
    *
    * Each count is one regexp pass (`length(text) −
    * length(regexp_replace(text, class, ''))` — replace-all removes
    * every matching char, so the length delta IS the count), with
    * explicit BMP code-point ranges spelled `\x{....}` — the one class
    * syntax Java regex and RE2 share (named script classes differ
    * between the engines: `\p{IsCyrillic}` vs `\p{Cyrillic}`). Shares
    * are BIGINT-div ppm; char-less documents yield null shares, never
    * a divide-by-zero. Pure map-side.
    *
    * Output: (doc_id, n_chars, latin_ppm, cyrillic_ppm, cjk_ppm,
    * arabic_ppm).
    */
  def scriptProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        scriptProfileStruct(col(textCol)).as("_s"))
      .select(col("doc_id"), col("_s.*"))

  /** The [[scriptProfile]] kernel as ONE struct-typed Column shared with
    * the SQL macro `script_profile(text)` — see [[readabilityStruct]]
    * for the sharing + subexpression-elimination contract.
    */
  def scriptProfileStruct(text: Column): Column = {
    def cnt(cls: String): Column =
      (length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    val n = cnt("[^\\s]")
    def ppm(c: Column): Column =
      when(n > 0, call_function("div", c * lit(1000000L), n))
    struct(n.as("n_chars"),
      ppm(cnt("[A-Za-z]")).as("latin_ppm"),
      ppm(cnt("[\\x{0400}-\\x{04FF}]")).as("cyrillic_ppm"),
      ppm(cnt("[\\x{4E00}-\\x{9FFF}]")).as("cjk_ppm"),
      ppm(cnt("[\\x{0600}-\\x{06FF}]")).as("arabic_ppm"))
  }

  /** Mixed-script (homoglyph) token audit: tokens that mix characters
    * from two of {Latin, Cyrillic, Greek} — the confusable-script
    * spoofing vector ("pаypal" with a Cyrillic а) that
    * poisons dedup keys (different bytes, identical glyphs), URL
    * canonicalization, and NER, and that no per-DOC script profile
    * ([[scriptProfile]]) can see: a legitimately bilingual doc and a
    * homoglyph-attacked one have the same document-level mix. Pure
    * map-side: tokenize, keep tokens matching ≥2 script classes via a
    * codepoint-range HOF filter (the [[scriptProfile]] portability
    * discipline — explicit ranges, no engine-private \\p{script}
    * spellings).
    * Output: (doc_id, n_tokens, n_mixed, mixed_ppm, first_mixed —
    * lexicographic min, '' when clean).
    */
  def mixedScriptTokens(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        mixedScriptStruct(col(textCol)).as("_m"))
      .select(col("doc_id"), col("_m.*"))

  /** The [[mixedScriptTokens]] kernel as ONE struct-typed Column shared
    * with the SQL macro `mixed_script(text)` — see [[readabilityStruct]]
    * for the sharing + subexpression-elimination contract.
    */
  def mixedScriptStruct(text: Column): Column = {
    val lat = "[A-Za-z]"
    val cyr = "[\\x{0400}-\\x{04FF}]"
    val grk = "[\\x{0370}-\\x{03FF}]"
    val toks = tokens(text)
    val mixed = filter(toks, t =>
      (t.rlike(lat) && t.rlike(cyr)) || (t.rlike(lat) && t.rlike(grk)) ||
        (t.rlike(cyr) && t.rlike(grk)))
    val nToks = size(toks).cast("long")
    struct(nToks.as("n_tokens"),
      size(mixed).cast("long").as("n_mixed"),
      when(nToks > 0,
        call_function("div", size(mixed).cast("long") * lit(1000000L), nToks))
        .otherwise(lit(0L)).as("mixed_ppm"),
      coalesce(array_min(mixed), lit("")).as("first_mixed"))
  }

  /** Deflate compression ratio as a quality signal — the Gopher-family
    * heuristic the entropy/repetition columns approximate analytically:
    * machine-generated boilerplate and keyword-stuffed spam compress
    * far below clean prose, and the compressor "sees" repetition
    * structures (long-range repeats, near-repeats) that fixed n-gram
    * statistics miss. The deflate kernel is a codegen'd Catalyst
    * expression ([[graft.functions.StringExpressions.DeflatedSize]])
    * over a THREAD-LOCAL reused `Deflater` — native zlib memory is
    * O(executor threads), never O(partitions), and the op stays inside
    * whole-stage codegen with the id column's type untouched (no
    * Dataset encoder, no numeric-id contract). Deterministic for a
    * given JVM's zlib; there is no cross-engine SQL twin for deflate,
    * so this op is SPEC-pinned (planted repetitive vs varied fixtures),
    * not oracle-gated — the documented exception to the registry rule.
    * Output: (doc_id, n_bytes, n_deflated, ratio_ppm) — ratio_ppm =
    * deflated·1e6/raw, LOW means repetitive/spammy.
    */
  def compressionRatio(docs: DataFrame, idCol: String, textCol: String,
                       level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, "deflate level in [1, 9]")
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        graft.functions.StringExpressions.deflatedSize(col(textCol), level)
          .as("n_deflated"))
      .withColumn("ratio_ppm",
        when(col("n_bytes") > 0,
          expr("(n_deflated * 1000000L) div n_bytes")).otherwise(0L))
  }

  /** Marker-word sets for the language-ID heuristic: a language scores by
    * how many of its marker words occur in the document (presence, not
    * frequency — robust to length skew).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "que", "y"),
    "fr" -> Seq("le", "les", "des", "est"))

  private def markerScore(toks: Column, markers: Seq[String]): Column =
    markers.map(m => array_contains(toks, m).cast("int")).reduce(_ + _)

  /** Language ID: argmax of marker scores, earlier languages win ties,
    * `und` when nothing matches. Deterministic by construction.
    */
  def languageId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerScore(toks, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), el) =>
      when(s >= best && s > 0, lang).otherwise(el)
    }
  }

  /** Subword-ish token count: a BPE-flavored segmentation (contractions,
    * letter runs, digit runs, symbol runs) counted in one regexp pass —
    * the cheap stand-in for a real tokenizer when budgeting LLM training
    * tokens. RE2-safe pattern (no lookahead) so the same regex runs in
    * DuckDB/Trino for cross-engine checks.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("'[a-zA-Z]+|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"), lit(0)))

  /** Winnowing fingerprints (the MOSS scheme): rolling k-gram hashes,
    * then the minimum of each w-window, distinct. Guarantees any shared
    * substring of length ≥ k+w-1 contributes a shared fingerprint —
    * the dedup/plagiarism primitive that works on partial overlap where
    * whole-document fingerprints miss. Pure columnar (one expression),
    * O(len) per doc, no shuffle.
    */
  /** Winnowing gram hashes from a BOUND lowercased-text column (see
    * [[shinglesFromToks]] for why the binding matters: `t` is read once
    * per k-gram position here, so an inline `lower(text)` would
    * re-lowercase the whole document per position — O(len²)/doc).
    */
  private def winnowGrams(t: Column, k: Int): Column = {
    val nGrams = length(t) - (k - 1)
    when(nGrams >= 1,
      transform(sequence(lit(1), greatest(nGrams, lit(1))),
        i => xxhash64(call_function("substring", t, i, lit(k)))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Window minima over a BOUND gram-hash array column (an inline
    * `grams` expression here would recompute EVERY gram hash per
    * window — O(len²·k)/doc).
    */
  private def winnowMins(grams: Column, w: Int): Column = {
    val nWins = size(grams) - (w - 1)
    val mins = when(nWins >= 1,
      transform(sequence(lit(1), greatest(nWins, lit(1))),
        j => array_min(slice(grams, j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))
    array_distinct(mins)
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): k-gram hashes, sliding-window minima, distinct. The
    * DataFrame shape binds each intermediate to a column so every
    * stage is linear in document length.
    * Output: input columns + `winnow_fps array<bigint>`.
    */
  def winnowed(docs: DataFrame, textCol: String, k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 1, "winnowing needs k >= 2, w >= 1")
    Par.spreadToShuffleWidth(docs, docs) // per-doc gram hash + window mins
      .withColumn("_wt", lower(col(textCol)))
      .withColumn("_wg", winnowGrams(col("_wt"), k))
      .withColumn("winnow_fps", winnowMins(col("_wg"), w))
      .drop("_wt", "_wg")
  }

  /** Canonical document fingerprint: md5 of the sorted distinct token set
    * (classic "fingerprint" key for clustering near-identical docs that
    * differ only in word order / repetition).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))).cast("binary"))

  /** Per-source datasheet: the one-row-per-source corpus card a
    * mixture decision reads — volume (docs, tokens), lexical diversity
    * (distinct types, type-token ratio), exact-duplication ppm
    * ([[fingerprint]]-collapsed), and language spread. Two hash aggs
    * (doc-level + one token explode for types) joined on the source
    * key; output bounded by |sources|. All ratios integer-ppm.
    * Output: (source, n_docs, n_tokens, n_types, ttr_ppm, n_langs,
    * n_distinct_text, dup_ppm).
    */
  def sourceDatasheet(docs: DataFrame, sourceCol: String, idCol: String,
                      textCol: String, langCol: String): DataFrame = {
    val d = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val docAgg = d.groupBy(col(sourceCol).as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      countDistinct(fingerprint(col(textCol))).as("n_distinct_text"),
      countDistinct(col(langCol)).as("n_langs"))
    val types = d
      .select(col(sourceCol).as("source"), explode(tokens(lower(col(textCol)))).as("t"))
      .groupBy("source").agg(countDistinct(col("t")).as("n_types"))
    docAgg.join(types, Seq("source"), "left")
      .withColumn("n_types", coalesce(col("n_types"), lit(0L)))
      .withColumn("ttr_ppm",
        when(col("n_tokens") > 0, expr("(n_types * 1000000L) div n_tokens")))
      .withColumn("dup_ppm",
        expr("((n_docs - n_distinct_text) * 1000000L) div n_docs"))
      .select("source", "n_docs", "n_tokens", "n_types", "ttr_ppm", "n_langs",
        "n_distinct_text", "dup_ppm")
  }

  /** Corpus term statistics: per-(doc, term) frequency, document
    * frequency, and TF-IDF (`tf · ln(N / df)`) — the vocabulary /
    * importance backbone of a training-data pipeline (corpus pruning,
    * keyword extraction, quality weighting).
    *
    * Tokenization matches [[tokens]] over lowercased text, so the same
    * stats are reproducible in any engine with the same split.
    *
    * Shape at 100 TB: the explode is map-side; TF is one partial-agg
    * hash aggregation keyed by (doc, term); document frequency is a
    * COUNT window over `term` partitions of the already-collapsed TF
    * table — the tokenize+aggregate pass runs ONCE (a separate
    * `groupBy(term)` + self-join would recompute the whole TF lineage
    * for the build side). The corpus size joins in as a broadcast
    * scalar from a metadata-only count scan. AQE handles stopword-term
    * skew in the term exchange (or pre-filter a stopword list).
    *
    * `minTf` bounds the OUTPUT rows only — document frequencies are
    * computed over the full corpus before the cut, so reported idf is
    * exact.
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String, minTf: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("doc_freq", count(lit(1)).over(Window.partitionBy("term")))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.filter(col("tf") >= minTf)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("doc_freq"),
        round(col("tf") * log(col("n_docs").cast("double") / col("doc_freq").cast("double")),
          6).as("tf_idf"))
  }

  /** Per-document keyword extraction: the top-`k` terms by TF-IDF —
    * topical metadata for routing, clustering labels, and
    * domain-mixture diagnostics. Ranks by the ROUNDED score with a
    * term tiebreak (the [[bm25]] cut discipline: rounding-stable and
    * engine-reproducible); the per-doc window plans as two-phase
    * `WindowGroupLimit` (bounded per-partition heaps before the
    * exchange), so the cut never sorts whole documents' vocabularies
    * globally. Output: (doc_id, rank, term, tf_idf), rank 1..k.
    */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3, minTf: Int = 1): DataFrame = {
    require(k >= 1, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    tfIdf(docs, idCol, textCol, minTf)
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tf_idf").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf_idf")
  }

  /** Content-defined chunking: split each document's token stream at
    * positions where the rolling `grams`-gram hash lands in bucket 0 of
    * `divisor` (the Rabin/FastCDC boundary rule re-expressed on tokens).
    * Because boundaries depend only on LOCAL content, an insertion
    * early in a document shifts chunk boundaries only until the next
    * cut point — unlike fixed-window chunking, identical passages
    * re-align and fingerprint identically across edits. The output is
    * the storage-dedup view: chunks shared by ≥ 2 occurrences, with
    * occurrence/document counts — the repeated-passage catalogue that
    * drives block-level dedup at ingest.
    *
    * Entirely map-side until the fingerprint agg: boundary selection,
    * slicing, and hashing run as higher-order functions inside the
    * per-doc token array (one projection, no explode of positions, no
    * window). Expected chunk length is `divisor` tokens.
    *
    * Output: (fingerprint, n_occurrences, n_docs, n_tokens, doc_min).
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                grams: Int = 3, divisor: Int = 8): DataFrame = {
    require(grams >= 1, "grams must be positive")
    require(divisor >= 2, "divisor must be >= 2 (1 would cut at every token)")
    val d = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .filter(size(col("_toks")) >= 1)
    val n = size(col("_toks"))
    // cut AFTER 1-based position i, for i in [grams, n-1] (never after
    // the last token — the final chunk is delimited by n itself)
    val cuts = when(n > grams,
      filter(sequence(lit(grams), n - 1), i =>
        conv(substring(md5(
          array_join(slice(col("_toks"), i - lit(grams - 1), lit(grams)), " ")
            .cast("binary")), 1, 8), 16, 10).cast("long") % divisor === 0))
      .otherwise(array().cast("array<int>"))
    val bounds = concat(array(lit(0)), cuts, array(n))
    val chunks = transform(sequence(lit(1), size(col("_b")) - 1), j =>
      struct(
        md5(array_join(slice(col("_toks"), element_at(col("_b"), j) + 1,
          element_at(col("_b"), j + 1) - element_at(col("_b"), j)), " ")
          .cast("binary")).as("fp"),
        (element_at(col("_b"), j + 1) - element_at(col("_b"), j))
          .cast("long").as("nt")))
    d.withColumn("_b", bounds)
      .select(col("doc_id"), explode(chunks).as("c"))
      .groupBy(col("c.fp").as("fingerprint"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("c.nt")).as("n_tokens"),
        min(col("doc_id")).as("doc_min"))
      .filter(col("n_occurrences") >= 2)
  }

  /** Corpus-comparison keyness (Monroe et al.'s log-odds with a
    * Dirichlet prior): which terms CHARACTERIZE the `inGroup` slice
    * against the rest of the corpus. The z-scored log-odds-ratio
    * corrects raw frequency-ratio ranking's bias toward rare terms
    * (the variance term shrinks low-count z toward 0), which is what
    * makes it the standard slice-diagnostics tool — "what is source X
    * actually full of" before deciding its mixture weight. One token
    * explode + one term agg + a 1-row totals crossJoin. The z tree
    * passes through ln(), which is NOT correctly-rounded libm-vs-JDK
    * (1-ulp skew observed on real inputs), so z is rounded to 6 dp and
    * the threshold compares the ROUNDED value — the bm25 cut
    * discipline, stable across engines.
    * Output: (term, n_a, n_b, z_score) for |round(z, 6)| >= zThreshold.
    */
  def keyness(docs: DataFrame, textCol: String, inGroup: Column,
              zThreshold: Double = 1.96, alpha: Double = 0.5): DataFrame = {
    require(zThreshold >= 0.0 && alpha > 0.0, "need zThreshold >= 0, alpha > 0")
    val d = docs.filter(col(textCol).isNotNull)
      .select(when(inGroup, lit(1L)).otherwise(lit(0L)).as("_g"),
        explode(tokens(lower(col(textCol)))).as("term"))
    val counts = d.groupBy("term").agg(
      sum(col("_g")).as("n_a"),
      sum(lit(1L) - col("_g")).as("n_b"))
    val tot = counts.agg(sum(col("n_a")).as("_ta"), sum(col("n_b")).as("_tb"),
      count(lit(1)).as("_v"))
    val aPrior = lit(alpha) * col("_v")
    val da = (col("n_a") + lit(alpha)) /
      (col("_ta") + aPrior - col("n_a") - lit(alpha))
    val db = (col("n_b") + lit(alpha)) /
      (col("_tb") + aPrior - col("n_b") - lit(alpha))
    val z = (log(da) - log(db)) /
      sqrt(lit(1.0) / (col("n_a") + lit(alpha)) + lit(1.0) / (col("n_b") + lit(alpha)))
    counts.crossJoin(broadcast(tot))
      .withColumn("z_score", round(z, 6))
      .filter(abs(col("z_score")) >= zThreshold)
      .select("term", "n_a", "n_b", "z_score")
  }

  /** BM25 relevance scores for a fixed query-term set — the ranking
    * backbone of retrieval-based data selection (find the corpus docs
    * most relevant to a target domain, rank near-dup survivors, build
    * retrieval eval sets). Standard Okapi form with the +1 idf variant
    * (Lucene-style, never negative):
    * `Σ_t ln((N − df + 0.5)/(df + 0.5) + 1) · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Determinism discipline: every input to the float math is an exact
    * long (tf, df, dl, N, Σdl); the per-term partials fold in TERM
    * ORDER per doc (sorted-fold — see [[tokenDistributionShift]]), so
    * the score is partition-independent and engine-reproducible; the
    * top-N cut orders by the ROUNDED score with a doc-id tiebreak.
    * Output: top `topN` rows of (doc_id, n_terms_matched, score).
    *
    * Scale posture: the tokenize+TF pass is one map-side-combined hash
    * agg (the `isin` filter prunes to query terms BEFORE the agg, so
    * state is |query| terms per doc, not the vocabulary); df and the
    * corpus stats are |query|-row / 1-row broadcast frames; the cut is
    * `TakeOrderedAndProject`. Nothing data-sized shuffles except the
    * (doc × matched-term) frame, bounded by |query| per doc.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryTerms.map(_.toLowerCase).distinct.size == queryTerms.size,
      "query terms must be distinct (duplicates double-count)")
    val toks = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(queryTerms.map(_.toLowerCase): _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // the op tree below is mirrored verbatim by the oracle SQL — keep
    // every paren: IEEE fp is association-sensitive
    val idf = log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val avgdl = col("total_dl") / col("n_docs")
    val tfNorm = (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl") / avgdl)))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part", idf * tfNorm)
    scored
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("part")))).as("_arr"))
      .select(col("doc_id"),
        size(col("_arr")).cast("long").as("n_terms_matched"),
        round(aggregate(col("_arr"), lit(0.0), (a, s) => a + s.getField("part")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Dirichlet-smoothed query-likelihood scores (Zhai & Lafferty,
    * "A Study of Smoothing Methods for Language Models Applied to
    * Ad Hoc Information Retrieval", SIGIR 2001) — the language-model
    * ranking family next to [[bm25]]'s probabilistic one; the two
    * disagree exactly where retrieval-based data selection needs a
    * second opinion (long docs, rare terms). Decomposed form, so
    * unmatched terms cost one per-doc length normalizer instead of a
    * |query|×|corpus| expansion:
    *
    *   score(q,d) = Σ_{t∈q, tf>0} ln(1 + tf_td/(μ·p(t|C)))
    *              + |q| · ln(μ/(dl_d + μ)),   p(t|C) = ctf_t / Σdl
    *
    * Determinism: tf/ctf/dl/Σdl are exact longs; the matched-term
    * partials fold in TERM ORDER per doc ([[bm25]] discipline); the
    * top-N cut orders by the ROUNDED score with a doc-id tiebreak.
    * Every doc scores (an unmatched doc carries just the length term),
    * so the ranking is total. Output: top `topN` rows of
    * (doc_id, n_terms_matched, score).
    *
    * Scale posture: mirrors [[bm25]] — the isin prune bounds per-doc
    * agg state by |query|; ctf and corpus stats are |query|-row /
    * 1-row broadcast frames; the cut is `TakeOrderedAndProject`.
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], mu: Double = 2000.0,
                      topN: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    require(queryTerms.map(_.toLowerCase).distinct.size == queryTerms.size,
      "query terms must be distinct (duplicates double-count)")
    require(mu > 0.0, "mu must be positive")
    val toks = Par.spreadToShuffleWidth(docs, docs) // whole-corpus tokenize
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).cast("long").as("total_dl"))
    val matchedToks = toks
      .select(col("doc_id"), explode(col("_toks")).as("term"))
      .filter(col("term").isin(queryTerms.map(_.toLowerCase): _*))
    val ctf = matchedToks.groupBy("term").agg(count(lit(1)).as("ctf"))
    val tf = matchedToks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // mirrored verbatim by the oracle SQL — keep every paren
    val part = log(lit(1.0) + col("tf") /
      (lit(mu) * (col("ctf").cast("double") / col("total_dl").cast("double"))))
    val matched = tf
      .join(broadcast(ctf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("part", part)
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("part")))).as("_arr"))
      .select(col("doc_id"),
        size(col("_arr")).cast("long").as("n_terms_matched"),
        aggregate(col("_arr"), lit(0.0), (a, s) => a + s.getField("part"))
          .as("_m"))
    toks.select(col("doc_id"), col("dl"))
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_terms_matched"), lit(0L)).as("n_terms_matched"),
        round(coalesce(col("_m"), lit(0.0)) +
          lit(queryTerms.size.toDouble) *
            log(lit(mu) / (col("dl").cast("double") + lit(mu))), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }

  /** Per-document unigram entropy — the smooth lexical-diversity
    * signal that complements [[repetitionStats]]' hard shares: a doc
    * whose probability mass spreads evenly over its vocabulary scores
    * `ln(n_distinct)`; keyword stuffing and degenerate generations
    * collapse toward 0 long before the top-unigram share trips.
    * `entropy_ratio = entropy / ln(n_distinct)` normalizes to [0, 1]
    * across lengths (null for single-type docs, where it is 0/0).
    *
    * Determinism: exact long counts; the entropy fold runs over the
    * TERM-SORTED per-doc vocabulary array ([[tokenDistributionShift]]
    * discipline), ratio is one double division, both rounded to 6.
    * Output: (doc_id, n_tokens, n_distinct, entropy, entropy_ratio).
    *
    * Scale posture: one map-side-combined (doc, term) hash agg, then a
    * per-doc collapse whose state is the doc's VOCABULARY — bounded by
    * the doc itself, never the corpus.
    */
  def docEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val perDoc = tf.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("term"), col("tf")))).as("arr"))
      .withColumn("n_tokens",
        aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf")))
      .withColumn("n_distinct", size(col("arr")).cast("long"))
    def p(s: Column) = s.getField("tf").cast("double") / col("n_tokens").cast("double")
    val entropy = aggregate(col("arr"), lit(0.0), (a, s) => a - p(s) * log(p(s)))
    perDoc.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
      round(entropy, 6).as("entropy"),
      round(when(col("n_distinct") > 1,
        entropy / log(col("n_distinct").cast("double"))), 6).as("entropy_ratio"))
  }

  /** Character-n-gram entropy per document — [[docEntropy]]'s
    * sub-token sibling and the classic gibberish screen: token-level
    * entropy cannot see inside the tokens, so base64 blobs, key dumps
    * and mojibake runs (few REPEATED tokens, but near-uniform character
    * transitions) score HIGH char-bigram entropy against natural
    * language's skewed bigram law, while single-character floods score
    * near 0 — both ends of `entropy_ratio` are filterable. Same
    * determinism contract as [[docEntropy]]: exact long counts, the
    * entropy fold over the GRAM-SORTED per-doc histogram, ratio one
    * double division, rounded 6. Docs shorter than `n` chars drop.
    * Output: (doc_id, n_grams, n_distinct, entropy, entropy_ratio).
    *
    * Scale posture: one map-side gram explode into a (doc, gram) hash
    * agg, then the per-doc collapse — state bounded by the doc's gram
    * vocabulary (≤ alphabet^n), never the corpus.
    */
  def charNgramEntropy(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 4, "1 <= n <= 4")
    val tf = Par.spreadToShuffleWidth(docs, docs) // whole-doc gram build per row
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) >= n)
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("_t"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(_t) - ${n - 1}), i -> substr(_t, i, $n))"))
        .as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("tf"))
    val perDoc = tf.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("gram"), col("tf")))).as("arr"))
      .withColumn("n_grams",
        aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf")))
      .withColumn("n_distinct", size(col("arr")).cast("long"))
    def p(s: Column) = s.getField("tf").cast("double") / col("n_grams").cast("double")
    val entropy = aggregate(col("arr"), lit(0.0), (a, s) => a - p(s) * log(p(s)))
    perDoc.select(col("doc_id"), col("n_grams"), col("n_distinct"),
      round(entropy, 6).as("entropy"),
      round(when(col("n_distinct") > 1,
        entropy / log(col("n_distinct").cast("double"))), 6).as("entropy_ratio"))
  }

  /** Intra-document repetition signals — the Gopher/MassiveText-style
    * filters that catch boilerplate, keyword stuffing, and degenerate
    * generations that length/stopword heuristics miss:
    * `distinct_token_ratio` (type/token), `top_unigram_share` (most
    * frequent token's mass), `top_bigram_share` (most frequent bigram
    * over n−1 bigram slots; null for 1-token docs). Counts are exact
    * integers; each share is one long/long → double division, rounded
    * to 6 — identical op tree on any engine.
    *
    * Scale posture: two map-side-combined hash aggs keyed by (doc,
    * term) / (doc, bigram) — state bounded by per-doc vocabulary, not
    * corpus size — then a left join of two doc-keyed AGGREGATED
    * frames. No window touches raw tokens; the bigram array is a
    * codegen'd `transform`, never a self-join of positions.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .filter(size(col("_toks")) > 0)
    val uni = base
      .select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"),
        explode(col("_toks")).as("_t"))
      .groupBy("doc_id", "n_tokens", "_t").agg(count(lit(1)).as("_tf"))
      .groupBy("doc_id", "n_tokens")
      .agg(max("_tf").as("_max_uni"), count(lit(1)).as("_n_distinct"))
    val bi = base
      .filter(size(col("_toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_toks) - 1)," +
          " i -> concat(_toks[i - 1], ' ', _toks[i]))")).as("_b"))
      .groupBy("doc_id", "_b").agg(count(lit(1)).as("_bf"))
      .groupBy("doc_id").agg(max("_bf").as("_max_bi"))
    uni.join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(col("_n_distinct") / col("n_tokens"), 6).as("distinct_token_ratio"),
        round(col("_max_uni") / col("n_tokens"), 6).as("top_unigram_share"),
        round(col("_max_bi") / (col("n_tokens") - 1), 6).as("top_bigram_share"))
  }

  /** Inter-document duplicated n-gram coverage — the corpus-level
    * companion to [[repetitionStats]] (which is intra-doc): for each
    * document, the fraction of its n-gram instances whose n-gram also
    * occurs in at least one OTHER document. This is the
    * ExactSubstr-style signal (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better") at n-gram rather than suffix
    * granularity: boilerplate, licence blocks, and templated spans show
    * up as high `dup_share` long before whole-document dedup fires.
    * Documents with fewer than `n` tokens have no n-grams and are
    * excluded (a consumer left-joins and treats absent as no-signal).
    *
    * Scale posture: an inverted-index aggregation, never a pairwise
    * join — (doc, gram) instance counts via one map-side-combined hash
    * agg, gram→distinct-doc counts via a second agg over the ALREADY
    * per-doc-collapsed rows (so a gram repeated k times in one doc
    * contributes 1, and hot grams cost one row per containing doc, not
    * per instance), then a join back on the gram and one doc-keyed agg.
    * State is bounded by corpus vocabulary, not pair volume. The gram
    * key shuffles as a string; at 10^8+ docs, key by `xxhash64(gram)`
    * instead (collisions only flip a gram's dup bit, bounded by
    * n_grams × 2^-64) — kept as the string here for engine-exact
    * oracle parity. Counts are exact longs; the single division is
    * rounded to 6 on both engines.
    */
  def duplicatedNgramShare(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 5): DataFrame = {
    require(n >= 2, s"duplicatedNgramShare: n must be >= 2, got $n")
    val base = Par.spreadToShuffleWidth(docs, docs)
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .filter(size(col("_toks")) >= n)
    val grams = base.select(col("doc_id"), explode(expr(
      s"transform(sequence(0, size(_toks) - $n)," +
        s" i -> array_join(slice(_toks, i + 1, $n), ' '))")).as("_g"))
    val perDocGram = grams.groupBy("doc_id", "_g").agg(count(lit(1)).as("_c"))
    // "gram appears in >= 2 distinct docs" ⟺ min(doc) ≠ max(doc) over the
    // gram's rows (perDocGram has one row per (doc, gram)) — one window
    // over ONE gram-keyed exchange, instead of a second consumption of
    // perDocGram (a gram-count agg + join re-ran the per-doc collapse)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_g")
    perDocGram
      .withColumn("_dup", min(col("doc_id")).over(w) =!= max(col("doc_id")).over(w))
      .groupBy("doc_id")
      .agg(sum("_c").as("n_ngrams"),
        sum(when(col("_dup"), col("_c")).otherwise(lit(0L))).as("dup_ngrams"))
      .select(col("doc_id"), col("n_ngrams"), col("dup_ngrams"),
        round(col("dup_ngrams") / col("n_ngrams"), 6).as("dup_share"))
  }

  /** Corpus boilerplate mining: the `topN` word n-grams by DOCUMENT
    * frequency (distinct docs containing the gram), with instance
    * counts — the survey step before span-level dedup: licence
    * headers, navigation chrome, and templated sentences surface as
    * high-df grams. Deterministic rank: (doc_freq DESC, n_instances
    * DESC, gram ASC). Output: (rn, gram, doc_freq, n_instances).
    *
    * Scale posture: explode → one (doc, gram) map-side-combined
    * collapse (so a gram repeated in one doc counts its instances but
    * only 1 df), one gram-keyed agg, then a global top-N via
    * `TakeOrderedAndProject` (per-partition heaps, N rows to the
    * driver — never a full sort).
    */
  def frequentNgrams(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 5, topN: Int = 20): DataFrame = {
    require(n >= 1 && topN >= 1, "need n >= 1 and topN >= 1")
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(_toks) - $n)," +
          s" i -> array_join(slice(_toks, i + 1, $n), ' '))")).as("gram"))
    val ranked = grams
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("_c"))
      .groupBy("gram")
      .agg(count(lit(1)).as("doc_freq"), sum("_c").as("n_instances"))
      .orderBy(col("doc_freq").desc, col("n_instances").desc, col("gram"))
      .limit(topN)
    ranked.withColumn("rn",
      row_number().over(Window.orderBy(
        col("doc_freq").desc, col("n_instances").desc, col("gram"))).cast("long"))
      .select(col("rn"), col("gram"), col("doc_freq"), col("n_instances"))
  }

  /** Composite quality-filter verdict — the actual FILTER stage of a
    * pretraining pipeline (C4/Gopher-style rule set): every document
    * gets a keep/drop verdict plus a comma-joined list of the specific
    * rules it violated, so a corpus owner can audit WHY mass was
    * dropped (the difference between a filter and a black box).
    * Rules, in rendered order:
    *   - `too_short` / `too_long`: token count outside [minTokens, maxTokens]
    *   - `low_stopword`: stopword ratio below `minStopwordRatio`
    *     (gibberish / non-prose signal, per Gopher's stopword rule)
    *   - `token_len`: mean token length outside [minAvgTokenLen,
    *     maxAvgTokenLen] (code/ids vs prose)
    *   - `repetitive`: distinct/total token ratio below
    *     `minDistinctRatio` (Gopher's type-token rule)
    *   - `dominant_unigram`: top unigram above `maxTopUnigramShare`
    * Thresholds compare the ROUNDED(6) signal columns of
    * [[qualitySignals]] / [[repetitionStats]] — bit-equal on any
    * engine, so the boolean verdict is engine-exact too. Zero-token
    * docs flag `too_short` and leave the repetition rules unflagged
    * (their signals are null there, and null comparisons don't flag).
    * Output: (doc_id, n_tokens, keep, reasons); `reasons` is '' iff
    * `keep`.
    *
    * Scale posture: the two signal frames are each one token scan into
    * map-side-combined per-doc hash aggs; the verdict is a doc-keyed
    * equi-join of the two (co-partitioned shuffle) plus a columnar
    * CASE stack. Nothing global, nothing pairwise.
    */
  def filterVerdicts(docs: DataFrame, idCol: String, textCol: String,
                     minTokens: Int = 20, maxTokens: Int = 90,
                     minStopwordRatio: Double = 0.01,
                     minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 5.0,
                     minDistinctRatio: Double = 0.35,
                     maxTopUnigramShare: Double = 0.12): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
    val q = qualitySignals(base, col("_text"))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        round(col("stopword_ratio"), 6).as("_stop"),
        round(col("avg_token_len"), 6).as("_atl"))
    val r = repetitionStats(base, "doc_id", "_text")
      .select(col("doc_id"), col("distinct_token_ratio").as("_ttr"),
        col("top_unigram_share").as("_uni"))
    val reasons = concat_ws(",",
      when(col("n_tokens") < minTokens, lit("too_short")),
      when(col("n_tokens") > maxTokens, lit("too_long")),
      when(col("_stop") < minStopwordRatio, lit("low_stopword")),
      when(col("_atl") < minAvgTokenLen || col("_atl") > maxAvgTokenLen,
        lit("token_len")),
      when(col("_ttr") < minDistinctRatio, lit("repetitive")),
      when(col("_uni") > maxTopUnigramShare, lit("dominant_unigram")))
    q.join(r, Seq("doc_id"), "left")
      .withColumn("reasons", reasons)
      .select(col("doc_id"), col("n_tokens"),
        (col("reasons") === "").as("keep"), col("reasons"))
  }

  /** Filter funnel — where the corpus mass goes: for each rule of
    * [[filterVerdicts]] IN ORDER, how many docs enter the stage, how
    * many it drops (a doc is billed to its FIRST violated rule, the way
    * a short-circuiting pipeline would drop it), and how many survive.
    * The per-stage audit every corpus datasheet needs before anyone
    * trusts a "kept 62%" headline.
    *
    * Scale posture: one verdicts pass (see [[filterVerdicts]]), then a
    * ≤|rules|-row aggregation; the corpus total rides a 1-row crossJoin
    * and the cumulative-drop window runs over |rules| rows — nothing
    * row-scale after the verdict agg.
    *
    * Output: (stage, rule, n_in, n_dropped, n_out), stage 0-based in
    * rule order; rules that drop nothing still emit their row.
    */
  def filterFunnel(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Int = 20, maxTokens: Int = 90,
                   minStopwordRatio: Double = 0.01,
                   minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 5.0,
                   minDistinctRatio: Double = 0.35,
                   maxTopUnigramShare: Double = 0.12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val rules = Seq("too_short", "too_long", "low_stopword", "token_len",
      "repetitive", "dominant_unigram")
    val v = filterVerdicts(docs, idCol, textCol, minTokens, maxTokens,
      minStopwordRatio, minAvgTokenLen, maxAvgTokenLen, minDistinctRatio,
      maxTopUnigramShare)
    val first = when(col("reasons") === "", lit(null))
      .otherwise(split(col("reasons"), ",").getItem(0))
    val drops = v.select(first.as("rule")).filter(col("rule").isNotNull)
      .groupBy("rule").agg(count(lit(1)).as("_nd"))
    val total = v.agg(count(lit(1)).as("_n_total"))
    val stages = rules.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("stage", "rule")
    val wBefore = Window.orderBy(col("stage"))
      .rowsBetween(Window.unboundedPreceding, -1)
    stages
      .join(drops, Seq("rule"), "left")
      .withColumn("n_dropped", coalesce(col("_nd"), lit(0L)))
      .crossJoin(total)
      .withColumn("_cum", coalesce(sum(col("n_dropped")).over(wBefore), lit(0L)))
      .withColumn("n_in", col("_n_total") - col("_cum"))
      .select(col("stage"), col("rule"), col("n_in"), col("n_dropped"),
        (col("n_in") - col("n_dropped")).as("n_out"))
  }

  /** Duplicated-SPAN extraction — the actionable form of
    * [[duplicatedNgramShare]]: contiguous token ranges whose every
    * `n`-gram also appears in at least one OTHER document, i.e. the
    * spans an ExactSubstr-style dedup (Lee et al. 2022) would cut.
    * A maximal run of k consecutive inter-doc-duplicated n-gram
    * positions covers tokens `[start, start + k + n - 2]` (0-based,
    * inclusive), which is exactly the guarantee "every n-token window
    * inside the span exists elsewhere"; spans shorter than `n + minRun
    * - 1` tokens (runs shorter than `minRun` grams) are noise and are
    * dropped. Output: (doc_id, start_tok, end_tok, n_tokens_span),
    * one row per maximal span. Maximality is at the GRAM-run level:
    * two runs separated by a single non-duplicated gram position emit
    * two spans whose token extents can overlap by up to `n - 2`
    * tokens (each run's last gram extends `n - 1` tokens past its
    * start) — consumers cutting text must union extents, as
    * [[removeDuplicatedSpans]] does.
    *
    * Spans are found by gaps-and-islands over duplicated gram
    * positions: `island = pos - rank(pos)` is constant exactly on
    * consecutive-position runs. The rank window partitions by doc —
    * bounded by tokens-per-doc, never corpus-wide (the skew ceiling is
    * the longest DOCUMENT, not the biggest corpus).
    *
    * Scale posture: same inverted-index shape as
    * [[duplicatedNgramShare]] (per-doc collapse before the gram→ndocs
    * count, so hot grams cost one row per containing doc), plus a
    * broadcast-or-shuffle equi-join of positions to the dup-gram set
    * and one per-doc window. Nothing pairwise anywhere.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 5, minRun: Int = 2): DataFrame =
    dupSpanIslands(Par.spreadToShuffleWidth(docs, docs)
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks")),
      n, minRun)

  /** Island detection over a tokenized (doc_id, _toks) frame — shared
    * by [[duplicatedSpans]] and [[removeDuplicatedSpans]] so both
    * derive from ONE tokenization definition.
    */
  private def dupSpanIslands(base: DataFrame, n: Int, minRun: Int): DataFrame = {
    require(n >= 2 && minRun >= 1, "need n >= 2 and minRun >= 1")
    import org.apache.spark.sql.expressions.Window
    val eligible = base.filter(size(col("_toks")) >= n)
    val positioned = eligible.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, size(_toks) - $n)," +
        s" i -> array_join(slice(_toks, i + 1, $n), ' '))")).as(Seq("_pos", "_g")))
    // "gram appears in >= 2 distinct docs" ⟺ min(doc) ≠ max(doc) over the
    // gram's rows — one window over ONE gram-keyed exchange of the
    // positioned frame. The previous shape consumed `positioned` twice
    // (a distinct+count+filter side plus the join back), re-running the
    // tokenize+posexplode — which sits below no exchange — per consumer,
    // and shuffling the positioned frame twice more (distinct, join).
    val wg = Window.partitionBy(col("_g"))
    val dupPos = positioned
      .withColumn("_dup",
        min(col("doc_id")).over(wg) =!= max(col("doc_id")).over(wg))
      .filter(col("_dup"))
      .select(col("doc_id"), col("_pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("_pos"))
    dupPos
      .withColumn("_island", col("_pos") - row_number().over(w))
      .groupBy("doc_id", "_island")
      .agg(min("_pos").as("start_tok"), count(lit(1)).as("_run"),
        (max("_pos") + lit(n - 1)).as("end_tok"))
      .filter(col("_run") >= minRun)
      .select(col("doc_id"), col("start_tok").cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"),
        (col("end_tok") - col("start_tok") + 1).cast("long").as("n_tokens_span"))
  }

  /** Span-level dedup TRANSFORM — applies [[duplicatedSpans]]'s cut
    * list: every token covered by a duplicated span is removed and the
    * survivors rejoin in original order. This is the ExactSubstr
    * deletion step itself (Lee et al. 2022 delete the duplicated span,
    * not the document): boilerplate vanishes, the unique prose stays.
    * The rebuilt text is the LOWERCASED token stream (this engine's
    * dedup family normalizes first; a byte-exact rebuild would need
    * the original whitespace, which tokenization deliberately folds).
    * Docs with no spans pass through complete — sub-`n`-token docs AND
    * null-text docs included (a corpus-rebuild transform must never
    * silently delete a document; null text rebuilds as the empty
    * string). Output: (doc_id, n_tokens_kept, n_tokens_removed,
    * clean_md5) — the md5 stands in for the rebuilt text so the frame
    * stays narrow; swap the final projection for `clean_text` when the
    * actual corpus is being written.
    *
    * Scale posture: [[duplicatedSpans]]'s shape plus a position-level
    * anti-join (doc-keyed equi-join — covered positions are ≤ doc
    * length) and one per-doc ordered collect bounded by doc length.
    * The tokenized base frame is defined ONCE and feeds both the span
    * finder and the rebuild; execution is still two passes over it
    * (the finder's corpus-wide gram count must complete before the
    * anti-join), which is inherent to the algorithm, not the plan.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 5, minRun: Int = 2): DataFrame = {
    val base = Par.spreadToShuffleWidth(docs, docs)
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        tokens(lower(coalesce(col(textCol), lit("")))).as("_toks"))
      .withColumn("_nt", size(col("_toks")).cast("long"))
    val covered = dupSpanIslands(base.select("doc_id", "_toks"), n, minRun)
      .select(col("doc_id"),
        explode(sequence(col("start_tok"), col("end_tok"))).as("_pos"))
    val positioned = base
      .select(col("doc_id"), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .withColumn("_pos", col("_pos").cast("long"))
    val kept = positioned
      .join(covered, Seq("doc_id", "_pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("_nk"),
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok")), " ").as("_clean"))
    base.select(col("doc_id"), col("_nt"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_nk"), lit(0L)).as("n_tokens_kept"),
        (col("_nt") - coalesce(col("_nk"), lit(0L))).as("n_tokens_removed"),
        md5(coalesce(col("_clean"), lit("")).cast("binary")).as("clean_md5"))
  }

  /** DSIR-style importance score (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): each document scores
    * by its average per-token log-likelihood ratio between a TARGET
    * hashed-unigram LM (docs matching `isTarget`) and the RAW-corpus
    * LM. High scorers "look like" the target distribution — the
    * standard cheap lever for steering a 100 TB crawl toward a
    * curated/high-quality slice without a trained classifier. DSIR
    * proper then Gumbel-samples by this score; the deterministic
    * engine primitive is the score itself (callers rank or
    * threshold — both verifiable, unlike sampling noise).
    *
    * Both LMs live on the same `nBuckets`-dimensional hashed feature
    * space (engine-portable md5 buckets, as [[hashFeatures]]) with
    * Laplace +1 smoothing, so a bucket unseen in the target corpus
    * contributes a finite negative preference, not -inf:
    * `p(b) = (count(b) + 1) / (total + nBuckets)`.
    *
    * Determinism: the per-doc sum folds over a BUCKET-SORTED array
    * (bucket ids are distinct within a doc, so the sort is total);
    * each addend is `tf * ln((tc+1)(Tr+B) / ((rc+1)(Tt+B)))` with the
    * integer counts cast to double before one multiply each side of
    * one divide — the identical operation tree on any IEEE engine.
    * Products stay exact: counts < 2^53 and B ≤ 2^20 keep each factor
    * integral-in-double; the single rounding is the divide.
    *
    * Scale posture: one token scan → map-side-combined (doc, bucket)
    * hash agg (state per task bounded by docs-in-partition × B); the
    * two LM frames are ≤ B rows each and broadcast; totals are a
    * 1-row broadcast. No shuffle wider than the (doc, bucket) agg,
    * nothing pairwise. Output: (doc_id, n_tokens, avg_llr) for every
    * doc with ≥ 1 token.
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, nBuckets: Int = 128): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= (1 << 20),
      s"dsirScores: need 1 <= nBuckets <= 2^20, got $nBuckets")
    val b = lit(nBuckets.toLong)
    val perDocBucket0 = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        coalesce(isTarget.cast("boolean"), lit(false)).as("_tgt"),
        explode(tokens(lower(col(textCol)))).as("_term"))
      .withColumn("_b", graft.ops.Sampling.hashBucket(col("_term"), nBuckets))
      .groupBy("doc_id", "_b")
      .agg(count(lit(1)).as("_tf"), first("_tgt").as("_tgt"))
    // materialize ONCE (eager localCheckpoint): the hashed-bucket frame
    // feeds four consumers (rc, tc, totals — all under broadcasts, which
    // share nothing with the main path — plus the per-doc fold), so the
    // tokenize+explode chain ran ~4x per pass. The frame is
    // doc × min(nBuckets, distinct-terms) rows of narrow longs.
    val perDocBucket =
      if (perDocBucket0.isStreaming) perDocBucket0
      else perDocBucket0.localCheckpoint(true)
    val rc = perDocBucket.groupBy("_b").agg(sum("_tf").as("_rc"))
    val tc = perDocBucket.filter(col("_tgt"))
      .groupBy("_b").agg(sum("_tf").as("_tc"))
    val totals = perDocBucket.agg(
      sum(when(col("_tgt"), col("_tf")).otherwise(lit(0L))).as("_tt"),
      sum("_tf").as("_tr"))
    val perDoc = perDocBucket
      .join(broadcast(rc), "_b")
      .join(broadcast(tc), Seq("_b"), "left")
      .withColumn("_tc", coalesce(col("_tc"), lit(0L)))
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(
        array_sort(collect_list(
          struct(col("_b"), col("_tf"), col("_tc"), col("_rc")))).as("arr"),
        first("_tt").as("_tt"), first("_tr").as("_tr"))
    val nTokens = aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("_tf"))
    val llr = aggregate(col("arr"), lit(0.0), (a, s) =>
      a + s.getField("_tf").cast("double") * log(
        ((s.getField("_tc") + lit(1L)).cast("double") * (col("_tr") + b).cast("double")) /
          ((s.getField("_rc") + lit(1L)).cast("double") * (col("_tt") + b).cast("double"))))
    perDoc.select(col("doc_id"), nTokens.as("n_tokens"),
      round(llr / nTokens, 6).as("avg_llr"))
  }

  /** Per-group token-distribution statistics vs the corpus: Shannon
    * entropy of the group's unigram distribution and KL(group ‖ corpus)
    * — the drift gate a training-data pipeline runs per source/day
    * before a batch is admitted (a scraper gone wrong shows up as an
    * entropy collapse or a KL spike long before eval metrics move).
    * Output: (group, n_tokens, n_terms, entropy, kl_vs_corpus).
    *
    * Determinism discipline: counts are exact longs; the two double
    * folds run over a TERM-SORTED array per group (same sorted-fold
    * trick as [[unigramLogProbScore]]), so results are independent of
    * partitioning and reproducible cross-engine. Per-group state is
    * the group's VOCABULARY (structs of term/tf/cnt), not its token
    * stream — bounded by distinct terms; for groups whose vocabulary
    * itself is huge, shard terms upstream and combine KL additively
    * over the shards.
    */
  def tokenDistributionShift(docs: DataFrame, textCol: String,
                             groupCol: String): DataFrame = {
    val toks = docs
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), explode(tokens(lower(col(textCol)))).as("term"))
    val gtf = toks.groupBy("grp", "term").agg(count(lit(1)).as("tf"))
    val cnt = gtf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = cnt.agg(sum("cnt").as("n_total"))
    val perGroup = gtf.join(cnt, "term")
      .crossJoin(broadcast(total))
      .groupBy("grp")
      .agg(
        array_sort(collect_list(struct(col("term"), col("tf"), col("cnt")))).as("arr"),
        first("n_total").as("n_total"))
    val n = aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf"))
    def p(s: Column) = s.getField("tf").cast("double") / col("n_tokens")
    def q(s: Column) = s.getField("cnt").cast("double") / col("n_total")
    val entropy = aggregate(col("arr"), lit(0.0), (a, s) => a - p(s) * log(p(s)))
    val kl = aggregate(col("arr"), lit(0.0), (a, s) => a + p(s) * log(p(s) / q(s)))
    perGroup
      .withColumn("n_tokens", n)
      .select(col("grp").as(groupCol), col("n_tokens"),
        size(col("arr")).cast("long").as("n_terms"),
        round(entropy, 6).as("entropy"),
        round(kl, 6).as("kl_vs_corpus"))
  }

  /** Feature hashing ("hashing trick"): bag-of-words counts over a
    * FIXED feature space of `nBuckets` dimensions, no vocabulary pass
    * at all — the one-scan featurizer for when even a bounded vocab is
    * a luxury (streaming featurization, 10⁹-doc corpora). Bucket =
    * md5-derived hash of the token (same engine-portable hash family
    * as [[graft.ops.Sampling.hashBucket]]; Spark's native `hash()` is
    * Murmur3 with Spark-specific seeding and would pin the features to
    * one engine). Output: (doc_id, bucket, n) sparse counts.
    *
    * Scale posture: explode → map-side-combined hash agg on
    * (doc, bucket); one scan, no joins, no global state. Collisions
    * are the accepted trade of the technique (bounded by nBuckets).
    */
  def hashFeatures(docs: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    toks
      .withColumn("bucket", graft.ops.Sampling.hashBucket(col("term"), nBuckets))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
  }

  /** Build a bounded vocabulary: the `topN` terms by document
    * frequency (ties broken by term text), with exact document and
    * total-term frequencies and a dense, deterministic `term_id`
    * (0-based rank in (doc_freq desc, term asc) order) — the id
    * assignment step every tokenizer/featurizer pipeline needs before
    * it can encode text as ints.
    *
    * Scale posture: term statistics are two hash aggs over the token
    * explode (map-side combined; term-skew handled by AQE like
    * [[tfIdf]]). The top-N cut is `orderBy(...).limit(n)` — planned as
    * TakeOrderedAndProject (per-partition bounded heaps + one merge of
    * n·|partitions| rows), NOT a global sort of the term universe. Only
    * the SURVIVING n rows pass through the single-partition id window;
    * a vocabulary is bounded by construction (n ≤ a few hundred
    * thousand), so that window is a deliberate, size-capped exception
    * to the no-global-window rule.
    */
  def buildVocab(docs: DataFrame, idCol: String, textCol: String,
                 topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val stats = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"), sum("tf").as("term_freq"))
    stats
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(topN)
      .withColumn("term_id",
        (row_number().over(Window.orderBy(col("doc_freq").desc, col("term"))) - 1).cast("long"))
      .select(col("term_id"), col("term"), col("doc_freq"), col("term_freq"))
  }

  /** Word `n`-gram shingles (space-joined), distinct. Used by the dedup
    * family (MinHash / Jaccard). Docs shorter than `n` tokens yield an
    * empty array (the `when` guard keeps `sequence` from going negative).
    */
  /** Per-doc average unigram log-likelihood under the corpus' own
    * unigram distribution — the classic cheap "LM-ish" quality signal
    * (a doc of common words scores near the corpus average; gibberish
    * and boilerplate-of-rare-tokens score far below). Two hash
    * aggregations + a broadcast total; the per-doc sum folds over a
    * TERM-SORTED array so the double addition order is deterministic —
    * a plain groupBy sum of doubles would be partition-order dependent
    * and unverifiable cross-engine.
    * Output: (doc_id, n_tokens, avg_logprob).
    */
  def unigramLogProbScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = cnt.agg(sum("cnt").as("n_total"))
    val perDoc = tf.join(cnt, "term")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        array_sort(collect_list(struct(col("term"), col("tf"), col("cnt")))).as("arr"),
        first("n_total").as("n_total"))
    val nTokens = aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf"))
    val score = aggregate(col("arr"), lit(0.0), (a, s) =>
      a + s.getField("tf").cast("double") *
        log(s.getField("cnt").cast("double") / col("n_total")))
    perDoc.select(col("doc_id"), nTokens.as("n_tokens"),
      round(score / nTokens, 6).as("avg_logprob"))
  }

  /** Per-doc average BIGRAM conditional log-likelihood under the
    * corpus' own Laplace-smoothed bigram LM — the step from
    * [[unigramLogProbScore]]'s bag-of-words signal toward CCNet-style
    * perplexity filtering: a doc whose word ORDER is unlike the corpus
    * (shuffled text, stitched fragments, template glitches) scores low
    * even when its vocabulary is ordinary.
    *
    * `score = (1/B) Σ_slots ln((c(w₁,w₂) + 1) / (c(w₁·) + V))` with
    * `c(w₁,w₂)` the corpus bigram count, `c(w₁·)` the count of `w₁` as
    * a bigram HISTORY, `V` the corpus distinct-unigram count (Laplace
    * denominator), `B` the doc's bigram-slot count. Docs with < 2
    * tokens have no slot and drop (the [[unigramLogProbScore]]
    * no-token contract).
    *
    * Determinism: every LM input is an exact long; the per-doc fold
    * runs over the BIGRAM-SORTED array; each slot's contribution is
    * one fixed double tree — engine-bit-identical.
    *
    * Scale posture: bigram/history counts are map-side-combined hash
    * aggs over the slot explode (codegen'd `transform`, no position
    * self-join); the per-doc frame joins them on the bigram / history
    * KEY (AQE splits hot grams); only the 1-row V frame broadcasts.
    * Per-doc state is the doc's own distinct-bigram set.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Par.spreadToShuffleWidth(docs, docs) // per-doc bigram explode
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
    val slots = base.filter(size(col("_toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_toks) - 1)," +
          " i -> struct(_toks[i - 1] AS w1," +
          " concat(_toks[i - 1], ' ', _toks[i]) AS bg))")).as("_s"))
      .select(col("doc_id"), col("_s.w1").as("w1"), col("_s.bg").as("bg"))
    val docBg = slots.groupBy("doc_id", "w1", "bg").agg(count(lit(1)).as("tf"))
    val bgCnt = slots.groupBy("bg").agg(count(lit(1)).as("c12"))
    // The history count derives from the DISTINCT-BIGRAM frame, not from a
    // third pass over `slots`: c(w₁·) = Σ_{bg starts w₁} c(bg), and w₁ is
    // recoverable from the bigram key (tokens are whitespace-split, so the
    // first space in `bg` is the w₁/w₂ boundary). Every consumer of
    // `slots` re-runs scan+tokenize+explode (group keys differ — no
    // exchange to reuse), so rooting this on bgCnt (≤ distinct corpus
    // bigrams, already aggregated) removes one full corpus pass while
    // producing identical longs.
    val histCnt = bgCnt
      .select(substring_index(col("bg"), " ", 1).as("w1"), col("c12"))
      .groupBy("w1").agg(sum("c12").as("c1"))
    val vocabV = base.select(explode(col("_toks")).as("_t"))
      .agg(countDistinct(col("_t")).as("v"))
    val perDoc = docBg
      .join(bgCnt, "bg")
      .join(histCnt, "w1")
      .crossJoin(broadcast(vocabV))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
          struct(col("bg"), col("tf"), col("c12"), col("c1")))).as("arr"),
        first("v").as("v"))
    val nSlots = aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf"))
    val score = aggregate(col("arr"), lit(0.0), (a, s) =>
      a + s.getField("tf").cast("double") *
        log((s.getField("c12").cast("double") + lit(1.0)) /
            (s.getField("c1").cast("double") + col("v").cast("double"))))
    perDoc.select(col("doc_id"), nSlots.as("n_bigrams"),
      round(score / nSlots, 6).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram score — the modern-smoothing
    * upgrade of [[bigramLmScore]]'s Laplace LM, and the standard
    * n-gram baseline for CCNet-style perplexity filtering:
    *
    * `P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/B`
    *
    * with discount `D = 0.75` (exactly representable), `N₁₊(w₁·)` the
    * distinct-follower count of `w₁`, `N₁₊(·w₂)` the distinct-history
    * count of `w₂` (the continuation numerator), and `B` the corpus
    * distinct-bigram-type count (the continuation denominator). The
    * corpus is its own training set, so every doc bigram has
    * `c(w₁w₂) ≥ 1` and the discounted term never needs a backoff-only
    * branch. Docs with < 2 tokens drop (no slot — the
    * [[bigramLmScore]] contract).
    *
    * Determinism: all LM inputs are exact longs, `D` is a dyadic
    * double, each slot is ONE fixed double tree inside `ln`, and the
    * per-doc sum folds over the BIGRAM-SORTED array.
    *
    * Scale posture: identical to [[bigramLmScore]] plus two more
    * map-side-combined distinct aggregations (follower / history
    * counts), all joined on the gram KEY; only the 1-row B frame
    * broadcasts.
    */
  def kneserNeyScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), tokens(lower(col(textCol))).as("_toks"))
    val slots = base.filter(size(col("_toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_toks) - 1)," +
          " i -> struct(_toks[i - 1] AS w1, _toks[i] AS w2," +
          " concat(_toks[i - 1], ' ', _toks[i]) AS bg))")).as("_s"))
      .select(col("doc_id"), col("_s.w1").as("w1"), col("_s.w2").as("w2"),
        col("_s.bg").as("bg"))
    val docBg = slots.groupBy("doc_id", "w1", "w2", "bg")
      .agg(count(lit(1)).as("tf"))
    // Every corpus statistic beyond c(bg) derives from the DISTINCT-BIGRAM
    // frame `bgCnt`, not from re-passes over the raw `slots` explode
    // (consumers of `slots` share no exchange, so each one re-ran
    // scan+tokenize+explode — 5 full corpus passes for this operator;
    // now 2: docBg and bgCnt). w₁/w₂ are recoverable from the bigram key
    // (whitespace-split tokens ⇒ the first space is the boundary), and:
    //   c(w₁·)    = Σ_{bg starts w₁} c(bg)
    //   N₁₊(w₁·)  = |{bg : bg starts w₁}|   (one bgCnt row per distinct bg)
    //   N₁₊(·w₂)  = |{bg : bg ends w₂}|
    //   B         = |bgCnt|
    // — identical longs by construction.
    val bgCnt = slots.groupBy("bg").agg(count(lit(1)).as("c12"))
    val bgSplit = bgCnt.select(col("bg"), col("c12"),
      substring_index(col("bg"), " ", 1).as("_w1"),
      substring_index(col("bg"), " ", -1).as("_w2"))
    val histCnt = bgSplit.groupBy(col("_w1").as("w1"))
      .agg(sum("c12").as("c1"), count(lit(1)).as("f1"))
    val precCnt = bgSplit.groupBy(col("_w2").as("w2"))
      .agg(count(lit(1)).as("p2"))
    val bTypes = bgCnt.agg(count(lit(1)).as("b"))
    val perDoc = docBg
      .join(bgCnt, "bg")
      .join(histCnt, "w1")
      .join(precCnt, "w2")
      .crossJoin(broadcast(bTypes))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(
          struct(col("bg"), col("tf"), col("c12"), col("c1"),
            col("f1"), col("p2")))).as("arr"),
        first("b").as("b"))
    val nSlots = aggregate(col("arr"), lit(0L), (a, s) => a + s.getField("tf"))
    val score = aggregate(col("arr"), lit(0.0), (a, s) =>
      a + s.getField("tf").cast("double") * log(
        greatest(s.getField("c12").cast("double") - lit(0.75), lit(0.0)) /
          s.getField("c1").cast("double") +
        lit(0.75) * s.getField("f1").cast("double") /
          s.getField("c1").cast("double") *
          (s.getField("p2").cast("double") / col("b").cast("double"))))
    perDoc.select(col("doc_id"), nSlots.as("n_bigrams"),
      round(score / nSlots, 6).as("avg_logprob"))
  }

  /** CCNet-style perplexity bucketing: score every doc with the
    * corpus-trained [[bigramLmScore]], cut the distribution into
    * `buckets` equal slices, and keep everything above the worst
    * bucket. The cut thresholds come from a DETERMINISTIC md5
    * hash-sample (1/`sampleMod` of docs) sorted exactly — the
    * production shape: the sample is bounded (sortable on one
    * executor-ish scale; tune `sampleMod` to the corpus), the full
    * corpus only ever compares map-side against the broadcast
    * threshold array. Ties at a threshold go strictly to the lower
    * bucket (`score > t`), on the ROUNDED 6-dp score — engine-stable.
    * Output: (doc_id, avg_logprob, ppl_bucket 1..buckets ascending =
    * worst..best, keep = bucket >= 2).
    */
  def pplBucketSelect(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 3, sampleMod: Int = 4): DataFrame = {
    require(buckets >= 2 && sampleMod >= 1, "need buckets >= 2, sampleMod >= 1")
    import org.apache.spark.sql.expressions.Window
    // Materialize the per-doc scores ONCE (eager localCheckpoint). The
    // bucketing consumes `sc` three ways — the sample-count broadcast, the
    // threshold subtree and the full-corpus compare — and a subtree under
    // different broadcast parents is re-executed per parent (no exchange
    // reuse fires), so the whole bigram-LM chain ran ~3x per pass
    // (q_ppl_select exec 15-21 s cold vs ~4-6 s for one chain). The
    // checkpointed frame is (doc_id, n_bigrams, avg_logprob) — corpus
    // CARDINALITY but ~24 B/row, the lightweight-proxy shape of guide §8:
    // decisions move to a small frame, the heavy chain runs once.
    val sc0 = bigramLmScore(docs, idCol, textCol)
    val sc = if (sc0.isStreaming) sc0 else sc0.localCheckpoint(true)
    val hash = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 8), 16, 10).cast("long")
    val smp = sc.filter(hash % sampleMod === 0)
    val ranked = smp.withColumn("_rn",
      row_number().over(Window.orderBy(col("avg_logprob"), col("doc_id"))))
    val nS = smp.agg(count(lit(1)).as("_ns"))
    val cutRanks = (1 until buckets).map(b =>
      col("_rn") === expr(s"($b * _ns + ${buckets - 1}) div $buckets"))
    val th = ranked.crossJoin(broadcast(nS))
      .filter(cutRanks.reduce(_ || _))
      .agg(array_sort(collect_list(col("avg_logprob"))).as("_ts"))
    // fail OPEN on a degenerate sample: if the hash sample produced
    // fewer than buckets-1 thresholds (tiny corpus, or no doc_id
    // lands on the sample residue), bucketing carries no signal —
    // keeping everything is the only safe verdict (the alternative
    // silently drops the whole corpus)
    sc.crossJoin(broadcast(th))
      .select(col("doc_id"), col("avg_logprob"),
        (size(filter(col("_ts"), t => col("avg_logprob") > t)) + 1)
          .cast("long").as("ppl_bucket"),
        size(col("_ts")).as("_nts"))
      .withColumn("keep",
        col("ppl_bucket") >= 2 || col("_nts") < lit(buckets - 1))
      .drop("_nts")
  }

  /** Overlapping token-window chunking — the context-window preparation
    * step before embedding/training: each doc splits into windows of
    * `chunkTokens` whitespace tokens advancing by `chunkTokens -
    * overlap`, the final partial window kept. Pure column program
    * (slice is a regular expression, not a lambda-refed HOF — no
    * substitution hazard); one row per (doc, chunk).
    * Output: (doc_id, chunk_idx, n_tokens, chunk_text).
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") > 0)
      // chunk starts: 1, 1+stride, … while start <= max(n - overlap, 1)
      // (a start beyond n - overlap would yield a pure-suffix duplicate)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          ceil((greatest(col("_n") - lit(overlap), lit(1))) / lit(stride.toDouble))
            .cast("long") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("_toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(chunkTokens)).as("_c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("_c")).cast("long").as("n_tokens"),
        concat_ws(" ", col("_c")).as("chunk_text"))
  }

  /** Greedy sequence packing: assign docs (in deterministic `orderCol`
    * order) to consecutive packs of at most `budgetTokens` whitespace
    * tokens — the batch-construction step that turns a corpus into
    * fixed-budget training sequences. A doc larger than the budget gets
    * its own pack (chunk first if that matters). One window pass —
    * the running total is a prefix sum, so pack_id =
    * greedy boundary count = how many times the running sum crossed a
    * budget multiple, computable per row from the EXCLUSIVE prefix sum.
    *
    * NOTE greedy-exact semantics: pack_id(i) = prefix_before(i) div
    * budget is the bin-by-cumulative-volume relaxation (a doc may
    * straddle a boundary); computed with LONG integer division on both
    * engines (Spark `div`, DuckDB `//`) — exact at any prefix-sum
    * magnitude, unlike a double-precision floor near 2^53.
    *
    * Scale note: an UNPARTITIONED ordered window funnels all rows
    * through one task — fine for a per-shard corpus slice, wrong for
    * 100 TB in one call. Pass `shardCol` to pack independently within
    * shards (date / hash bucket): same semantics per shard, fully
    * parallel, pack ids unique as (shard, pack_id).
    * Output: (doc_id, n_tokens, pack_id).
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
                        budgetTokens: Long,
                        shardCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens >= 1)
    val w = shardCol.map(s => Window.partitionBy(col(s)).orderBy(col("doc_id")))
      .getOrElse(Window.orderBy(col("doc_id")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = Seq(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens")) ++ shardCol.map(col)
    docs
      .select(keep: _*)
      .withColumn("pack_id",
        call_function("div",
          coalesce(sum("n_tokens").over(w), lit(0L)), lit(budgetTokens)))
  }

  /** HTML → text extraction — the first transform every crawl-derived
    * corpus applies. Regexp-chain stripper, deliberately RE2-portable
    * (inline `(?is)` flags, no lookaround) so the exact rules are
    * auditable and re-runnable on any engine:
    *
    *   1. `<script>`/`<style>` blocks (and their content) removed —
    *      code and CSS must never leak into "text";
    *   2. HTML comments removed;
    *   3. every remaining tag replaced by a SPACE (not ""): adjacent
    *      block elements must not weld words together;
    *   4. the common entities decoded (`&amp; &lt; &gt; &quot; &#39;
    *      &apos; &nbsp;`) — `&amp;` decoded LAST so `&amp;lt;` yields
    *      the literal `&lt;` the author wrote, not a `<`;
    *   5. whitespace collapsed and trimmed.
    *
    * This is the 95% extractor (boilerplate removal on top of it is
    * [[graft.ops.Boilerplate.removeBoilerplate]]'s job — trafilatura-
    * class DOM scoring is out of scope by design). Pure map-side
    * codegen'd string ops — rides the scan at 100 TB.
    */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)</?[a-zA-Z!][^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&" // last: &amp;lt; must become the literal &lt;
    ).foldLeft(noTags) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Rule-based sentence splitting — the unit-of-work producer for
    * sentence-level dedup, per-sentence quality filters, and
    * translation-pair mining. A sentence is a maximal run
    * `[^.!?]+[.!?]*`: text up to and including its terminator cluster
    * ("a.. b!" → "a..", "b!"; a terminator-less tail is its own
    * sentence). RE2-portable by construction — the usual
    * lookbehind-split (`(?<=[.!?])\s+`) does NOT exist in RE2, so this
    * extraction form is the one whose behavior every engine can
    * reproduce. Leading orphan terminators have no sentence to belong
    * to and drop — documented, identical on both engines. Abbreviation
    * handling ("Dr.") is a lexicon problem, out of scope by design.
    *
    * Output: (doc_id, sentence_idx 0-based, sentence), trimmed,
    * empties dropped. Pure map-side extract + explode.
    */
  def splitSentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        filter(transform(
          regexp_extract_all(col(textCol), lit("[^.!?]+[.!?]*"), lit(0)),
          x => trim(x)), x => x =!= "").as("_arr"))
      .select(col("doc_id"), posexplode(col("_arr")))
      .select(col("doc_id"), col("pos").cast("long").as("sentence_idx"),
        col("col").as("sentence"))

  /** Sentence-level code-switch report: [[languageId]] each sentence,
    * then per doc the sentence count, distinct IDENTIFIED languages
    * (`und` — no markers matched — is ignorance, not a language: most
    * short/neutral sentences score `und`, and counting it would fire
    * the switch flag on clean monolingual docs), the majority
    * identified language (ties to the lexicographically smaller code —
    * the min-struct argmax idiom, no window; `und` with share 0 when
    * NO sentence identifies), its integer-ppm share of all sentences,
    * and `code_switched` = ≥2 identified languages. Sentence langid is
    * map-side; the two stacked aggs cost two doc-keyed exchanges (the
    * first also clusters by language — pinned in `PlanAuditSpec`).
    * Output: (doc_id, n_sents, n_langs, major_lang, major_ppm,
    * code_switched).
    */
  def langMix(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    splitSentences(docs, idCol, textCol)
      .select(col("doc_id"), languageId(col("sentence")).as("_lang"))
      .groupBy("doc_id", "_lang").agg(count(lit(1)).as("_n"))
      .groupBy("doc_id").agg(
        sum(col("_n")).as("n_sents"),
        count(when(col("_lang") =!= "und", 1)).as("n_langs"),
        min(when(col("_lang") =!= "und",
          struct((-col("_n")).as("_neg"), col("_lang").as("_l")))).as("_best"))
      .select(col("doc_id"), col("n_sents"), col("n_langs"),
        coalesce(col("_best").getField("_l"), lit("und")).as("major_lang"),
        coalesce(expr("((-_best._neg) * 1000000L) div n_sents"), lit(0L))
          .as("major_ppm"),
        (col("n_langs") > 1).as("code_switched"))

  /** Whitespace/control normalization for canonicalization-before-dedup:
    * lowercase, control chars → space, runs of whitespace collapsed,
    * trimmed. Pure codegen'd string ops.
    */
  def normalizeText(text: Column): Column =
    // explicit control-char range, not \p{Cntrl}: the Java-only POSIX
    // class name doesn't exist in RE2, and this pattern must mean the
    // same thing to every engine that re-tokenizes the corpus
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /** PII masking patterns — deliberately lookaround-free so the SAME
    * pattern strings run identically under Java regex (Spark) and RE2
    * (DuckDB, re2 in a scrubbing sidecar service): training corpora get
    * scrubbed once, and every engine that touches the data must agree
    * on what was masked. Order matters: emails before phone-ish digit
    * runs, URLs before bare IPs.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+"                                -> "<URL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d().-]{6,}\\d"                         -> "<PHONE>")

  /** Apply all [[PiiPatterns]] left to right. One chained projection —
    * no UDF, linear in text length.
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Canonical output column per PII pattern, in [[PiiPatterns]] order. */
  val PiiCountNames: Seq[String] = Seq("n_email", "n_url", "n_ip", "n_phone")

  /** Per-document PII span counts — the audit signal behind
    * [[scrubPii]]: how much PII a scrub WOULD mask, per kind, which is
    * what a corpus release review actually asks ("how many emails per
    * 1k docs, which sources carry phone numbers"). Counts are taken
    * SEQUENTIALLY on progressively scrubbed text, so every span is
    * attributed to exactly the pattern that would mask it (an email's
    * digit run never double-counts as a phone, matching the
    * left-to-right replacement order of [[scrubPii]]).
    * Output: (doc_id, n_email, n_url, n_ip, n_phone, n_pii).
    *
    * Scale posture: one chained columnar projection per doc — regex
    * passes linear in text length, no shuffle at all until the caller
    * aggregates. RE2-portable patterns, so the same counts reproduce
    * in any engine ([[PiiPatterns]]'s contract).
    */
  def piiDensity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (counts, _) = PiiPatterns.zip(PiiCountNames)
      .foldLeft((Seq.empty[Column], col(textCol))) {
        case ((acc, cur), ((pat, repl), name)) =>
          (acc :+ size(regexp_extract_all(cur, lit(pat), lit(0)))
            .cast("long").as(name),
            regexp_replace(cur, pat, repl))
      }
    docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id") +: counts: _*)
      .withColumn("n_pii", PiiCountNames.map(col).reduce(_ + _))
  }

  /** Corpus composition datasheet: per (lang, source) cell — document
    * count, token mass, and share of total corpus tokens in exact
    * integer parts-per-million. The first table in every dataset card,
    * and the input mixture designers weight against. Output: (lang,
    * source, n_docs, n_tokens, token_share_ppm); null lang/source
    * group as their own row (they are real corpus mass a datasheet
    * must not hide).
    *
    * Scale posture: one token-count projection ([[tokenCount]]'s
    * single regexp pass — no token array, no explode), one
    * map-side-combined hash agg to ≤ |langs|·|sources| cells, one
    * 1-row broadcast total.
    */
  def corpusComposition(docs: DataFrame, textCol: String,
                        langCol: String, sourceCol: String): DataFrame = {
    val cells = docs
      .select(col(langCol).as("lang"), col(sourceCol).as("source"),
        tokenCount(col(textCol)).cast("long").as("_nt"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("_nt"), lit(0L)).as("n_tokens"))
    val total = cells.agg(sum("n_tokens").as("_total"))
    // share in exact integer PPM via decimal intdiv — a rounded double
    // quotient would sit a .5 boundary away from a hash mismatch
    // (tools/check.py compares floats exactly), and a plain long
    // multiply overflows past ~9e12 tokens per cell
    cells.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens").cast("decimal(38,0)") * lit(1000000) /
          col("_total").cast("decimal(38,0)")).cast("long").as("token_share_ppm"))
  }

  /** Word n-grams via the compact native kernel
    * ([[graft.functions.TextExpressions.WordShingles]]): semantics of
    * `array_distinct(transform(sequence(...), concat_ws(" ", …)))`, but
    * as ONE expression node so optimizer substitution (predicate
    * pushdown, `InferFiltersFromGenerate`) can never turn the token
    * derivation into a per-element re-evaluation — the declarative
    * rendering cost 30-50 s over 4,500 docs at n = 8 exactly that way.
    * [[shinglesHofReference]] keeps the declarative form for the
    * equivalence spec.
    */
  def shinglesFromToks(toks: Column, n: Int): Column = {
    require(n >= 1 && n <= 8, "shingle size out of range")
    graft.functions.TextExpressions.wordShingles(toks, n)
  }

  /** Declarative reference implementation of [[shinglesFromToks]] —
    * kept ONLY for the spec that pins the native kernel's semantics.
    */
  private[graft] def shinglesHofReference(toks: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, (i + lit(o)).cast("int"))): _*))
    array_distinct(
      when(size(toks) >= n, sh).otherwise(array().cast("array<string>")))
  }

  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromToks(tokens(lower(text)), n)

  /** Collocation mining: adjacent word pairs whose co-occurrence beats
    * the independence expectation — PMI's argument, emitted as integer
    * PPM ("new york", "et al"-style multiword expressions; the standard
    * pre-tokenizer signal for merging units). For the bigram (a, b)
    * with bigram count n_ab over Nb bigram slots and unigram counts
    * n_a, n_b over Nt tokens:
    *
    *   lift = (n_ab / Nb) / ((n_a / Nt) · (n_b / Nt))
    *
    * i.e. exp(PMI) — monotone in PMI, so ranking is PMI ranking, but
    * the value needs no `ln` (one less libm call to keep bit-parity
    * over). Each factor is a long→double division; the division tree
    * is written identically in the oracle.
    *
    * Scale posture: two map-side-combined hash aggs (bigram, unigram)
    * over codegen'd `transform` arrays — no position self-join; the
    * unigram frame joins the bigram frame twice on the term key
    * (broadcast when small, shuffle-hash otherwise, AQE's call). The
    * top-N cut is `orderBy.limit` → TakeOrderedAndProject (bounded
    * per-partition heaps), never a global sort of the pair universe.
    * Output: (w1, w2, pair_cnt, lift_ppm), top `topN` by
    * (lift_ppm desc, w1, w2), pair_cnt ≥ minCount.
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, topN: Int = 50): DataFrame = {
    val base = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(tokens(lower(col(textCol))).as("_toks"))
    val uni = base.select(explode(col("_toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("w_cnt"))
    val bi = base.filter(size(col("_toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_toks) - 1)," +
          " i -> struct(_toks[i - 1] AS w1, _toks[i] AS w2))")).as("_b"))
      .select(col("_b.w1").as("w1"), col("_b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("pair_cnt"))
    val nTok = uni.agg(sum("w_cnt").as("n_tok"))
    val nBi = bi.agg(sum("pair_cnt").as("n_bi"))
    bi.filter(col("pair_cnt") >= minCount)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("w_cnt", "c1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("w_cnt", "c2"), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("pair_cnt"),
        round(lit(1000000.0) *
          (col("pair_cnt").cast("double") / col("n_bi").cast("double")) /
          ((col("c1").cast("double") / col("n_tok").cast("double")) *
           (col("c2").cast("double") / col("n_tok").cast("double"))))
          .cast("long").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Vocabulary-coverage (OOV) audit per group: with the corpus's own
    * top-`vocabSize` vocabulary ([[buildVocab]]), what share of each
    * group's token INSTANCES falls outside it? The tokenizer-fertility
    * question every multilingual/multi-source mix has to answer before
    * training — a source whose oov share spikes is one the tokenizer
    * under-serves. Share is exact integer arithmetic:
    * `oov_ppm = n_oov·10⁶ div n_tokens`.
    *
    * Scale posture: the vocab is bounded by construction (top-N) and
    * broadcast; the audit is one explode → broadcast left join →
    * group agg, no shuffle of the token stream beyond the group key.
    * Output: (group, n_tokens, n_oov, oov_ppm).
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              groupCol: String, vocabSize: Int = 1000): DataFrame = {
    val vocab = buildVocab(docs, idCol, textCol, vocabSize)
      .select(col("term"), lit(true).as("_in_vocab"))
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("group_key"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy("group_key")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("group_key"), col("n_tokens"), col("n_oov"),
        expr("(n_oov * 1000000L) div n_tokens").as("oov_ppm"))
  }

  /** fasttext-style hashed linear text classifier — model-based quality
    * filtering (the CCNet / LLM-corpus "does this look like good prose"
    * gate that length/punct heuristics can't express). Each token hashes
    * to one of `weightsPpm.size` buckets (md5-prefix hash — the same
    * engine-portable construction as [[graft.ops.Sampling.hashBucket]]);
    * the document logit is `bias + mean(weight[h(token)])` and the score
    * its sigmoid.
    *
    * Weights are integer MILLIONTHS: the token-sum accumulates in BIGINT,
    * so it is exactly order-independent — no float-summation parity trap
    * in the hash surface — and only the final sigmoid touches doubles
    * (derived from one exact integer, bit-stable across engines).
    * Training is out of scope by design (a logistic fit over these
    * hashed counts, run offline); the weights table is the model.
    *
    * Scale posture: pure map-side — tokenize, hash, fold, sigmoid; the
    * weight table rides the plan as a literal array (a few KB), no
    * join, no shuffle, no UDF.
    *
    * Output: (idCol, n_tokens, sum_ppm, score), score rounded 6 dp.
    */
  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
                         weightsPpm: Seq[Long], biasPpm: Long): DataFrame = {
    require(weightsPpm.nonEmpty, "empty weight table")
    val dims = weightsPpm.size
    val w = typedLit(weightsPpm)
    val toks = tokens(lower(coalesce(col(textCol), lit(""))))
    val idx = (c: Column) =>
      conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % dims
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      aggregate(toks, lit(0L),
        (acc, t) => acc + element_at(w, (idx(t) + 1).cast("int"))).as("sum_ppm"))
      .withColumn("score", round(
        lit(1.0) / (lit(1.0) + exp(-(lit(biasPpm / 1e6) +
          when(col("n_tokens") > 0,
            col("sum_ppm").cast("double") / (col("n_tokens") * 1e6))
            .otherwise(lit(0.0))))), 6))
  }

  /** Encoding-damage (mojibake) audit per group — the corpus-health
    * check that catches bad transcodes before they poison a tokenizer:
    * U+FFFD replacement chars (a decode already failed upstream), the
    * 'Ã'+continuation-range signature of UTF-8 bytes re-decoded as
    * Latin-1 (café → cafÃ©), raw C1 controls U+0080–U+009F (almost
    * always windows-1252 mislabeled ISO-8859-1), and NBSP (layout
    * residue that splits tokenizers). Doc-level flags — a doc is
    * damaged or it isn't; occurrence counts would double-weight long
    * docs. Wholly map-side into one agg; the patterns are codepoint
    * classes java.util.regex and RE2 read identically.
    */
  def encodingAudit(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def flag(c: Column) = sum(when(c, 1L).otherwise(0L)).cast("long")
    df.filter(col(groupCol).isNotNull && t.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        flag(t.contains("\uFFFD")).as("n_replacement"),
        flag(t.rlike("\u00C3[\u0080-\u00BF]")).as("n_double_utf8"),
        flag(t.rlike("[\u0080-\u009F]")).as("n_c1_controls"),
        flag(t.contains("\u00A0")).as("n_nbsp"))
  }

  /** Term-level corpus-drift monitor: the terms whose document-
    * frequency SHARE moved most between two md5 halves of the corpus
    * — the lexical twin of `Similarity.embedDrift` (that says THAT
    * the distribution moved; this says WHICH words moved it). The
    * ranking key is the exact integer cross-difference
    * |df₀·n₁ − df₁·n₀| (the KS discipline — no float share exists to
    * disagree), the cut is a deterministic (score DESC, term) top-k,
    * and the emitted share delta is a fixed tree of exact-int
    * divisions — raw double parity. Per-half doc totals come from a
    * doc_id-only second branch (column-pruned count scan — the
    * explode is never re-derived).
    * Output: (term, df_a, df_b, n_a, n_b, share_delta).
    */
  def termDrift(docs: DataFrame, idCol: String, textCol: String,
                topK: Int = 20): DataFrame = {
    require(topK >= 1 && topK <= 100000, "1 <= topK <= 100000")
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
    val halves = base
      .select(Sampling.hashBucket(col(idCol), 2).cast("int").as("_h"))
      .groupBy()
      .agg(sum(when(col("_h") === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("_h") === 1, 1L).otherwise(0L)).cast("long").as("n_b"))
    val dfs = base
      .select(Sampling.hashBucket(col(idCol), 2).cast("int").as("_h"),
        explode(array_distinct(tokens(lower(col(textCol))))).as("_term"))
      .groupBy("_term")
      .agg(sum(when(col("_h") === 0, 1L).otherwise(0L)).cast("long").as("df_a"),
        sum(when(col("_h") === 1, 1L).otherwise(0L)).cast("long").as("df_b"))
    dfs.crossJoin(broadcast(halves))
      .withColumn("_score",
        abs(col("df_a").cast("decimal(19,0)") * col("n_b")
          - col("df_b").cast("decimal(19,0)") * col("n_a")))
      .orderBy(col("_score").desc, col("_term"))
      .limit(topK)
      .select(col("_term").as("term"), col("df_a"), col("df_b"),
        col("n_a"), col("n_b"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
          .otherwise(col("df_a").cast("double") / col("n_a").cast("double")
            - col("df_b").cast("double") / col("n_b").cast("double"))
          .as("share_delta"))
  }

  /** Distinct-n diversity / novelty profile per corpus slice: of the
    * per-doc DISTINCT word n-grams each source contributes, how many
    * survive as corpus-distinct (template-ness: low distinct share =
    * the same phrasing stamped across documents) and how many appear
    * in exactly one document (novelty tail \u2014 what a dedup pass can
    * never collapse). The corpus-level complement of the per-doc
    * [[dupNgramCoverage]]: that flags copying INSIDE a doc, this
    * flags copying ACROSS docs. All-integer outputs.
    * Output: (group, n_occurrences, n_distinct, n_singletons,
    * distinct_ppm, singleton_ppm).
    *
    * Scale posture: the shingle explode feeds one (group, shingle)
    * agg then a per-group agg \u2014 the dedup-family shuffle shape, no
    * pair joins anywhere.
    */
  def ngramDiversity(docs: DataFrame, groupCol: String, textCol: String,
                     n: Int = 3): DataFrame = {
    val sh = docs
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("_g"),
        explode(shinglesFromToks(tokens(lower(col(textCol))), n)).as("_sh"))
    sh.groupBy("_g", "_sh").agg(count(lit(1)).as("_df"))
      .groupBy("_g")
      .agg(sum(col("_df")).cast("long").as("n_occurrences"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_singletons"))
      .select(col("_g").as(groupCol), col("n_occurrences"), col("n_distinct"),
        col("n_singletons"),
        expr("n_distinct * 1000000L div n_occurrences").as("distinct_ppm"),
        expr("n_singletons * 1000000L div n_distinct").as("singleton_ppm"))
  }

  /** Heaps'-law fit V \u2248 K\u00B7N\u1D5D across corpus slices: ln-ln OLS of
    * vocabulary size on token count over per-group (tokens, vocab)
    * points \u2014 the vocab-growth exponent that sizes tokenizer vocab
    * and OOV budgets before a 100\u00D7 corpus scale-up (English \u03B2 \u2248
    * 0.5\u20130.6; \u03B2 near 1 screams id-like junk tokens, \u03B2 near 0 means
    * the corpus is saturating). Sister diagnostic to the Zipf fit and
    * the same determinism discipline: exact integer (N, V) sufficient
    * stats, group-sorted ln folds, outputs rounded at 6 dp (ln feeds
    * the folds \u2014 the zipfFit ln-ulp rule). Degenerate spreads (all N
    * equal) mask via the integer min=max guard, never a double==0
    * test. Output ONE row: (n_points, heaps_beta, heaps_lnk).
    *
    * Scale posture: token explode \u2192 one (group, term) distinct-ish
    * agg (countDistinct plans as a two-level hash agg); the fold runs
    * over the |groups|-element array in one row.
    */
  def heapsFit(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val cells = docs
      .filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .select(col(groupCol).as("_g"),
        explode(tokens(lower(col(textCol)))).as("_term"))
      .groupBy("_g")
      .agg(count(lit(1)).as("_nt"), countDistinct(col("_term")).as("_nv"))
    val folded = cells.agg(
      count(lit(1)).cast("long").as("n_points"),
      min(col("_nt")).as("_xmin"), max(col("_nt")).as("_xmax"),
      array_sort(collect_list(struct(col("_g"), col("_nt"), col("_nv"))))
        .as("_a"))
    val lx = (s: Column) => log(s.getField("_nt").cast("double"))
    val ly = (s: Column) => log(s.getField("_nv").cast("double"))
    def fold(f: Column => Column) =
      aggregate(col("_a"), lit(0.0), (acc, s) => acc + f(s))
    val (sx, sy) = (fold(lx), fold(ly))
    val (sxy, sxx) = (fold(s => lx(s) * ly(s)), fold(s => lx(s) * lx(s)))
    val nD = col("n_points").cast("double")
    val slope = (nD * sxy - sx * sy) / (nD * sxx - sx * sx)
    val degenerate = col("n_points") < 2 || col("_xmin") === col("_xmax")
    folded.select(col("n_points"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(slope, 6)).as("heaps_beta"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((sy - slope * sx) / nD, 6)).as("heaps_lnk"))
  }

  /** Code-vs-prose detection signals — the curation router's "is this
    * document source code?" screen (code wants different dedup,
    * tokenization, and quality rules than prose; C4 dropped brace
    * lines for exactly this reason). Three cheap, language-agnostic
    * signals, all map-side and all exact integers:
    *
    *   - `sym_ppm`: code-symbol density ({}();=<>[] chars per char)
    *   - `brace_semi_cnt`: absolute brace/semicolon count
    *   - `indent_line_ppm`: share of lines starting with 2+ spaces or
    *     a tab (the indentation-regularity signal)
    *
    * `is_code` = brace_semi_cnt ≥ 3 AND indent_line_ppm ≥ 300000 — the
    * conjunction keeps bureaucratic prose (semicolon lists) and poetry
    * (indented, symbol-free) out. Counting is subtraction-after-
    * regexp_replace with pure character classes (identical semantics
    * in Java regex and RE2). Output per doc: (doc_id, n_chars,
    * n_lines, sym_ppm, brace_semi_cnt, indent_line_ppm, is_code).
    */
  def codeSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
    base
      .withColumn("_lines", split(col("_t"), "\n", -1))
      .withColumn("n_chars", length(col("_t")).cast("long"))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("_sym", (length(col("_t")) -
        length(regexp_replace(col("_t"), "[{}();=<>\\[\\]]", "")))
        .cast("long"))
      .withColumn("brace_semi_cnt", (length(col("_t")) -
        length(regexp_replace(col("_t"), "[{};]", ""))).cast("long"))
      .withColumn("_ind", size(filter(col("_lines"), l =>
        l.startsWith("  ") || l.startsWith("\t"))).cast("long"))
      .withColumn("sym_ppm", when(col("n_chars") === 0, lit(0L))
        .otherwise(expr("(1000000 * _sym) div n_chars")))
      .withColumn("indent_line_ppm", expr("(1000000 * _ind) div n_lines"))
      .withColumn("is_code",
        col("brace_semi_cnt") >= 3 && col("indent_line_ppm") >= 300000)
      .select("doc_id", "n_chars", "n_lines", "sym_ppm", "brace_semi_cnt",
        "indent_line_ppm", "is_code")
  }

  /** Vocabulary-richness estimators off the term-frequency spectrum —
    * the "how much vocabulary haven't we seen yet?" pair that sizes
    * tokenizer vocab and corpus-coverage decisions:
    *
    *   Chao1 = V + F₁²/(2·F₂)       (lower bound on true vocabulary)
    *   Good–Turing P₀ = F₁/N        (probability mass of unseen terms)
    *
    * with F₁/F₂ the hapax/dis-legomena counts. One token agg to the
    * |V|-row frequency frame, one 1-row spectrum agg; Chao1's single
    * division is the only double, P₀ is exact integer ppm. F₂ = 0
    * masks Chao1 (the classic estimator is undefined; the
    * bias-corrected variant is a caller-side swap). Output: ONE row
    * (n_tokens, vocab, f1, f2, chao1, unseen_ppm).
    */
  def vocabRichness(docs: DataFrame, textCol: String): DataFrame = {
    val tf = docs.filter(col(textCol).isNotNull)
      .select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("_f"))
    val spec = tf.agg(
      sum(col("_f")).cast("long").as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("_f") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
      sum(when(col("_f") === 2, 1L).otherwise(0L)).cast("long").as("f2"))
    spec.select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
      when(col("f2") === 0, lit(null).cast("double"))
        .otherwise(round(col("vocab").cast("double") +
          col("f1").cast("double") * col("f1").cast("double") /
          (lit(2.0) * col("f2").cast("double")), 6)).as("chao1"),
      when(col("n_tokens") === 0, lit(null).cast("long"))
        .otherwise(expr("(1000000 * f1) div n_tokens")).as("unseen_ppm"))
  }

  /** Jensen–Shannon divergence between two corpus slices' unigram
    * distributions — the SYMMETRIC, bounded (≤ ln 2) cousin of
    * [[tokenDistributionShift]]'s KL: the standard "how far apart are
    * these two corpora?" number for mixture design and drift gates
    * (KL is asymmetric and blows up on unshared vocabulary; JSD's
    * midpoint M = ½(P+Q) absorbs both).
    *
    *   JSD = ½·Σ_t p_t·ln(p_t/m_t) + ½·Σ_t q_t·ln(q_t/m_t)
    *
    * One token explode → one per-term conditional-count agg → one
    * sorted |V|-row fold (the tokenDistributionShift collect
    * discipline — vocabulary-bounded, never corpus-bounded). Per-term
    * contributions are summed as ONE addition per element so the fold
    * tree matches the oracle's `list_sum` exactly. Either side empty
    * masks to NULL. Output: ONE row
    * (n_tokens_a, n_tokens_b, n_terms, jsd_nats).
    */
  def jsDivergence(docs: DataFrame, textCol: String, cond: Column): DataFrame = {
    val toks = docs
      .select(when(cond, lit(1)).otherwise(lit(0)).as("_side"),
        explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy("term").agg(
      sum(when(col("_side") === 1, 1L).otherwise(0L)).cast("long").as("_a"),
      sum(when(col("_side") === 0, 1L).otherwise(0L)).cast("long").as("_b"))
    val folded = tf.agg(
      count(lit(1)).as("n_terms"),
      sum(col("_a")).cast("long").as("n_tokens_a"),
      sum(col("_b")).cast("long").as("n_tokens_b"),
      array_sort(collect_list(struct(col("term"), col("_a"), col("_b"))))
        .as("_arr"))
    def pa(s: Column) =
      s.getField("_a").cast("double") / col("n_tokens_a").cast("double")
    def pb(s: Column) =
      s.getField("_b").cast("double") / col("n_tokens_b").cast("double")
    val jsd = aggregate(col("_arr"), lit(0.0), (acc, s) => {
      val p = pa(s); val q = pb(s); val m = lit(0.5) * (p + q)
      acc + (when(s.getField("_a") > 0, lit(0.5) * p * log(p / m))
          .otherwise(lit(0.0)) +
        when(s.getField("_b") > 0, lit(0.5) * q * log(q / m))
          .otherwise(lit(0.0)))
    })
    val deg = col("n_tokens_a") === 0 || col("n_tokens_b") === 0
    folded.select(col("n_tokens_a"), col("n_tokens_b"), col("n_terms"),
      when(deg, lit(null).cast("double"))
        .otherwise(round(jsd, 6)).as("jsd_nats"))
  }
}
