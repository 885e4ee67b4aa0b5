package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation (SFT / chat) data preparation: structural validation,
  * template flattening, and token-budget truncation over the
  * relational turn model `(conv_id, turn_idx, role, content)` — the
  * natural Spark shape for dialogue corpora (one row per turn, no
  * nested arrays at rest, every op a window/agg over the conversation
  * key).
  *
  * The reference pipeline has no dialogue surface (music-event KPIs;
  * cf. `scripts/compute_kpis.py`), but an instruction-tuning corpus at
  * 100 TB needs exactly these gates before training: a conversation
  * with broken role alternation or an empty turn poisons the loss
  * masking, and over-budget conversations must truncate on turn
  * boundaries, never mid-message.
  *
  * Scale design: the validate/flatten ops shuffle ONCE on the
  * conversation key; truncation adds one bounded conversation-keyed
  * self-join (2 exchanges total — the pins in `PlanAuditSpec`).
  * Conversations are bounded by context length, so per-group state is
  * O(turns), never O(corpus).
  */
object Chat {

  /** The ONE turn normalization every Chat op shares (keys cast,
    * role lower-trimmed, content coalesced) — factored so the gate and
    * the transforms can never drift apart on what a "role" means.
    * `_role0` keeps the pre-coalesce role for [[validateChat]]'s
    * null-key check; `role` is the ''-coalesced form every positional
    * rule reads.
    */
  private def project(turns: DataFrame, convCol: String, idxCol: String,
                      roleCol: String, contentCol: String): DataFrame =
    turns.select(col(convCol).as("conv_id"),
      col(idxCol).cast("long").as("turn_idx"),
      lower(trim(col(roleCol))).as("_role0"),
      coalesce(col(contentCol), lit("")).as("content"))
      .withColumn("role", coalesce(col("_role0"), lit("")))

  /** The transformation-side turn model: rows that cannot be keyed or
    * ordered (null conv/idx/role) are DROPPED — [[validateChat]] is the
    * gate that flags such conversations (`keyed_ok`); run it first and
    * admit only `valid` conversations into the flatten/truncate ops.
    */
  private def base(turns: DataFrame, convCol: String, idxCol: String,
                   roleCol: String, contentCol: String): DataFrame =
    project(turns, convCol, idxCol, roleCol, contentCol)
      .filter(col("conv_id").isNotNull && col("turn_idx").isNotNull &&
        col("_role0").isNotNull)
      .select("conv_id", "turn_idx", "role", "content")

  /** Per-conversation structural audit — the SFT admission gate:
    *
    *  - `keyed_ok`: every turn has a non-null `turn_idx` and role, and
    *    turn indexes are unique — a conversation that cannot even be
    *    ordered must FAIL the gate, not slip through with the bad turn
    *    silently dropped;
    *  - `sys_ok`: `system` turns appear only in first position;
    *  - `starts_user`: the first non-system turn is a `user` turn;
    *  - `alternates`: non-system roles strictly alternate
    *    user/assistant;
    *  - `ends_assistant`: the final turn is an `assistant` turn (a
    *    trailing user turn has no training target);
    *  - `no_empty`: no turn is empty/whitespace-only.
    *
    * `valid` is the conjunction; `reasons` lists the failed checks
    * (CSV, stable order, '' when valid — the [[TextAnalysis.filterVerdicts]]
    * convention). The positional checks run over the full ordering key
    * (turn_idx NULLS FIRST, role, content) with null roles read as ''
    * — deterministic verdicts even on mis-keyed conversations, whose
    * admission `keyed_ok` already vetoes.
    *
    * BOUNDARY: a turn whose `conv_id` itself is null belongs to NO
    * conversation and cannot appear in any per-conversation verdict —
    * the gate cannot conjure the key. A pipeline that can null
    * conversation keys must count those orphans UPSTREAM (one
    * `filter(isNull).count`) before trusting any per-conv verdict here.
    * Output: (conv_id, n_turns, keyed_ok, sys_ok, starts_user,
    * alternates, ends_assistant, no_empty, valid, reasons).
    */
  def validateChat(turns: DataFrame, convCol: String, idxCol: String,
                   roleCol: String, contentCol: String): DataFrame = {
    val w = Window.partitionBy("conv_id")
      .orderBy(col("turn_idx").asc_nulls_first, col("role"), col("content"))
    val t = project(turns, convCol, idxCol, roleCol, contentCol)
      .filter(col("conv_id").isNotNull)
      .withColumn("_pos", row_number().over(w))
      .withColumn("_nsrn",
        sum(when(col("role") =!= "system", 1L).otherwise(0L)).over(w))
    def all(c: Column): Column = min(when(c, 1).otherwise(0)) === 1
    val agg = t.groupBy("conv_id").agg(
      count(lit(1)).as("n_turns"),
      all(col("turn_idx").isNotNull && col("_role0").isNotNull).as("_keys_nn"),
      countDistinct(col("turn_idx")).as("_n_idx"),
      all(col("role") =!= "system" || col("_pos") === 1).as("sys_ok"),
      // max over a single-row CASE: the rank-1 non-system turn
      coalesce(max(when(col("role") =!= "system" && col("_nsrn") === 1,
        col("role") === "user")), lit(false)).as("starts_user"),
      all(col("role") === "system" ||
        col("role") === when(col("_nsrn") % 2 === 1, "user")
          .otherwise("assistant")).as("alternates"),
      (max(struct(col("turn_idx"), col("role"))).getField("role") === "assistant")
        .as("ends_assistant"),
      all(trim(col("content")) =!= "").as("no_empty"))
    agg
      .withColumn("keyed_ok", col("_keys_nn") && col("_n_idx") === col("n_turns"))
      .withColumn("valid",
        col("keyed_ok") && col("sys_ok") && col("starts_user") &&
          col("alternates") && col("ends_assistant") && col("no_empty"))
      .withColumn("reasons", concat_ws(",",
        when(!col("keyed_ok"), "bad_keys"),
        when(!col("sys_ok"), "sys_pos"),
        when(!col("starts_user"), "starts"),
        when(!col("alternates"), "alternation"),
        when(!col("ends_assistant"), "ends"),
        when(!col("no_empty"), "empty_turn")))
      .select("conv_id", "n_turns", "keyed_ok", "sys_ok", "starts_user",
        "alternates", "ends_assistant", "no_empty", "valid", "reasons")
  }

  /** Flatten each conversation to a single training text with
    * `<|role|>` turn tags in turn order (the template a trainer's
    * tokenizer consumes), plus the whitespace token count for
    * budgeting. One sorted-array fold per conversation — turn order is
    * pinned by `array_sort` over (idx, role, content) structs, not by
    * shuffle luck.
    * Output: (conv_id, n_turns, text, n_tokens).
    */
  def chatToText(turns: DataFrame, convCol: String, idxCol: String,
                 roleCol: String, contentCol: String): DataFrame =
    base(turns, convCol, idxCol, roleCol, contentCol)
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(col("turn_idx"), col("role"),
          col("content")))).as("_ts"))
      .select(col("conv_id"), col("n_turns"),
        array_join(transform(col("_ts"),
          t => concat(lit("<|"), t.getField("role"), lit("|>"),
            t.getField("content"))), "\n").as("text"))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))

  /** Token-budget truncation on TURN boundaries: keep the longest
    * turn-prefix whose cumulative whitespace token count fits
    * `budget`, then trim trailing non-assistant turns so the kept
    * conversation still ends on a training target. Conversations whose
    * kept prefix contains no assistant turn are dropped entirely (zero
    * trainable signal). Window cumsum + one small self-aggregate — the
    * per-conversation max assistant index broadcasts back via the same
    * conversation-key join.
    * Output: kept turns as (conv_id, turn_idx, role, n_tokens,
    * cum_tokens).
    */
  def truncateChatToBudget(turns: DataFrame, convCol: String, idxCol: String,
                           roleCol: String, contentCol: String,
                           budget: Long): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val kept = base(turns, convCol, idxCol, roleCol, contentCol)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("content")).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
    val lastAssistant = kept.groupBy("conv_id")
      .agg(max(when(col("role") === "assistant", col("turn_idx"))).as("_last"))
      .filter(col("_last").isNotNull)
    kept.join(lastAssistant, "conv_id")
      .filter(col("turn_idx") <= col("_last"))
      .select("conv_id", "turn_idx", "role", "n_tokens", "cum_tokens")
  }
}
