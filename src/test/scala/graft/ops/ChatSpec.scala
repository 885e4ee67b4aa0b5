package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChatSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    // conv 1: canonical system-led conversation — valid
    (1L, 0L, "system", "be helpful"),
    (1L, 1L, "user", "hi there"),
    (1L, 2L, "assistant", "hello"),
    // conv 2: no system, two rounds — valid
    (2L, 0L, "user", "question one"),
    (2L, 1L, "assistant", "answer one"),
    (2L, 2L, "user", "question two"),
    (2L, 3L, "assistant", "answer two"),
    // conv 3: double user turn — alternation break
    (3L, 0L, "user", "a"),
    (3L, 1L, "user", "b"),
    (3L, 2L, "assistant", "c"),
    // conv 4: ends on user, and a whitespace-only turn
    (4L, 0L, "user", "  "),
    (4L, 1L, "assistant", "ok"),
    (4L, 2L, "user", "dangling"),
    // conv 5: system in the middle
    (5L, 0L, "user", "x"),
    (5L, 1L, "system", "late instructions"),
    (5L, 2L, "assistant", "y"),
    // conv 6: assistant speaks first
    (6L, 0L, "assistant", "unprompted"),
    (6L, 1L, "user", "what")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("validateChat: per-check verdicts and stable reason CSV") {
    val got = Chat.validateChat(turns, "conv_id", "turn_idx", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[Boolean]("valid"), r.getAs[String]("reasons"))).toMap
    got(1L) shouldBe ((true, ""))
    got(2L) shouldBe ((true, ""))
    got(3L) shouldBe ((false, "alternation"))
    got(4L) shouldBe ((false, "ends,empty_turn"))
    // mid-conv system turns are skipped by the alternation rank, so
    // only the position check fires
    got(5L) shouldBe ((false, "sys_pos"))
    got(6L) shouldBe ((false, "starts,alternation,ends"))
  }

  test("validateChat: null roles and duplicate indexes fail the gate, never slip through") {
    val corrupt = Seq(
      // null role mid-conversation: dropping it would make this LOOK valid
      (10L, Some(0L), Some("user"), "q"),
      (10L, Some(1L), None, "leaked"),
      (10L, Some(2L), Some("assistant"), "a"),
      // duplicate turn_idx: unorderable, and verdicts must not flip per run
      (11L, Some(0L), Some("user"), "q"),
      (11L, Some(0L), Some("user"), "q2"),
      (11L, Some(1L), Some("assistant"), "a"),
      // null turn_idx
      (12L, None, Some("user"), "q"),
      (12L, Some(1L), Some("assistant"), "a")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val got = Chat.validateChat(corrupt, "conv_id", "turn_idx", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") ->
        (r.getAs[Boolean]("keyed_ok"), r.getAs[Boolean]("valid"),
          r.getAs[Long]("n_turns"), r.getAs[String]("reasons"))).toMap
    got(10L)._1 shouldBe false
    got(10L)._2 shouldBe false
    got(10L)._3 shouldBe 3L // the corrupt turn is COUNTED, not dropped
    got(10L)._4 should startWith("bad_keys")
    got(11L)._1 shouldBe false
    got(11L)._2 shouldBe false
    got(12L)._1 shouldBe false
    got(12L)._2 shouldBe false
  }

  test("validateChat: duplicate-idx verdicts are deterministic across partitionings") {
    val dup = Seq(
      (20L, 0L, "system", "s"), (20L, 0L, "user", "u"), (20L, 1L, "assistant", "a"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val verdicts = (1 to 4).map { n =>
      Chat.validateChat(dup.repartition(n), "conv_id", "turn_idx", "role", "content")
        .collect().head.getAs[String]("reasons")
    }
    verdicts.distinct.size shouldBe 1
    verdicts.head should startWith("bad_keys")
  }

  test("validateChat: roles are case/whitespace-insensitive") {
    val messy = Seq((9L, 0L, " User ", "q"), (9L, 1L, "ASSISTANT", "a"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val r = Chat.validateChat(messy, "conv_id", "turn_idx", "role", "content")
      .collect().head
    r.getAs[Boolean]("valid") shouldBe true
  }

  test("chatToText: turn-ordered template flatten with token count") {
    val got = Chat.chatToText(turns.filter(col("conv_id") === 1),
      "conv_id", "turn_idx", "role", "content").collect().head
    got.getAs[String]("text") shouldBe
      "<|system|>be helpful\n<|user|>hi there\n<|assistant|>hello"
    got.getAs[Long]("n_turns") shouldBe 3L
    got.getAs[Long]("n_tokens") shouldBe 5L // tags glue to adjacent words
  }

  test("truncateChatToBudget keeps whole turns and ends on an assistant turn") {
    // conv 2 turn tokens: 2,2,2,2 (cum 2,4,6,8)
    val got = Chat.truncateChatToBudget(turns.filter(col("conv_id") === 2),
      "conv_id", "turn_idx", "role", "content", budget = 7)
      .orderBy("turn_idx")
      .collect().map(r => (r.getAs[Long]("turn_idx"), r.getAs[String]("role")))
    // budget 7 admits turns 0..2 (cum 6), but turn 2 is a user turn
    // with no following target -> trimmed back to the assistant at 1
    got.toSeq shouldBe Seq((0L, "user"), (1L, "assistant"))
  }

  test("truncateChatToBudget drops conversations with no trainable prefix") {
    val oneSided = Seq((7L, 0L, "user", "a b c d e f")).toDF("conv_id", "turn_idx", "role", "content")
    Chat.truncateChatToBudget(oneSided, "conv_id", "turn_idx", "role", "content",
      budget = 100).count() shouldBe 0L
  }
}
