package graft.ops

import graft.SparkSpec
import Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a"), Some(10.0)),
    (Some(2L), Some("b"), Some(150.0)),  // out of [0,100]
    (Some(2L), Some("a"), Some(20.0)),   // duplicate id
    (None,     Some("zz"), Some(30.0)),  // null id, unaccepted value
    (Some(4L), None,      None)
  ).toDF("id", "cat", "v")

  private def run(es: Seq[Expectation]): Map[String, (Double, Boolean)] =
    Expectations.check(df, es).collect()
      .map(r => s"${r.getString(1)}:${r.getString(2)}" ->
        (r.getDouble(3), r.getBoolean(5))).toMap

  test("each check type measures and verdicts correctly in one pass") {
    // distinct label:column keys only — budget variants of the same
    // check are asserted in ordered form below
    val got = run(Seq(
      NotNull("id"),                      // 1/5 null -> 0.2, fail
      Unique("id"),                       // one dup among non-nulls -> fail
      Unique("cat"),                      // a,b,a,zz -> 1 dup -> fail
      InRange("v", 0.0, 100.0),           // 150 violates -> fail
      AcceptedValues("cat", Seq("a", "b")), // zz -> fail
      MinRows(5L)))                       // exactly 5 -> pass
    assert(got("not_null:id") == (0.2, false))
    assert(got("unique:id") == (1.0, false))
    assert(got("unique:cat") == (1.0, false))
    assert(got("in_range:v") == (1.0, false))
    assert(got("accepted_values:cat") == (1.0, false))
    assert(got("min_rows:") == (5.0, true))
    // same label+column appears twice with different thresholds — check
    // the full ordered output for those
    val rows = Expectations.check(df, Seq(
      NotNull("id"), NotNull("id", 0.25), InRange("v", 0, 100),
      InRange("v", 0, 200), MinRows(5), MinRows(6)))
      .collect().map(r => (r.getInt(0), r.getBoolean(5))).toSeq
    assert(rows == Seq((0, false), (1, true), (2, false), (3, true),
      (4, true), (5, false)), "declaration order preserved, budgets honored")
  }

  test("verdicts are sane on an empty frame") {
    val empty = df.filter($"id" === -1L)
    val got = Expectations.check(empty,
      Seq(NotNull("id"), Unique("id"), MinRows(1L)))
      .collect().map(r => r.getString(1) -> r.getBoolean(5)).toMap
    assert(got == Map("not_null" -> true, "unique" -> true, "min_rows" -> false))
  }
}
