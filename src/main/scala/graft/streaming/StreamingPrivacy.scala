package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming k-anonymity — [[graft.ops.Privacy.kAnonymity]]'s
  * continuous-ingest tense: rows are WITHHELD until their
  * quasi-identifier cohort has accumulated `k` members, then the
  * buffered cohort flushes and every later member passes straight
  * through. What the batch audit reports, the stream enforces: no
  * downstream consumer ever observes a row whose QI cohort is (yet)
  * smaller than `k`.
  *
  * State discipline: a cohort buffers AT MOST `k - 1` serialized rows;
  * the moment it reaches `k` the buffer flushes and collapses to a
  * 1-bit released flag, so long-run state is `O(#below-k cohorts × k)`
  * plus one flag per released cohort — bounded by the QI domain, not
  * the stream. Cohorts that never reach `k` hold their rows forever
  * under `NoTimeout`; a production deployment sets an event-time
  * timeout so stale sub-`k` cohorts expire and their rows are DROPPED
  * — which is exactly k-anonymity's suppression semantics, made
  * explicit as a retention horizon.
  *
  * Rows travel as `to_json(struct(*))` payloads so the gate stays
  * schema-agnostic; the caller re-projects with `from_json` on the
  * known schema. Output: (qi_key, payload), append-mode (every emitted
  * row is final).
  */
object StreamingPrivacy {

  final case class CohortState(buffered: Seq[String], released: Boolean)

  def kAnonymityGate(rows: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, "k < 2 releases everything immediately")
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(
        concat_ws("\u0001", qiCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
          .as("_qi"),
        to_json(struct(rows.columns.map(col): _*)).as("_payload"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CohortState, (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, String)],
         state: org.apache.spark.sql.streaming.GroupState[CohortState]) =>
          var st = state.getOption.getOrElse(CohortState(Seq.empty, released = false))
          val out = Vector.newBuilder[(String, String)]
          it.foreach { case (_, payload) =>
            if (st.released) out += ((key, payload))
            else {
              val buf = st.buffered :+ payload
              if (buf.size >= k) {
                buf.foreach(p => out += ((key, p)))
                st = CohortState(Seq.empty, released = true)
              } else st = CohortState(buf, released = false)
            }
          }
          state.update(st)
          out.result().iterator
      }
      .toDF("qi_key", "payload")
  }
}
