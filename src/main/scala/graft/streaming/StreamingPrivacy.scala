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

  /** Streaming release of the DP stability histogram —
    * [[graft.ops.Privacy.stableHistogram]]'s continuous-ingest tense
    * over a data-derived category domain: each unit votes AT MOST ONCE
    * per category within the WATERMARK horizon
    * (`dropDuplicatesWithinWatermark` on (unit, category) — the
    * sensitivity-1 contribution bound enforced in stream state; set
    * `watermark` ≥ `windowDur` when the bound must hold strictly per
    * window), counts get the seeded inverse-CDF Laplace(1/ε), and
    * categories whose noisy count misses `tau` are suppressed. Append mode: a
    * window's rows emit only after the watermark closes it, so every
    * released row is final — no retraction channel for a privacy
    * release.
    *
    * Split of responsibilities (the IncrementalIngest discipline —
    * discovery online, compaction in batch): the stream enforces the
    * per-(unit, category, window) vote-once bound; the CROSS-category
    * per-unit cap (the L0 bound `maxCatsPerUnit`) needs the whole
    * unit's history and stays with the batch compactor. The noise key
    * is (category, seed) — the batch tree exactly, so a one-window
    * fixture converges to the batch release bit-for-bit; a production
    * deployment salts the seed per release period.
    *
    * Output (append): (window_start, category, noisy_count) — the
    * release schema carries no exact counts.
    */
  def stableHistogramStream(stream: DataFrame, unitCol: String,
                            catCol: String, tsCol: String, epsilon: Double,
                            tau: Double, windowDur: String = "1 day",
                            watermark: String = "1 hour",
                            seed: Long = 7L): DataFrame = {
    require(epsilon > 0.0, "epsilon must be positive")
    val uc = stream
      .filter(col(unitCol).isNotNull && col(catCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(tsCol).as("_ts"), col(unitCol).cast("string").as("_u"),
        col(catCol).cast("string").as("_cat"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("_u", "_cat")
    val counts = uc
      .groupBy(window(col("_ts"), windowDur), col("_cat"))
      .agg(count(lit(1)).as("_n"))
    val nKey = concat_ws("\u0001", col("_cat"), lit(seed.toString))
    val h = conv(substring(md5(nKey.cast("binary")), 1, 13), 16, 10)
      .cast("long")
    val u = (h + lit(0.5)) / lit(4503599627370496.0)
    val lap = (lit(-1.0) / lit(epsilon)) * signum(u - lit(0.5)) *
      log(lit(1.0) - lit(2.0) * abs(u - lit(0.5)))
    counts
      .withColumn("noisy_count", round(col("_n") + lap, 6))
      .filter(col("noisy_count") >= tau)
      .select(col("window.start").as("window_start"),
        col("_cat").as(catCol), col("noisy_count"))
  }
}
