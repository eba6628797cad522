package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.decide.{Decisions, Thresholds}
import graft.functions.Er
import graft.norm.Normalizer

/** Structured Streaming extension. The reference explicitly defers
  * streaming to a future phase (entity-resolution-prd.md:461-465); this
  * module is the forward-looking analog of its online resolve() loop:
  * a stream of incoming documents resolved per micro-batch against a
  * static (periodically recomputed) entity dimension.
  *
  * Design notes for scale:
  *  - the entity dim joins broadcast when small, shuffle otherwise —
  *    same plan rules as batch;
  *  - per-micro-batch logic is stateless (normalize + join + decide), so
  *    no state store growth; watermarked windowed aggregations carry the
  *    only state and are bounded by the watermark;
  *  - a full streaming CC is intentionally out of scope: merges feed the
  *    batch pipeline's checkpoint tables, matching the reference's
  *    "stream resolves, batch consolidates" split.
  */
object StreamingResolve {

  /** Resolve a stream of (doc_id, name) against a static entity dim
    * (entity_id, normalized). Emits per-record decisions: exact match ->
    * matched entity + score 1.0; otherwise NO_MATCH (fuzzy scoring per
    * micro-batch is a planned batch handoff).
    */
  def resolveStream(docsStream: DataFrame, entityDim: DataFrame,
                    thresholds: Thresholds = Thresholds()): DataFrame = {
    val normalized = docsStream
      .withColumn("normalized", Normalizer.normalizeColumn(col("name")))
      .withColumn("reject_reason", Er.rejectReason(col("name")))
    val dim = entityDim.select(
      col("normalized"), col("entity_id").as("matched_entity"))
    normalized
      .where(col("reject_reason").isNull)
      .join(dim, Seq("normalized"), "left")
      .withColumn("score", when(col("matched_entity").isNotNull, 1.0).otherwise(0.0))
      .withColumn("decision", Decisions.decide(col("score"), thresholds))
      .select("doc_id", "normalized", "matched_entity", "score", "decision")
  }

  /** Watermarked tumbling-window decision counts (the streaming analog of
    * D8 batch counters): 10-minute watermark, 1-hour windows.
    */
  def windowedDecisionCounts(resolved: DataFrame, tsCol: String): DataFrame =
    resolved
      .withWatermark(tsCol, "10 minutes")
      .groupBy(window(col(tsCol), "1 hour"), col("decision"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: keep the first occurrence of each content
    * hash, state bounded by the watermark (the streaming analog of
    * [[graft.dedup.Dedup.exact]] — `dropDuplicatesWithinWatermark`
    * expires state once the watermark passes, so the dedup map never
    * grows unboundedly the way a global dropDuplicates would).
    */
  def dedupStream(docsStream: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docsStream
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("content_hash"))

  /** Custom-state sessionization over a keyed event stream:
    * `mapGroupsWithState` with a processing-time timeout — the streaming
    * analog of the q33 batch sessionizer (30-min gap), emitting one
    * running session summary per key per update.
    *
    * State per key is O(1) (count + last-seen micros), the canonical
    * bounded-state shape for KeyValueGroupedDataset custom state.
    */
  final case class SessionUpdate(user_id: Long, session_events: Long, session_idx: Long)
  final case class SessionState(idx: Long, n: Long, lastUs: Long)

  def sessionize(events: Dataset[(Long, Long)], gapUs: Long = 1800L * 1000000L)
      : Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (user, batch, state: GroupState[SessionState]) =>
          val sorted = batch.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { us =>
            st =
              if (st.lastUs != Long.MinValue && us - st.lastUs <= gapUs)
                SessionState(st.idx, st.n + 1, us)
              else
                SessionState(st.idx + 1, 1L, us)
          }
          state.update(st)
          SessionUpdate(user, st.n, st.idx)
      }
  }
}
