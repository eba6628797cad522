package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
