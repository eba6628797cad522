package graft.review

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Er

/** D7/D9: the manual-review workflow as data.
  *
  * The reference queues REVIEW-band match decisions as ReviewItem nodes,
  * serves pending pages filtered by type / score range, and on
  * approve/reject triggers a merge or negative reinforcement
  * (review/ReviewService.java:94-217). The batch analog: a review_items
  * table built from the scored-pairs table, stats as aggregations, and
  * decision application as two derived tables (override merge edges;
  * confidence adjustments) that feed back into the pipeline.
  *
  * review_items schema:
  *   (review_id, src, dst, entity_type, score, status, reviewer_id)
  *   status ∈ PENDING | APPROVED | REJECTED
  */
object Review {

  /** Build the review queue from scored pairs: one item per REVIEW-band
    * decision (ReviewService.java:54-76 enqueues exactly the
    * MatchDecision.REVIEW outcomes). review_id is deterministic from the
    * pair, so re-running a batch never duplicates the queue.
    */
  def queueFromScores(pairScores: DataFrame,
                      typeCol: String = "entity_type"): DataFrame = {
    val hasType = pairScores.columns.contains(typeCol)
    val base = pairScores.where(col("decision") === "REVIEW")
    val typed = if (hasType) base else base.withColumn(typeCol, lit("COMPANY"))
    typed.select(
      concat_ws(":", lit("rev"), col("doc_id_a"), col("doc_id_b")).as("review_id"),
      col("doc_id_a").as("src"), col("doc_id_b").as("dst"),
      col(typeCol).as("entity_type"), col("score"),
      lit("PENDING").as("status"), lit(null).cast("string").as("reviewer_id"))
  }

  /** D9: pending-review stats — counts by entity type and by score
    * decile (ReviewService.java:190-217 getPendingBy* + countPending,
    * served for every filter at once). One shuffle, partial agg.
    */
  def pendingStats(reviewItems: DataFrame): DataFrame =
    reviewItems.where(col("status") === "PENDING")
      .groupBy(col("entity_type"),
        floor(col("score") * 10).cast("int").as("score_decile"))
      .agg(count(lit(1)).as("pending"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))

  /** Approvals → override merge edges (the D7 feed into connected
    * components; ReviewService.approveMatch → MergeEngine.merge).
    */
  def approvedEdges(reviewItems: DataFrame): DataFrame =
    reviewItems.where(col("status") === "APPROVED")
      .select(col("src"), col("dst"))

  /** Rejections → negative reinforcement deltas: the batch analog of
    * ReviewService.applyNegativeReinforcement (confidence -= penalty,
    * clamped at 0 — functions.Er.negativeReinforce is the scalar). The
    * caller joins this onto whatever confidence table it maintains.
    */
  def rejectionPenalties(reviewItems: DataFrame,
                         penalty: Double = 0.1): DataFrame =
    reviewItems.where(col("status") === "REJECTED")
      .select(col("src"), col("dst"),
        Er.negativeReinforce(col("score"), lit(penalty)).as("penalized_score"))
}
