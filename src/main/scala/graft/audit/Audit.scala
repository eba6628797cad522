package graft.audit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** L6/L10: merge history + audit-trail query surface.
  *
  * The reference keeps per-merge provenance on MERGED_INTO edges
  * (confidence, reason, mergedAt — graph/CypherExecutor.java:343-351)
  * and a MergeLedger of immutable audit entries walked with cursor
  * pagination (graph/CypherExecutor.java:591-616,
  * audit/MergeLedger.java:124-136). The batch analog is two plain
  * tables:
  *
  *   merge_edges (src, dst, confidence, reason, merged_seq)
  *   audit      (audit_id, action, entity_id, actor_id, ts_seq)
  *
  * and the queries below. Everything is a partitioned window or an
  * indexed-by-key filter — no driver-side iteration; per-entity history
  * is a `partitionBy(entity)` window, which shuffles once on the entity
  * key and scales with the number of entities, not history length.
  */
object Audit {

  /** L6: merge history per target entity, most recent first —
    * `MATCH (source)-[m:MERGED_INTO]->(target) ... ORDER BY m.mergedAt
    * DESC` (CypherExecutor.java:343-351) for EVERY target at once.
    * Emits a `history_rank` (1 = latest merge into that target).
    */
  def mergeHistory(mergeEdges: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("merged_seq").desc, col("src").asc)
    mergeEdges.select(
      col("dst").as("entity_id"), col("src").as("merged_from"),
      col("confidence"), col("reason"), col("merged_seq"),
      row_number().over(w).as("history_rank"))
  }

  /** L10: cursor pagination over the audit trail of one entity —
    * entries strictly after `cursorSeq`, oldest first, first `limit`
    * rows (CypherExecutor.java:591-616). Deterministic tiebreak on
    * audit_id. A global sort of just the filtered slice: the entity
    * filter prunes first, so the sort is over one entity's tail only.
    */
  def auditAfterCursor(audit: DataFrame, entityId: Column,
                       cursorSeq: Long, limit: Int): DataFrame =
    audit.where(col("entity_id") === entityId && col("ts_seq") > cursorSeq)
      .orderBy(col("ts_seq").asc, col("audit_id").asc)
      .limit(limit)

  /** L10 (batch form): the first page after a cursor for EVERY entity in
    * one pass — the whole-table closure of per-entity cursor pagination,
    * shaped as a window rank instead of n driver round-trips.
    */
  def auditFirstPagePerEntity(audit: DataFrame, cursorSeq: Long,
                              pageSize: Int): DataFrame = {
    val w = Window.partitionBy(col("entity_id"))
      .orderBy(col("ts_seq").asc, col("audit_id").asc)
    audit.where(col("ts_seq") > cursorSeq)
      .withColumn("page_rank", row_number().over(w))
      .where(col("page_rank") <= pageSize)
  }
}
