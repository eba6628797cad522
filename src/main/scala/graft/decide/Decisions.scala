package graft.decide

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** D1: threshold configuration. Defaults 0.92/0.80/0.60 with the ordering
  * validation auto >= synonym >= review
  * (api/ResolutionOptions.java:11-13,312-321).
  */
final case class Thresholds(
    autoMerge: Double = 0.92,
    synonym: Double = 0.80,
    review: Double = 0.60) {
  require(autoMerge >= synonym, s"autoMerge ($autoMerge) must be >= synonym ($synonym)")
  require(synonym >= review, s"synonym ($synonym) must be >= review ($review)")
}

object Decisions {

  /** D1: score -> decision band (core/model/MatchResult.java:33-46).
    * Below review the reference escalates to LLM_ENRICH; with the default
    * NoOp provider that resolves to NO_MATCH (llm/LLMEnricher.java:88-110),
    * which is what a no-egress batch engine emits.
    */
  def decide(score: Column, t: Thresholds = Thresholds()): Column =
    when(score >= t.autoMerge, "AUTO_MERGE")
      .when(score >= t.synonym, "SYNONYM_ONLY")
      .when(score >= t.review, "REVIEW")
      .otherwise("NO_MATCH")

  /** D2: best-match argmax per left doc — the reference's linear
    * max-keeping scan over candidates (api/EntityResolutionService.java:529-575)
    * as a window top-1. Deterministic tie-break on candidate id.
    */
  def bestMatch(pairScores: DataFrame,
                docCol: String = "doc_id_a",
                candCol: String = "doc_id_b",
                scoreCol: String = "score"): DataFrame = {
    val w = Window.partitionBy(col(docCol)).orderBy(col(scoreCol).desc, col(candCol).asc)
    pairScores
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** D8: batch result counters — counts per decision band
    * (api/BatchContext.java:268-278, bulk/CsvBulkImporter.java:86-94).
    */
  def decisionCounts(pairScores: DataFrame, decisionCol: String = "decision"): DataFrame =
    pairScores.groupBy(col(decisionCol)).agg(count(lit(1)).as("n"))
}
