package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** LLM-enrichment escalation plumbing (llm/LLMEnricher.java:60-110,
  * api/EntityResolutionService.java:589-610): when the best candidate
  * scores below the review threshold, the reference consults an LLM and
  * maps its answer to SYNONYM_ONLY / REVIEW / NO_MATCH — NEVER
  * AUTO_MERGE (PRD 7.2).
  *
  * Same policy as the media codec: the PROVIDER is stubbed (zero-egress
  * build — a deterministic fake keyed on the pair), the Spark-side
  * plumbing is real: escalation-band selection, batched per-partition
  * provider calls (one provider context per partition — exactly how a
  * real batched-inference endpoint would be driven), the decision
  * mapping, and the unavailable->REVIEW fallback.
  */
trait EnrichmentProvider extends Serializable {
  def isAvailable: Boolean
  /** (confidence in [0,1], areSameEntity) — one call per candidate pair;
    * implementations batch internally per partition.
    */
  def enrich(nameA: String, nameB: String): (Double, Boolean)
  def name: String
}

/** The reference's default: no provider configured. */
object NoOpProvider extends EnrichmentProvider {
  override def isAvailable: Boolean = false
  override def enrich(a: String, b: String): (Double, Boolean) =
    throw new IllegalStateException("NoOp provider cannot enrich")
  override def name: String = "noop"
}

/** STUB standing in for a real LLM: deterministic token-overlap heuristic
  * (a real provider swaps in behind the same trait; no egress here).
  */
object StubProvider extends EnrichmentProvider {
  override def isAvailable: Boolean = true
  override def enrich(a: String, b: String): (Double, Boolean) = {
    val ta = a.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val tb = b.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val j = if (ta.isEmpty || tb.isEmpty) 0.0
      else ta.intersect(tb).size.toDouble / ta.union(tb).size
    (j, j >= 0.34)
  }
  override def name: String = "stub"
}

final case class EnrichedDecision(
    doc_id_a: String, doc_id_b: String,
    llm_confidence: Double, decision: String, reasoning: String)

object Enrichment {

  /** Escalate the sub-review band: pairs whose best score sits below
    * `reviewThreshold` get a provider opinion; the decision mapping is
    * the reference's (SYNONYM_ONLY iff same-entity with confidence >=
    * `confidenceThreshold`; REVIEW iff same-entity below it; NO_MATCH
    * otherwise; provider unavailable -> REVIEW with the unavailability
    * reasoning). Input: (doc_id_a, doc_id_b, name_a, name_b, score).
    */
  def escalate(bestMatches: DataFrame, provider: EnrichmentProvider,
               reviewThreshold: Double = 0.60,
               confidenceThreshold: Double = 0.75): Dataset[EnrichedDecision] = {
    val spark = bestMatches.sparkSession
    import spark.implicits._
    val band = bestMatches
      .where(col("score") < reviewThreshold)
      .select(col("doc_id_a").cast("string"), col("doc_id_b").cast("string"),
        col("name_a"), col("name_b"))
      .as[(String, String, String, String)]
    band.mapPartitions { rows =>
      // one provider context per partition (batched-inference shape)
      val available = provider.isAvailable
      rows.map { case (ida, idb, na, nb) =>
        if (!available)
          EnrichedDecision(ida, idb, 0.0, "REVIEW",
            "LLM enrichment unavailable - manual review required")
        else {
          val (conf, same) = provider.enrich(na, nb)
          val decision =
            if (same && conf >= confidenceThreshold) "SYNONYM_ONLY"
            else if (same) "REVIEW"
            else "NO_MATCH"
          EnrichedDecision(ida, idb, conf, decision, s"provider=${provider.name}")
        }
      }
    }
  }
}
